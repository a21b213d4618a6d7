"""Ray-Data-native knowledge-graph construction engine.

Rebuilds the capabilities of the reference text-to-rdf library (see
SURVEY.md) on ray.data.Dataset: streaming Parquet web-page shards through
map_batches stages (HTML strip, coref, pattern triple extraction), actor
pools for stateful stages (entity linking), and explicit shuffles for
canonicalization and dedup.
"""

__version__ = "0.1.0"
