"""Ray Data stages of the KG-construction pipeline.

Stage functions are Arrow-in/Arrow-out ``map_batches`` bodies; the linker
is an actor-pool class (state loaded once per actor).  All stages are pure
w.r.t. row content (deterministic under task retry, SURVEY.md §4.2).

Pipeline shape (pipelines/kg.py):
  read_parquet(pages, columns pruned)
  -> strip_html (drops the wide ``html`` column immediately)
  -> filter_lang
  -> extract_triples (per-document kernel; doc = row, chunk loop inside)
  -> LinkEntities actor pool (KB broadcast once via ray.put)
  -> validate
  -> canonicalize + global dedup (stages/canonicalize.py, shuffles)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.extractor import extract_document
from ..kernels.text import extract_text
from ..kernels.validation import DATE_PREDICATES, is_valid_date

TRIPLE_FIELDS = [
    ("url", pa.string()),
    ("subj", pa.string()),
    ("subj_slug", pa.string()),
    ("subj_lower", pa.string()),
    ("pred", pa.string()),
    ("pred_key", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("nested_in", pa.string()),
    ("chunk_id", pa.int32()),
    ("span_start", pa.int64()),
    ("span_end", pa.int64()),
    ("confidence", pa.float64()),
    ("method", pa.string()),
]
TRIPLE_SCHEMA = pa.schema(TRIPLE_FIELDS)


def strip_html(batch: pa.Table) -> pa.Table:
    """html -> text; drops the wide binary column so downstream blocks are
    text-only (SURVEY.md §4.2 'very wide rows')."""
    html_col = batch.column("html")
    texts = [extract_text(h.as_py()) if h.is_valid else "" for h in html_col]
    batch = batch.drop_columns(["html"])
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", pa.array(texts, pa.large_string()))


def make_lang_filter(lang: str = "en"):
    def filter_lang(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("lang"), lang))

    return filter_lang


def extract_triples(batch: pa.Table) -> pa.Table:
    """Per-document extraction: one input page row -> N triple rows.

    The Python loop is over *documents* (each iteration runs the full
    chunk/coref/pattern kernel on one doc) — the vectorization unit is the
    document, mirroring the reference's doc-at-a-time semantics
    (/root/reference/src/extractor.rs:570-698) with provenance columns."""
    import sys

    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    cols: dict[str, list] = {name: [] for name, _ in TRIPLE_FIELDS}
    for url, text in zip(urls, texts):
        if not text:
            continue
        try:
            ex = extract_document(text)
        except Exception as exc:  # lossy fault-tolerance (extractor.rs:689-692):
            # a pathological document is logged and skipped, the batch
            # (and pipeline) continues — mirrors the reference's
            # chunk-failure behavior; Ray task retry would re-raise
            # deterministically, so skipping is the only useful policy
            print(f"extract_triples: skipping {url}: {exc!r}", file=sys.stderr)
            continue
        for t in ex.triples:
            cols["url"].append(url)
            cols["subj"].append(t.subj)
            cols["subj_slug"].append(t.subj_slug)
            cols["subj_lower"].append(t.subj_lower)
            cols["pred"].append(t.pred)
            cols["pred_key"].append(t.pred_key)
            cols["obj"].append(t.obj)
            cols["subj_type"].append(t.subj_type)
            cols["obj_type"].append(t.obj_type)
            cols["nested_in"].append(t.nested_in)
            cols["chunk_id"].append(t.chunk_id)
            cols["span_start"].append(t.span_start)
            cols["span_end"].append(t.span_end)
            cols["confidence"].append(t.confidence)
            cols["method"].append(t.method)
    return pa.table({name: pa.array(cols[name], typ) for name, typ in TRIPLE_FIELDS})


def _link_batch(index, cache: dict, batch: pa.Table) -> pa.Table:
    """Shared per-batch linking body (used by actor and task modes)."""

    def lookup(name: str):
        hit = cache.get(name)
        if hit is None:
            linked = index.link(name)
            hit = (linked.uri, linked.confidence) if linked else (None, 0.0)
            if len(cache) < 200_000:
                cache[name] = hit
        return hit

    subj_uri, subj_conf, obj_uri, obj_conf = [], [], [], []
    subjs = batch.column("subj").to_pylist()
    objs = batch.column("obj").to_pylist()
    obj_types = batch.column("obj_type").to_pylist()
    for s, o, ot in zip(subjs, objs, obj_types):
        uri, conf = lookup(s)
        subj_uri.append(uri)
        subj_conf.append(conf)
        if ot:  # entity object
            uri, conf = lookup(o)
            obj_uri.append(uri)
            obj_conf.append(conf)
        else:
            obj_uri.append(None)
            obj_conf.append(0.0)
    return (
        batch.append_column("subj_uri", pa.array(subj_uri, pa.string()))
        .append_column("subj_link_conf", pa.array(subj_conf, pa.float64()))
        .append_column("obj_uri", pa.array(obj_uri, pa.string()))
        .append_column("obj_link_conf", pa.array(obj_conf, pa.float64()))
    )


class LinkEntities:
    """Actor-pool stage: link subj/obj surfaces to KB URIs.

    The KB index is built ONCE per actor in ``__init__`` from a broadcast
    object-store ref (``ray.put`` of the KB records on the driver) — the
    Ray-native replacement for the reference's per-process Oxigraph store
    (/root/reference/src/entity_linker.rs:133-151).  Per-batch work is a
    dict-cached lookup over the batch's distinct surfaces.

    Use this mode when the KB is heavy (GB-scale index / model): the pool
    bounds the number of index replicas.  NOTE: Ray Data fuses the upstream
    map chain into the actor pool, so the pool size caps the parallelism of
    everything fused with it — size ``concurrency`` accordingly, or use
    ``make_link_task`` (task mode, per-worker cached index) when the KB is
    cheap to replicate.
    """

    def __init__(self, kb_ref=None, kb_records=None, fuzzy_threshold=0.8,
                 confidence_threshold=0.5, disambiguator_factory=None):
        import ray

        from ..kernels.linker import KBIndex

        if kb_records is None:
            kb_records = ray.get(kb_ref)
        # disambiguator built ONCE per actor (where a real deployment opens
        # its LLM client — the entity_linker.rs:409-479 plug point)
        disambiguator = disambiguator_factory() if disambiguator_factory else None
        self.index = KBIndex(
            kb_records,
            fuzzy_threshold=fuzzy_threshold,
            confidence_threshold=confidence_threshold,
            disambiguator=disambiguator,
        )
        self.cache: dict[str, tuple[str | None, float]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _link_batch(self.index, self.cache, batch)


# per-worker-process KB index cache for task-mode linking
_KB_INDEX_CACHE: dict[str, tuple] = {}


def make_link_task(kb_ref, fuzzy_threshold=0.8, confidence_threshold=0.5):
    """Task-mode linker: stateless map_batches function whose KB index is
    built lazily ONCE PER WORKER PROCESS (module-level cache keyed by the
    broadcast ref).  Keeps the map chain fully task-parallel — no actor
    pool to cap fused-stage parallelism — at the cost of one index replica
    per worker; right when the KB is small relative to worker heap."""
    key = kb_ref.hex() if hasattr(kb_ref, "hex") else str(kb_ref)

    def link_batch(batch: pa.Table) -> pa.Table:
        import ray

        from ..kernels.linker import KBIndex

        entry = _KB_INDEX_CACHE.get(key)
        if entry is None:
            index = KBIndex(ray.get(kb_ref), fuzzy_threshold=fuzzy_threshold,
                            confidence_threshold=confidence_threshold)
            entry = (index, {})
            _KB_INDEX_CACHE[key] = entry
        index, cache = entry
        return _link_batch(index, cache, batch)

    return link_batch


def validate_triples(batch: pa.Table, rules=()) -> pa.Table:
    """Vectorized relational validation (validation.rs:120-160 + 183-298):

    - Person/Organization/Place/Event require ``name``: in the relational
      model the subject surface IS the node's name, so an empty subj (or an
      empty entity-typed obj) of a name-required type is an Error, -0.2;
    - -0.05 malformed date literal on date predicates (Warning);
    - -0.1 malformed URI-shaped literal object (Warning);
    - confidence clamped to [0,1];
    - valid = NO Error-severity violation AND confidence >= 0.7
      (validation.rs:296-298 semantics — an Error invalidates regardless
      of the clamped score).

    ``rules``: registered ``functions.registry.ValidationRule`` objects
    (add_rule), captured at pipeline build time and shipped to workers;
    each is evaluated per matching row on the relational row view
    ``{"@type": subj_type, "name": subj, "pred_key": ..., "obj": ...}``.
    """
    from ..kernels.validation import _NAME_REQUIRED_TYPES

    n = len(batch)
    conf = np.ones(n)
    subj = batch.column("subj")
    subj_type = batch.column("subj_type")
    obj = batch.column("obj")
    obj_type = batch.column("obj_type")
    pred_key = batch.column("pred_key")

    req = pa.array(sorted(_NAME_REQUIRED_TYPES), pa.string())

    def b(arr) -> np.ndarray:
        return arr.to_numpy(zero_copy_only=False).astype(bool)

    subj_missing = b(pc.and_(pc.equal(subj, ""), pc.is_in(subj_type, value_set=req)))
    obj_missing = b(
        pc.and_(pc.is_in(obj_type, value_set=req), pc.equal(obj, ""))
    )
    conf -= 0.2 * subj_missing
    conf -= 0.2 * obj_missing
    error_hit = subj_missing | obj_missing

    is_literal = b(pc.equal(obj_type, ""))
    date_pred = b(pc.is_in(pred_key, value_set=pa.array(sorted(DATE_PREDICATES))))
    ln = pc.utf8_length(obj).to_numpy(zero_copy_only=False)
    c4 = pc.utf8_slice_codeunits(obj, 4, 5).to_numpy(zero_copy_only=False)
    c7 = pc.utf8_slice_codeunits(obj, 7, 8).to_numpy(zero_copy_only=False)
    date_ok = (ln == 10) & (c4 == "-") & (c7 == "-")
    bad_date = is_literal & date_pred & ~date_ok
    conf -= 0.05 * bad_date

    starts_http = b(pc.starts_with(obj, "http"))
    has_scheme = b(pc.match_substring(obj, "://"))
    bad_uri = is_literal & starts_http & ~has_scheme & ~bad_date
    conf -= 0.1 * bad_uri

    if rules:
        subj_l = subj.to_pylist()
        st_l = subj_type.to_pylist()
        pk_l = pred_key.to_pylist()
        obj_l = obj.to_pylist()
        for i in range(n):
            row = {"@type": st_l[i], "name": subj_l[i], "pred_key": pk_l[i],
                   "obj": obj_l[i]}
            for rule in rules:
                if rule.entity_type is not None and rule.entity_type != st_l[i]:
                    continue
                failed = any(not row.get(p) for p in rule.required_properties)
                if rule.check_fn is not None and not rule.check_fn(row):
                    failed = True
                if failed:
                    conf[i] += rule.confidence_impact
                    if rule.severity == "Error":
                        error_hit[i] = True

    conf = np.clip(conf, 0.0, 1.0)
    batch = batch.drop_columns(["confidence"])
    batch = batch.append_column("confidence", pa.array(conf, pa.float64()))
    return batch.append_column(
        "valid", pa.array((conf >= 0.7) & ~error_hit, pa.bool_())
    )
