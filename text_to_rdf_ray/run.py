"""Job entrypoint: ``python -m text_to_rdf_ray.run`` (or ``ray job submit
-- python -m text_to_rdf_ray.run ...``).

Runs the partitioned, resumable KG-construction pipeline over a pages
Parquet directory, writing per-partition Parquet + manifests (and optional
N-Triples) under --out.  Rerunning with the same --out resumes, skipping
completed partitions.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", required=True, help="pages parquet directory")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--kb", default=None, help="KB parquet file (uri,label,aliases,types)")
    parser.add_argument("--partitions", type=int, default=16)
    parser.add_argument("--ntriples", action="store_true", help="also write N-Triples")
    parser.add_argument("--no-resume", action="store_true")
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import PipelineConfig
    from .pipelines.kg import run_partitioned

    kb_records = None
    if args.kb:
        import pyarrow.parquet as pq

        table = pq.read_table(args.kb)
        kb_records = table.to_pylist()

    cfg = PipelineConfig.from_env()
    report = run_partitioned(
        args.pages,
        args.out,
        partitions=args.partitions,
        kb_records=kb_records,
        resume=not args.no_resume,
        ntriples=args.ntriples,
        **cfg.build_kwargs(),
    )
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
