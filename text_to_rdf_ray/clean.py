"""Corpus-cleaning job entrypoint: ``python -m text_to_rdf_ray.clean``.

Runs the partitioned, resumable cleaning pipeline (lang ID -> quality /
length filter -> token stats per partition, then one global exact-dedup
compaction) over a documents Parquet directory.  Rerunning with the same
--out resumes, skipping completed partitions.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--docs", required=True, help="documents parquet file/dir")
    parser.add_argument("--out", required=True, help="partitioned output directory")
    parser.add_argument("--final", default=None,
                        help="final compacted corpus dir (default <out>/final)")
    parser.add_argument("--partitions", type=int, default=8)
    parser.add_argument("--min-tokens", type=int, default=20)
    parser.add_argument("--lang", default="en")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--no-compact", action="store_true")
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.clean import compact_clean, run_clean_partitioned

    report = run_clean_partitioned(
        args.docs, args.out, partitions=args.partitions,
        min_tokens=args.min_tokens, lang=args.lang, resume=not args.no_resume,
    )
    if not args.no_compact:
        import os

        final_dir = args.final or os.path.join(args.out, "final")
        report["compaction"] = compact_clean(args.out, final_dir)
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
