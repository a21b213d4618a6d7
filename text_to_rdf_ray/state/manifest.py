"""Per-partition checkpoint manifests (resumable output).

The reference has no checkpointing (SURVEY.md §4.1); at 100 TB a run must
resume mid-corpus.  Layout: one output directory per input partition
(``part=<k>/``), each written atomically (tmp dir + rename) together with a
``manifest.json`` recording input lineage (fragment paths), row counters,
and a content fingerprint.  A rerun skips partitions whose manifest is
complete; everything else is recomputed from lineage.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile


MANIFEST_NAME = "manifest.json"


def partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part}")


def is_complete(out_dir: str, part: int) -> bool:
    path = os.path.join(partition_dir(out_dir, part), MANIFEST_NAME)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            return json.load(f).get("status") == "complete"
    except (json.JSONDecodeError, OSError):
        return False


def read_manifest(out_dir: str, part: int) -> dict | None:
    path = os.path.join(partition_dir(out_dir, part), MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def write_partition(out_dir: str, part: int, write_fn, *, input_fragments,
                    counters: dict) -> dict:
    """Atomically produce ``out_dir/part=<k>``.

    ``write_fn(tmp_dir)`` writes the partition's data files into ``tmp_dir``
    and returns extra manifest fields (e.g. row counts).  On success the tmp
    dir is renamed into place with a complete manifest inside.
    """
    final = partition_dir(out_dir, part)
    os.makedirs(out_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".part{part}-", dir=out_dir)
    try:
        extra = write_fn(tmp) or {}
        manifest = {
            "partition": part,
            "status": "complete",
            "input_fragments": sorted(input_fragments),
            "counters": counters,
            **extra,
        }
        with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        return manifest
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def completed_partitions(out_dir: str) -> list[int]:
    if not os.path.isdir(out_dir):
        return []
    out = []
    for name in os.listdir(out_dir):
        if name.startswith("part="):
            part = int(name.split("=", 1)[1])
            if is_complete(out_dir, part):
                out.append(part)
    return sorted(out)


def aggregate_counters(out_dir: str) -> dict:
    """Sum counters across completed partition manifests (run report)."""
    totals: dict[str, float] = {}
    for part in completed_partitions(out_dir):
        m = read_manifest(out_dir, part) or {}
        for k, v in (m.get("counters") or {}).items():
            if isinstance(v, (int, float)):
                totals[k] = totals.get(k, 0) + v
    return totals
