"""End-to-end Ray pipeline tests: fixture pages -> canonical triples,
gold-set equality, determinism, and partitioned resume."""

import os

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

N_PAGES = 400


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    from text_to_rdf_ray.sources.fixtures import write_pages

    path = str(tmp_path_factory.mktemp("pages"))
    return write_pages(path, N_PAGES, rows_per_file=100)


@pytest.fixture(scope="module")
def triples_df(pages_dir):
    from text_to_rdf_ray.pipelines.kg import build_triples, read_pages
    from text_to_rdf_ray.sources.fixtures import kb_records

    return build_triples(read_pages(pages_dir), kb_records=kb_records()).to_pandas()


def _expected_gold(n_pages: int):
    """Gold triples computable from the fixture grid (en short pages only)."""
    from text_to_rdf_ray.sources.fixtures import gold_case, page_rows

    gold = set()
    for i, row in enumerate(page_rows(n_pages)):
        if row["lang"] != "en" or (i % 200 == 199):
            continue  # lang-filtered or long-doc page
        _, triples = gold_case(i)
        gold |= triples
    return gold


def test_pipeline_covers_gold_grid(triples_df):
    """Every computable gold triple from short pages appears, canonical."""
    gold = _expected_gold(N_PAGES)
    produced = {
        (r.subj_slug, r.pred, r.obj)
        for r in triples_df[triples_df.nested_in == ""].itertuples()
    }
    missing = gold - produced
    assert not missing, f"missing {len(missing)}: {sorted(missing)[:5]}"


def test_pipeline_dedup_no_duplicate_spo(triples_df):
    keys = triples_df[["subj", "pred", "obj"]].apply(tuple, axis=1)
    assert keys.is_unique


def test_pipeline_linked_subjects(triples_df):
    linked = triples_df["subj_uri"].notna().mean()
    assert linked > 0.9  # fixture KB covers the grid


def test_pipeline_validation_columns(triples_df):
    assert triples_df["valid"].all()
    assert (triples_df["confidence"] == 1.0).all()


def test_pipeline_deterministic(pages_dir):
    from text_to_rdf_ray.pipelines.kg import build_triples, read_pages
    from text_to_rdf_ray.sources.fixtures import kb_records

    a = build_triples(read_pages(pages_dir), kb_records=kb_records()).to_pandas()
    b = build_triples(read_pages(pages_dir), kb_records=kb_records()).to_pandas()
    ka = sorted(map(tuple, a[["subj", "pred", "obj", "url"]].values.tolist()))
    kb = sorted(map(tuple, b[["subj", "pred", "obj", "url"]].values.tolist()))
    assert ka == kb


def test_partitioned_run_and_resume(pages_dir, tmp_path):
    import pandas as pd

    from text_to_rdf_ray.pipelines.kg import run_partitioned
    from text_to_rdf_ray.sources.fixtures import kb_records
    from text_to_rdf_ray.state import manifest as mf

    out = str(tmp_path / "out")
    rep1 = run_partitioned(pages_dir, out, partitions=2, kb_records=kb_records())
    assert rep1["ran"] == 2 and rep1["skipped"] == 0
    assert mf.completed_partitions(out) == [0, 1]
    totals = mf.aggregate_counters(out)
    assert totals["triples_out"] > 0

    # resume: nothing re-runs
    rep2 = run_partitioned(pages_dir, out, partitions=2, kb_records=kb_records())
    assert rep2["ran"] == 0 and rep2["skipped"] == 2

    # simulate partial failure: delete one manifest -> only that partition reruns
    os.remove(os.path.join(mf.partition_dir(out, 1), mf.MANIFEST_NAME))
    rep3 = run_partitioned(pages_dir, out, partitions=2, kb_records=kb_records())
    assert rep3["ran"] == 1 and rep3["skipped"] == 1

    # output parquet is readable and row counts match manifests
    frames = []
    for part in mf.completed_partitions(out):
        pdir = mf.partition_dir(out, part)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert files
        for f in files:
            frames.append(pd.read_parquet(os.path.join(pdir, f)))
    total_rows = sum(len(f) for f in frames)
    assert total_rows == mf.aggregate_counters(out)["triples_out"]


def test_strip_html_drops_column(pages_dir):
    import ray.data as rd

    from text_to_rdf_ray.stages.kg_stages import strip_html

    ds = rd.read_parquet(pages_dir).map_batches(strip_html, batch_format="pyarrow")
    names = ds.schema().names
    assert "html" not in names and "text" in names


def test_ntriples_sink(pages_dir, tmp_path):
    from text_to_rdf_ray.pipelines.kg import build_triples, read_pages, write_ntriples
    from text_to_rdf_ray.sources.fixtures import kb_records

    triples = build_triples(read_pages(pages_dir), kb_records=kb_records(),
                            canonicalize=False)
    out = str(tmp_path / "nt")
    write_ntriples(triples, out)
    files = os.listdir(out)
    assert files
    content = open(os.path.join(out, files[0])).read()
    assert "<https://schema.org/" in content


def test_ntriples_sink_identical_blocks_not_collapsed(tmp_path):
    """Two distinct blocks rendering byte-identical bodies (duplicate
    triples with dedup disabled) must yield distinct shard files — the
    round-2 content-hash-only naming silently dropped one block's rows."""
    import pyarrow as pa

    import ray.data as rd

    from text_to_rdf_ray.pipelines.kg import write_ntriples

    def block(n):
        return pa.table({
            "subj": pa.array(["Alan Bean"] * n, pa.string()),
            "pred": pa.array(["birthdat"] * n, pa.string()),
            "obj": pa.array(["1932-03-15"] * n, pa.string()),
            "obj_type": pa.array([""] * n, pa.string()),
        })

    ds = rd.from_arrow([block(3), block(3)])  # two identical 3-row blocks
    out = str(tmp_path / "nt_dup")
    write_ntriples(ds, out)
    files = sorted(os.listdir(out))
    total = sum(
        len(open(os.path.join(out, f)).read().strip().splitlines())
        for f in files
    )
    assert total == 6, (files, total)


def test_document_shaped_rule_rejected_at_build(pages_dir):
    """A rule requiring a property outside the relational row view must
    fail LOUDLY at graph build, not silently invalidate every triple."""
    import pytest as _pytest

    from text_to_rdf_ray.functions.registry import (
        ValidationRule,
        add_rule,
        clear_rules,
    )
    from text_to_rdf_ray.pipelines.kg import build_triples, read_pages

    clear_rules()
    try:
        add_rule(ValidationRule(
            name="needs_birthdate", description="", entity_type="Person",
            required_properties=["birthDate"],
        ))
        with _pytest.raises(ValueError, match="birthDate"):
            build_triples(read_pages(pages_dir), link=False,
                          canonicalize=False, dedup=False)
    finally:
        clear_rules()


def test_link_actor_and_task_modes_agree(pages_dir):
    """Actor-pool and task-mode linkers produce identical links."""
    from text_to_rdf_ray.pipelines.kg import build_triples, read_pages
    from text_to_rdf_ray.sources.fixtures import kb_records

    kwargs = dict(kb_records=kb_records(), canonicalize=False, validate=False,
                  dedup=False)
    a = build_triples(read_pages(pages_dir), link_mode="task", **kwargs).to_pandas()
    b = build_triples(read_pages(pages_dir), link_mode="actor",
                      link_concurrency=(1, 2), **kwargs).to_pandas()
    key = ["url", "subj", "pred", "obj", "subj_uri", "obj_uri"]
    sa = sorted(map(tuple, a[key].fillna("").values.tolist()))
    sb = sorted(map(tuple, b[key].fillna("").values.tolist()))
    assert sa == sb


def test_link_join_mode_agrees_with_broadcast(pages_dir):
    """The shuffle-join linker (link_mode='join': nothing replicated per
    worker, for KBs too large to broadcast) must produce exactly the same
    links and confidences as the broadcast task-mode index."""
    from text_to_rdf_ray.pipelines.kg import build_triples, read_pages
    from text_to_rdf_ray.sources.fixtures import kb_records

    kwargs = dict(kb_records=kb_records(), canonicalize=False, validate=False,
                  dedup=False)
    a = build_triples(read_pages(pages_dir), link_mode="task", **kwargs).to_pandas()
    j = build_triples(read_pages(pages_dir), link_mode="join", **kwargs).to_pandas()
    key = ["url", "subj", "pred", "obj", "subj_uri", "obj_uri",
           "subj_link_conf", "obj_link_conf"]
    sa = sorted(map(tuple, a[key].fillna("").round(
        {"subj_link_conf": 9, "obj_link_conf": 9}).values.tolist()))
    sj = sorted(map(tuple, j[key].fillna("").round(
        {"subj_link_conf": 9, "obj_link_conf": 9}).values.tolist()))
    assert sa == sj


def test_hot_key_skew_dedups_to_single_triples():
    """2,000 pages all asserting the same facts about one hot entity: the
    batch-local combiner collapses the skew before the exchange and the
    global dedup yields exactly the distinct triple set."""
    import pyarrow as pa

    import ray.data as rd

    from text_to_rdf_ray.pipelines.kg import build_triples
    from text_to_rdf_ray.sources.fixtures import kb_records, wrap_html

    text = "Alan Bean was born on the 15th of March 1932."
    n = 2000
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array([f"https://skew.test/{i}" for i in range(n)]),
                "warc_ts": pa.array([1704067200_000000 + i for i in range(n)],
                                    pa.timestamp("us")),
                "html": pa.array([wrap_html("d", text)] * n, pa.binary()),
                "lang": pa.array(["en"] * n),
            }
        )
    )
    out = build_triples(pages, kb_records=kb_records()).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.subj_slug, row.pred, row.obj) == ("alan_bean", "birthdat", "1932-03-15")
    # deterministic provenance: first url by (url, chunk, span)
    assert row.url == "https://skew.test/0"


def test_manifest_method_counters(pages_dir, tmp_path):
    from text_to_rdf_ray.pipelines.kg import run_partitioned
    from text_to_rdf_ray.sources.fixtures import kb_records
    from text_to_rdf_ray.state import manifest as mf

    out = str(tmp_path / "out2")
    run_partitioned(pages_dir, out, partitions=1, kb_records=kb_records())
    totals = mf.aggregate_counters(out)
    assert totals["triples_valid"] > 0
    assert totals["triples_linked"] > 0
    method_keys = [k for k in totals if k.startswith("triples_method_")]
    assert "triples_method_born_on" in method_keys
    assert sum(totals[k] for k in method_keys) == totals["triples_out"]


def test_subject_bucketed_write(pages_dir, tmp_path):
    import pandas as pd

    from text_to_rdf_ray.pipelines.kg import run_partitioned
    from text_to_rdf_ray.sources.fixtures import kb_records
    from text_to_rdf_ray.state import manifest as mf

    out = str(tmp_path / "bucketed")
    run_partitioned(pages_dir, out, partitions=1, kb_records=kb_records(),
                    subject_buckets=4)
    pdir = mf.partition_dir(out, 0)
    buckets = [d for d in os.listdir(pdir) if d.startswith("subj_bucket=")]
    assert 1 <= len(buckets) <= 4
    # subjects are co-located: each subj appears in exactly one bucket dir
    subj_to_bucket = {}
    for b in buckets:
        bdir = os.path.join(pdir, b)
        for f in os.listdir(bdir):
            df = pd.read_parquet(os.path.join(bdir, f))
            for s in df["subj"]:
                assert subj_to_bucket.setdefault(s, b) == b


def test_compact_partitions_global_dedup(pages_dir, tmp_path):
    from text_to_rdf_ray.pipelines.kg import compact_partitions, run_partitioned
    from text_to_rdf_ray.sources.fixtures import kb_records

    out = str(tmp_path / "parts")
    run_partitioned(pages_dir, out, partitions=2, kb_records=kb_records())
    rep = compact_partitions(out, str(tmp_path / "final"))
    assert rep["rows_out"] <= rep["rows_in"]
    import pandas as pd

    final = pd.concat(
        [pd.read_parquet(os.path.join(tmp_path, "final", f))
         for f in os.listdir(tmp_path / "final") if f.endswith(".parquet")]
    )
    keys = final[["subj", "pred", "obj"]].apply(tuple, axis=1)
    assert keys.is_unique
    assert rep["rows_out"] == len(final)


def test_run_cli_entrypoint(pages_dir, tmp_path):
    """`python -m text_to_rdf_ray.run` (the ray-job-submit entrypoint) in a
    fresh process: runs partitioned, writes manifests, reports JSON."""
    import json
    import subprocess
    import sys

    from text_to_rdf_ray.sources.fixtures import write_kb

    kb_path = str(tmp_path / "kb.parquet")
    write_kb(kb_path)
    out = str(tmp_path / "cli_out")
    proc = subprocess.run(
        [sys.executable, "-m", "text_to_rdf_ray.run", "--pages", pages_dir,
         "--out", out, "--kb", kb_path, "--partitions", "2"],
        capture_output=True, text=True, timeout=240,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ran"] == 2
    assert report["counters"]["triples_out"] > 0


def test_adversarial_pages_robustness():
    """Nulls, empties, malformed HTML, unicode, and a ~1MB document all
    flow through the full pipeline without failures."""
    import pyarrow as pa

    import ray.data as rd

    from text_to_rdf_ray.pipelines.kg import build_triples
    from text_to_rdf_ray.sources.fixtures import kb_records, wrap_html

    pages = rd.from_arrow(
        pa.table(
            {
                "url": [f"https://a/{i}" for i in range(6)],
                "warc_ts": pa.array([0] * 6, pa.timestamp("us")),
                "html": pa.array(
                    [
                        None,
                        b"",
                        wrap_html("t", ""),
                        wrap_html("t", "José Gárcía was born on the 3rd of May 1950. 他是科学家。"),
                        wrap_html("t", "Alan Bean was born on the 15th of March 1932. " * 20000),
                        b"<p>broken<div><<<&&& unclosed",
                    ],
                    pa.binary(),
                ),
                "lang": pa.array(["en", "en", "en", "en", "en", None]),
            }
        )
    )
    out = build_triples(pages, kb_records=kb_records()).to_pandas()
    got = {(r.subj, r.pred, r.obj) for r in out.itertuples()}
    assert ("José Gárcía", "birthdat", "1950-05-03") in got
    assert ("Alan Bean", "birthdat", "1932-03-15") in got
    assert len(out) == 2  # the 1MB repeated doc dedups to one fact


def test_html_path_equals_gold_text_path(pages_dir):
    """The byte-identical extraction invariant end-to-end: running from
    html (strip stage) and from the gold text column yields identical
    triple sets."""
    from text_to_rdf_ray.pipelines.kg import build_triples, read_pages
    from text_to_rdf_ray.sources.fixtures import kb_records

    kwargs = dict(kb_records=kb_records(), canonicalize=False, dedup=False)
    a = build_triples(read_pages(pages_dir), from_html=True, **kwargs).to_pandas()
    b = build_triples(
        read_pages(pages_dir, use_gold_text=True), from_html=False, **kwargs
    ).to_pandas()
    key = ["url", "subj", "pred", "obj"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )


def test_lang_pushdown_read_equivalent(pages_dir):
    """Predicate pushdown at the scan == downstream lang filter."""
    from text_to_rdf_ray.pipelines.kg import build_triples, read_pages
    from text_to_rdf_ray.sources.fixtures import kb_records

    a = build_triples(read_pages(pages_dir), kb_records=kb_records()).to_pandas()
    b = build_triples(read_pages(pages_dir, lang="en"), kb_records=kb_records(),
                      lang=None).to_pandas()
    key = ["subj", "pred", "obj", "url"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )


def test_corpus_clean_partitioned_resume_and_parity(ray_session, tmp_path):
    """The partitioned resumable cleaning job (per-partition filters +
    manifests, global dedup compaction) resumes correctly and its final
    corpus equals the oracle-green corpus_clean_pipeline query (filters
    and exact dedup commute for identical texts)."""
    import pyarrow.parquet as pq

    from text_to_rdf_ray.pipelines.clean import compact_clean, run_clean_partitioned

    # split the sf0.001 documents into 3 input files
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    n = t.num_rows
    for k in range(3):
        pq.write_table(t.slice(k * n // 3, (k + 1) * n // 3 - k * n // 3),
                       str(docs_dir / f"docs-{k}.parquet"))

    out = str(tmp_path / "cleaned")
    rep = run_clean_partitioned(str(docs_dir), out, partitions=3)
    assert rep["ran"] == 3 and rep["skipped"] == 0
    # resume: nothing re-runs
    rep2 = run_clean_partitioned(str(docs_dir), out, partitions=3)
    assert rep2["ran"] == 0 and rep2["skipped"] == 3

    final = str(tmp_path / "final")
    comp = compact_clean(out, final)
    assert comp["rows_out"] <= comp["rows_in"]
    # re-compaction replaces, never appends (the CLI resume path re-compacts)
    comp2 = compact_clean(out, final)
    assert comp2["rows_out"] == comp["rows_out"]

    import ray.data as rd

    got = rd.read_parquet(final).to_pandas().sort_values("doc_id")
    assert len(got) == comp["rows_out"]  # no duplicated files after rerun

    import __ray_entry__ as entry

    expect = entry.queries()["corpus_clean_pipeline"]("/root/testdata/sf0.001")
    assert list(got["doc_id"]) == list(expect["doc_id"])
    assert list(got["n_tokens"]) == list(expect["n_tokens"])


def test_sorted_output_files(pages_dir, tmp_path):
    """sort_output=True writes each partition's parquet in (subj, pred, obj)
    order — the deterministic-file-ordering contract (SURVEY §2.6)."""
    import pandas as pd

    from text_to_rdf_ray.pipelines.kg import run_partitioned
    from text_to_rdf_ray.sources.fixtures import kb_records
    from text_to_rdf_ray.state import manifest as mf

    out = str(tmp_path / "sorted")
    run_partitioned(pages_dir, out, partitions=1, kb_records=kb_records(),
                    sort_output=True)
    pdir = mf.partition_dir(out, 0)
    files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    frames = [pd.read_parquet(os.path.join(pdir, f)) for f in files]
    df = pd.concat(frames, ignore_index=True)
    keys = list(map(tuple, df[["subj", "pred", "obj"]].values.tolist()))
    assert keys == sorted(keys)


def test_drop_invalid_filters_triples():
    """KG_VALIDATION_DROP_INVALID semantics: with a registered Error rule
    that invalidates a triple class, drop_invalid=True removes those rows
    while drop_invalid=False keeps them flagged."""
    import pyarrow as pa

    import ray.data as rd

    from text_to_rdf_ray.functions.registry import (
        ValidationRule,
        add_rule,
        clear_rules,
    )
    from text_to_rdf_ray.pipelines.kg import build_triples
    from text_to_rdf_ray.sources.fixtures import wrap_html

    texts = ["Alan Bean was born on the 15th of March 1932."]
    pages = rd.from_arrow(pa.table({
        "url": ["https://di.test/0"],
        "warc_ts": pa.array([1704067200_000000], pa.timestamp("us")),
        "html": pa.array([wrap_html("t", texts[0])], pa.binary()),
        "lang": ["en"],
    }))
    clear_rules()
    try:
        add_rule(ValidationRule(
            name="ban_person", description="", entity_type="Person",
            check_fn=lambda r: False, confidence_impact=-0.5,
            severity="Error",
        ))
        kept = build_triples(pages, canonicalize=False, dedup=False,
                             link=False).to_pandas()
        assert len(kept) > 0 and not kept["valid"].any()
        dropped = build_triples(pages, canonicalize=False, dedup=False,
                                link=False, drop_invalid=True).to_pandas()
        assert len(dropped) == 0
    finally:
        clear_rules()


def test_subject_lookup_prunes_and_matches_full_scan(pages_dir, tmp_path):
    import glob

    import pandas as pd

    from text_to_rdf_ray.pipelines.kg import run_partitioned, subject_lookup
    from text_to_rdf_ray.sources.fixtures import kb_records
    from text_to_rdf_ray.state import counters

    out = str(tmp_path / "graph")
    run_partitioned(pages_dir, out, partitions=2, kb_records=kb_records(),
                    subject_buckets=8)
    files = glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    full = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    subj = full["subj"].value_counts().index[0]

    counters.snapshot(reset=True)
    got = (subject_lookup(out, subj, subject_buckets=8).to_pandas()
           [["subj", "pred", "obj"]]
           .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    c = counters.snapshot(reset=True)
    assert c["sublookup_files_read"] < c["sublookup_files_total"]
    exp = (full.loc[full["subj"] == subj, ["subj", "pred", "obj"]]
           .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_incremental_merge_equals_full_rebuild(pages_dir):
    import numpy as np
    import pyarrow as pa

    from text_to_rdf_ray.kernels.minhash import _hash_shingles
    from text_to_rdf_ray.pipelines.kg import build_triples, read_pages
    from text_to_rdf_ray.sources.fixtures import kb_records
    from text_to_rdf_ray.stages.canonicalize import dedup_triples

    pages = read_pages(pages_dir)

    def split(keep_delta):
        def fn(t: pa.Table) -> pa.Table:
            h = _hash_shingles(t.column("url").to_pylist())
            is_delta = (h % np.uint64(5)) == 0
            return t.filter(pa.array(is_delta if keep_delta
                                     else ~is_delta))
        return fn

    kw = dict(kb_records=kb_records(), canonicalize=False, dedup=False)
    base = build_triples(pages.map_batches(split(False),
                                           batch_format="pyarrow"), **kw)
    delta = build_triples(pages.map_batches(split(True),
                                            batch_format="pyarrow"), **kw)
    merged = (dedup_triples(base.union(delta)).to_pandas()
              [["subj", "pred", "obj"]]
              .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    full = (dedup_triples(build_triples(pages, **kw)).to_pandas()
            [["subj", "pred", "obj"]]
            .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    assert merged.equals(full)
