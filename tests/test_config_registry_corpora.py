"""Config, stage registry, corpus loaders, distributed evaluation."""

import pytest


def test_pipeline_config_defaults_match_reference():
    from text_to_rdf_ray.config import PipelineConfig

    cfg = PipelineConfig()
    assert cfg.coref.max_distance == 3          # coref.rs:98
    assert cfg.chunk.max_chars == 3500          # chunking.rs:102
    assert cfg.chunk.overlap == 400             # chunking.rs:103
    assert cfg.chunk.token_threshold == 2000    # extractor.rs:575
    assert cfg.linker.fuzzy_threshold == 0.8    # entity_linker defaults
    assert cfg.linker.confidence_threshold == 0.5
    assert cfg.validation.min_confidence == 0.7  # validation.rs default
    kwargs = cfg.build_kwargs()
    assert kwargs["lang"] == "en" and kwargs["dedup"] is True


def test_pipeline_config_from_env(monkeypatch):
    from text_to_rdf_ray.config import PipelineConfig

    monkeypatch.setenv("COREF_MAX_DISTANCE", "5")
    monkeypatch.setenv("RDF_CHUNK_THRESHOLD", "1000")
    monkeypatch.setenv("ENTITY_LINKING_FUZZY_THRESHOLD", "0.9")
    monkeypatch.setenv("KG_DEDUP_ENABLED", "false")
    cfg = PipelineConfig.from_env()
    assert cfg.coref.max_distance == 5
    assert cfg.chunk.token_threshold == 1000
    assert cfg.linker.fuzzy_threshold == 0.9
    assert cfg.dedup is False


def test_stage_registry(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from text_to_rdf_ray.functions import registry

    assert "strip_html" in registry.list_stages()
    assert "extract_triples" in registry.list_stages()

    def upper_text(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"text": pa.array([t.upper() for t in batch.column("text").to_pylist()])}
        )

    registry.register_stage("upper_text", upper_text)
    ds = rd.from_items([{"text": "abc"}, {"text": "xyz"}])
    out = registry.apply_stage(ds, "upper_text").take_all()
    assert [r["text"] for r in out] == ["ABC", "XYZ"]


def test_custom_validation_rules():
    from text_to_rdf_ray.functions.registry import (
        ValidationRule,
        apply_custom_rules,
    )

    rule = ValidationRule(
        name="person_birthdate", description="Person should have birthDate",
        required_properties=["birthDate"], entity_type="Person",
        confidence_impact=-0.1,
    )
    doc = {"@type": "Person", "name": "X"}
    violations, delta = apply_custom_rules(doc, [rule])
    assert violations == ["person_birthdate"] and delta == -0.1
    ok = {"@type": "Person", "name": "X", "birthDate": "1990-01-01"}
    assert apply_custom_rules(ok, [rule]) == ([], 0.0)
    org = {"@type": "Organization", "name": "Y"}
    assert apply_custom_rules(org, [rule]) == ([], 0.0)  # type-filtered


def test_corpora_loaders(ray_session):
    from text_to_rdf_ray.sources.corpora import (
        docred_dataset,
        docred_gold_dataset,
        webnlg_dataset,
        webnlg_gold_dataset,
    )

    w = webnlg_dataset().take_all()
    assert len(w) == 4 and w[0]["case_id"] == "astronaut_birthdate_1"
    wg = webnlg_gold_dataset().take_all()
    assert {"subj", "pred", "obj", "case_id"} <= set(wg[0])
    d = docred_dataset().take_all()
    assert len(d) == 3 and "Marie Curie was" in d[0]["raw_text"]
    dg = docred_gold_dataset().take_all()
    assert len(dg) == 14  # 4 + 5 + 5 mapped gold triples


def test_distributed_evaluation_perfect_and_partial(ray_session):
    import ray.data as rd

    from text_to_rdf_ray.pipelines.evaluate import evaluate_datasets

    gold = rd.from_items(
        [
            {"case_id": "a", "subj": "x", "pred": "p", "obj": "1"},
            {"case_id": "a", "subj": "x", "pred": "q", "obj": "2"},
            {"case_id": "b", "subj": "y", "pred": "p", "obj": "3"},
        ]
    )
    pred_perfect = rd.from_items(gold.take_all())
    m = evaluate_datasets(pred_perfect, gold)
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["cases"] == 2

    pred_partial = rd.from_items(
        [
            {"case_id": "a", "subj": "x", "pred": "p", "obj": "1"},
            {"case_id": "a", "subj": "x", "pred": "z", "obj": "9"},  # fp
            {"case_id": "b", "subj": "y", "pred": "p", "obj": "3"},
        ]
    )
    m = evaluate_datasets(pred_partial, gold)
    assert m["micro_tp"] == 2 and m["micro_fp"] == 1 and m["micro_fn"] == 1
    assert abs(m["precision"] - 0.75) < 1e-9  # macro: (0.5 + 1.0)/2


def test_extract_json_block_and_context_injection():
    from text_to_rdf_ray.kernels.jsonld import (
        HARDCODED_CONTEXT,
        extract_json_block,
        inject_hardcoded_context,
        to_json_with_provenance,
    )

    # extractor.rs:746-782 test shapes
    fenced = 'text before ```json\n{"a": 1}\n``` after'
    assert extract_json_block(fenced) == '{"a": 1}'
    bare = 'noise {"a": {"b": 2}} trailing'
    assert extract_json_block(bare) == '{"a": {"b": 2}}'
    assert extract_json_block("no json here") is None

    doc = {"@context": "https://schema.org/", "@type": "Person", "name": "X"}
    injected = inject_hardcoded_context(doc)
    assert injected["@context"] == HARDCODED_CONTEXT
    assert doc["@context"] == "https://schema.org/"  # original untouched

    with_prov = to_json_with_provenance(doc, text_span=(0, 10), confidence=0.9,
                                        chunk_id=1, method="pattern")
    assert with_prov["_provenance"] == {
        "textSpan": [0, 10], "confidence": 0.9, "chunkId": 1, "method": "pattern"
    }


def test_instructor_retry_loop():
    """ST2 semantics: growing conversation, error feedback, bounded retries."""
    from text_to_rdf_ray.functions.instructor import extract_with_retry

    calls = []

    def flaky(conversation):
        calls.append(len(conversation))
        if len(calls) == 1:
            return "no json at all"
        if len(calls) == 2:
            return '{"@type": "Person"}'  # missing name -> validation error
        return '```json\n{"@context": "https://schema.org/", "@type": "Person", "name": "Ada"}\n```'

    res = extract_with_retry(flaky, "Ada was born.", max_retries=2)
    assert res.ok and res.document["name"] == "ada"  # normalized root name
    assert len(res.attempts) == 3
    assert res.attempts[0].error and "No JSON" in res.attempts[0].error
    assert res.attempts[1].error and "Validation failed" in res.attempts[1].error
    # conversation grew: system+user, then per failure the assistant's own
    # response + the error-feedback user message (extractor.rs:271 parity)
    assert calls == [2, 4, 6]
    assert res.conversation[2]["role"] == "assistant"
    assert res.conversation[2]["content"] == "no json at all"
    assert res.conversation[3]["role"] == "user"

    def always_bad(conversation):
        return "nope"

    res2 = extract_with_retry(always_bad, "x", max_retries=1)
    assert not res2.ok and len(res2.attempts) == 2


def test_llm_extract_pipeline_matches_gold(ray_session):
    """The LLM path (actor pool + instructor retries + JSON-LD parse +
    WebNLG flatten) reproduces the gold triples with the deterministic
    stand-in client, including documents whose first attempt is flaky."""
    import ray.data as rd

    from text_to_rdf_ray.sources.fixtures import gold_case
    from text_to_rdf_ray.stages.llm_extract import (
        deterministic_client_factory,
        llm_extract_pipeline,
    )

    rows, gold = [], set()
    for i in range(24):
        text, g = gold_case(i)
        rows.append({"url": f"u{i}", "text": text})
        gold |= g
    pages = rd.from_items(rows)
    # client_factory() runs once per actor and returns the client callable
    out = llm_extract_pipeline(
        pages, client_factory=lambda: deterministic_client_factory(flaky_every=5)
    )
    df = out.to_pandas()
    assert df["ok"].all()
    assert df["attempts"].max() == 2  # flaky docs needed a retry
    got = {(r.subj, r.pred, r.obj) for r in df.itertuples()}
    assert got == gold


def test_stage_registry_actor_stage(ray_session):
    """Registered callable classes run as actor pools with constructor kwargs."""
    import ray.data as rd

    from text_to_rdf_ray.functions import registry
    from text_to_rdf_ray.stages.multimodal import make_fake_media

    ds = rd.from_arrow(make_fake_media(12))
    out = registry.apply_stage(ds, "decode_media_fake").take_all()
    assert len(out) == 12 and all(len(r["features"]) == 16 for r in out)


def test_ntriples_roundtrip(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from text_to_rdf_ray.kernels.normalize import normalize_entity_name
    from text_to_rdf_ray.pipelines.kg import write_ntriples
    from text_to_rdf_ray.sources.ntriples import read_ntriples

    rows = pd.DataFrame({
        "subj": ["Alan Bean", "Weird \"Quote\"", "Back\\slash Co"],
        "pred": ["birthDate", "note", "name"],
        "obj": ["1932-03-15", 'line1\nline2\r"q" \\ end', "Acme"],
        "obj_type": [False, False, True],
    })
    out = str(tmp_path / "nt")
    write_ntriples(rd.from_pandas(rows), out)
    got = (read_ntriples(out).to_pandas()
           .sort_values(["subj_uri", "pred_uri"]).reset_index(drop=True))
    assert len(got) == 3
    base = "https://kg.local/"
    # subjects are slugged URIs
    assert set(got["subj_uri"]) == {
        base + normalize_entity_name(s) for s in rows["subj"]}
    lit = got[~got["obj_is_uri"]].set_index("pred_uri")["obj"]
    assert lit["https://schema.org/birthDate"] == "1932-03-15"
    # escapes round-trip exactly
    assert lit["https://schema.org/note"] == 'line1\nline2\r"q" \\ end'
    uri_row = got[got["obj_is_uri"]]
    assert uri_row["obj"].iloc[0] == base + normalize_entity_name("Acme")


def test_ntriples_bad_lines_counted(ray_session, tmp_path):
    from text_to_rdf_ray.sources.ntriples import read_ntriples
    from text_to_rdf_ray.state import counters

    p = tmp_path / "x.nt"
    p.write_text('<a> <b> "ok" .\nnot a triple line\n'
                 '<a> <b> <c> .\n\n<broken> <x> "unclosed .\n')
    counters.snapshot(reset=True)
    got = read_ntriples(str(p)).to_pandas()
    assert len(got) == 2
    snap = counters.snapshot()
    assert snap.get("ntriples_bad_lines") == 2


def test_warc_roundtrip_framing(ray_session, tmp_path):
    from text_to_rdf_ray.sources.warc import (_parse_warc_bytes,
                                              read_warc,
                                              write_warc_fixture)

    paths = write_warc_fixture(str(tmp_path), 25, shards=2)
    out = (read_warc(paths).to_pandas()
           .sort_values("target_uri").reset_index(drop=True))
    assert len(out) == 25
    # planted 404s at i % 13 == 0
    assert set(out[out["http_status"] == 404]["target_uri"]) == {
        "http://site0.example.com/page/0",
        "http://site6.example.com/page/13",
    }
    # bodies keep their internal blank line intact (Content-Length
    # framing, not blank-line splitting)
    assert out["body"].str.contains("\r\n\r\ntail ").all()
    assert (out["content_type"] == "text/html").all()

    # a payload containing the record separator must NOT split the
    # record when framed by Content-Length
    evil_body = b"WARC/1.0\r\nnot a record"
    http = b"HTTP/1.1 200 X\r\nContent-Type: t/x\r\n\r\n" + evil_body
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://e/x\r\n"
           b"Content-Length: %d\r\n\r\n" % len(http) + http
           + b"\r\n\r\n")
    rows, skipped, bad = _parse_warc_bytes(rec)
    assert len(rows) == 1 and rows[0]["body"] == evil_body.decode()

    # spec-legal no-space separator 'Content-Length:N' must parse
    # (ADVICE r4: partition(': ') bad-counted it)
    rec_ns = (b"WARC/1.0\r\nWARC-Type:response\r\n"
              b"WARC-Target-URI:http://e/y\r\n"
              b"Content-Length:%d\r\n\r\n" % len(http) + http
              + b"\r\n\r\n")
    rows, skipped, bad = _parse_warc_bytes(rec_ns)
    assert len(rows) == 1 and bad == 0
    assert rows[0]["target_uri"] == "http://e/y"

    # truncated final payload: bad-counted, never a shortened body
    trunc = rec[:-(len(http) // 2 + 4)]
    rows, skipped, bad = _parse_warc_bytes(trunc)
    assert len(rows) == 0 and bad == 1

    # negative Content-Length must bad-count and ADVANCE, not step
    # pos backward and loop forever (review r5)
    rec_neg = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: -100\r\n\r\n" + rec)
    rows, skipped, bad = _parse_warc_bytes(rec_neg)
    assert bad == 1 and len(rows) == 1  # trailing good record parsed


def test_warc_pipeline_dedup_counts(ray_session, tmp_path):
    from text_to_rdf_ray.sources.warc import read_warc, write_warc_fixture

    # dup_every=5: pages 0,5,10,15 share page 1's body (page 0 is a
    # 404 so only 5,10,15 survive the status filter alongside 1)
    paths = write_warc_fixture(str(tmp_path), 18, shards=2, dup_every=5)
    df = read_warc(paths).to_pandas()
    ok = df[df["http_status"] == 200]
    dup_bodies = ok[ok["body"].str.contains("tail 1<")]
    assert len(dup_bodies) == 4  # pages 1, 5, 10, 15
    assert ok["target_uri"].nunique() == len(ok)  # URIs stay distinct
