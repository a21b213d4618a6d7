"""KnowledgeBuffer, entity linker, validation, metrics kernels."""

from text_to_rdf_ray.kernels.knowledge import KnowledgeBuffer
from text_to_rdf_ray.kernels.linker import KBIndex, jaro_winkler
from text_to_rdf_ray.kernels.metrics import evaluate, macro_average
from text_to_rdf_ray.kernels.validation import (
    score_triple,
    validate_document,
)


def test_kb_first_write_wins():
    # knowledge_buffer.rs:40-51
    kb = KnowledgeBuffer()
    kb.register("Marie Curie", "Person", 0)
    kb.register("Marie Curie", "Organization", 50)  # ignored
    assert kb.get("marie curie").kind == "Person"
    assert kb.get("MARIE CURIE").first_offset == 0
    assert len(kb) == 1


def test_kb_alias_resolution():
    # knowledge_buffer.rs:54-63, 110-120
    kb = KnowledgeBuffer()
    kb.register("Marie Curie", "Person", 0)
    kb.add_alias("She", "Marie Curie")
    assert kb.get("she").canonical_name == "Marie Curie"


def test_kb_last_of_kind():
    # knowledge_buffer.rs:124-130
    kb = KnowledgeBuffer()
    kb.register("Acme Corp", "Organization", 0)
    kb.register("Globex Corp", "Organization", 100)
    assert kb.last_of_kind({"Organization"}).canonical_name == "Globex Corp"
    assert kb.last_of_kind({"Organization"}, before=50).canonical_name == "Acme Corp"


def test_kb_kind_aware_resolve():
    kb = KnowledgeBuffer()
    kb.register("Stanford University", "EducationalOrganization", 0)
    kb.register("Leland Stanford", "Person", 40)
    kb.register("Stanford", "Place", 20)
    # org slot -> university, despite exact Place match and Person containment
    assert (
        kb.resolve("Stanford", expected_kind="EducationalOrganization").canonical_name
        == "Stanford University"
    )
    # place slot -> the exact Place entity
    assert kb.resolve("Stanford", expected_kind="Place").canonical_name == "Stanford"


def test_kb_context_summary():
    kb = KnowledgeBuffer()
    kb.register("Marie Curie", "Person", 0)
    kb.add_alias("She", "Marie Curie")
    s = kb.context_summary()
    assert "Marie Curie" in s and "She" in s


def test_jaro_winkler_strsim_values():
    # strsim crate semantics: prefix scale 0.1, max prefix 4
    assert jaro_winkler("", "") == 1.0
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    assert abs(jaro_winkler("martha", "marhta") - 0.9611111) < 1e-6
    assert abs(jaro_winkler("dixon", "dicksonx") - 0.8133333) < 1e-6


KB = [
    {"uri": "https://kb.test/resource/alan-bean", "label": "Alan Bean",
     "aliases": ["Alan Bea"], "types": ["Person"]},
    {"uri": "https://kb.test/resource/apple-fruit", "label": "Apple",
     "aliases": [], "types": ["Thing"]},
    {"uri": "https://kb.test/resource/apple-inc", "label": "Apple",
     "aliases": ["Apple Inc"], "types": ["Organization"]},
]


def test_linker_exact_confidence_095():
    # entity_linker.rs:360-369
    idx = KBIndex(KB)
    link = idx.link("alan bean")
    assert link.uri == "https://kb.test/resource/alan-bean"
    assert link.confidence == 0.95


def test_linker_fuzzy_jaro_winkler():
    # entity_linker.rs:371-387: fuzzy >= 0.8, confidence = similarity
    idx = KBIndex(KB)
    link = idx.link("Alan Beam")  # typo
    assert link is not None and link.uri == "https://kb.test/resource/alan-bean"
    assert link.confidence >= 0.8  # raw JW similarity (may exceed the 0.95 exact score)


def test_linker_deterministic_ambiguous_tiebreak():
    # two KB entries share label "Apple": conf ties broken by uri asc
    idx = KBIndex(KB)
    link = idx.link("Apple")
    assert link.uri == "https://kb.test/resource/apple-fruit"


def test_linker_below_threshold_none():
    idx = KBIndex(KB)
    assert idx.link("Zzzzqqq") is None
    assert idx.link("") is None


def test_validation_reference_arithmetic():
    # validation.rs:183-298
    ok = {"@context": "https://schema.org/", "@type": "Person", "name": "X",
          "birthDate": "1932-03-15"}
    res = validate_document(ok)
    assert res.valid and res.confidence == 1.0

    bad_date = dict(ok, birthDate="March 15, 1932")
    res = validate_document(bad_date)
    assert abs(res.confidence - 0.95) < 1e-9 and res.valid  # warning only

    no_name = {"@context": "https://schema.org/", "@type": "Person"}
    res = validate_document(no_name)
    assert not res.valid and abs(res.confidence - 0.8) < 1e-9

    no_context = {"@type": "Person", "name": "X"}
    res = validate_document(no_context)
    assert not res.valid and res.confidence == 0.5

    bad_uri = dict(ok, **{"@id": "not-a-uri"})
    res = validate_document(bad_uri)
    assert abs(res.confidence - 0.9) < 1e-9


def test_score_triple_column_arithmetic():
    assert score_triple("birthDate", "1932-03-15", False) == 1.0
    assert abs(score_triple("birthDate", "bad", False) - 0.95) < 1e-9
    assert abs(score_triple("x", "y", False, has_subj=False) - 0.8) < 1e-9


def test_metrics_reference_math():
    # integration_tests.rs:144-204
    pred = {("a", "p", "1"), ("a", "q", "2")}
    gold = {("a", "p", "1"), ("a", "r", "3")}
    m = evaluate(pred, gold)
    assert m.true_positives == 1 and m.false_positives == 1 and m.false_negatives == 1
    assert m.precision == 0.5 and m.recall == 0.5 and m.f1_score == 0.5
    assert evaluate(set(), set()).f1_score == 0.0
    avg = macro_average([m, evaluate(gold, gold)])
    assert abs(avg["f1_score"] - 0.75) < 1e-9
