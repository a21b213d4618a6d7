"""Reference-corpus loaders as Ray Datasets (SURVEY.md S1/S2).

- WebNLG-style test cases (tests/integration_tests.rs:112-123 shape):
  ``{id, raw_text, expected_triples, expected_jsonld}`` rows.
- DocRED samples (examples/docred_evaluation.rs:43-102, 529-541):
  full text rebuilt from the token matrix (space-joined tokens,
  "\\n\\n"-joined sentences, docred_evaluation.rs:172-183) and gold triples
  derived through the 18-entry Wikidata->Schema.org map
  (docred_evaluation.rs:200-222) with first-mention subjects
  (docred_evaluation.rs:225-248).
"""

from __future__ import annotations

import json

import ray.data as rd

from ..kernels.normalize import normalize_predicate

WEBNLG_FIXTURE = "/root/reference/tests/fixtures/test_cases.json"
DOCRED_FIXTURE = "/root/reference/tests/fixtures/docred_sample.json"

# docred_evaluation.rs:200-222
WIKIDATA_TO_SCHEMA = {
    "P17": "addressCountry", "P131": "containedInPlace", "P276": "location",
    "P27": "nationality", "P69": "alumniOf", "P108": "worksFor",
    "P39": "jobTitle", "P102": "memberOf", "P54": "memberOf", "P463": "memberOf",
    "P19": "birthPlace", "P20": "deathPlace", "P569": "birthDate",
    "P570": "deathDate", "P571": "foundingDate", "P576": "dissolutionDate",
    "P37": "language", "P159": "location",
}


def load_webnlg_cases(path: str = WEBNLG_FIXTURE) -> list[dict]:
    with open(path) as f:
        return json.load(f)


def webnlg_dataset(path: str = WEBNLG_FIXTURE) -> rd.Dataset:
    """(case_id, raw_text) rows."""
    cases = load_webnlg_cases(path)
    return rd.from_items(
        [{"case_id": c["id"], "raw_text": c["raw_text"]} for c in cases]
    )


def webnlg_gold_dataset(path: str = WEBNLG_FIXTURE) -> rd.Dataset:
    """(case_id, subj, pred, obj) gold rows."""
    rows = []
    for c in load_webnlg_cases(path):
        for t in c["expected_triples"]:
            rows.append(
                {"case_id": c["id"], "subj": t["subject"], "pred": t["predicate"],
                 "obj": t["object"]}
            )
    return rd.from_items(rows)


def docred_full_text(doc: dict) -> str:
    """docred_evaluation.rs:172-183."""
    return "\n\n".join(" ".join(sent) for sent in doc["sents"])


def docred_gold_triples(doc: dict) -> set[tuple[str, str, str]]:
    """docred_evaluation.rs:225-248."""
    gold = set()
    for lab in doc["labels"]:
        prop = WIKIDATA_TO_SCHEMA.get(lab["r"])
        if prop is None:
            continue
        head = doc["vertexSet"][lab["h"]]
        tail = doc["vertexSet"][lab["t"]]
        if not head or not tail:
            continue
        subj = head[0]["name"].lower().replace(" ", "_")
        gold.add((subj, normalize_predicate(prop), tail[0]["name"]))
    return gold


def load_docred_docs(path: str = DOCRED_FIXTURE) -> list[dict]:
    with open(path) as f:
        return json.load(f)


def docred_dataset(path: str = DOCRED_FIXTURE) -> rd.Dataset:
    """(case_id, raw_text) rows with reconstructed full text."""
    docs = load_docred_docs(path)
    return rd.from_items(
        [{"case_id": d["id"], "raw_text": docred_full_text(d)} for d in docs]
    )


def docred_gold_dataset(path: str = DOCRED_FIXTURE) -> rd.Dataset:
    rows = []
    for d in load_docred_docs(path):
        for s, p, o in sorted(docred_gold_triples(d)):
            rows.append({"case_id": d["id"], "subj": s, "pred": p, "obj": o})
    return rd.from_items(rows)
