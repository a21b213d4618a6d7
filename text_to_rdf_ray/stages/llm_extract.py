"""LLM-backed extraction stage (ST1/ST2 path as a Ray actor pool).

The reference's primary extractor is an LLM with an Instructor-style
validate-and-retry loop (/root/reference/src/extractor.rs:120-308).  This
stage runs that exact flow per document inside an actor pool — client held
as actor state, conversation-growing retries, JSON extraction, JSON-LD
normalization + validation, WebNLG-flavor flattening to triple rows.

There is no network in this environment, so the default client is a
DETERMINISTIC stand-in that renders the pattern extractor's JSON-LD (the
same text -> same "LLM response" every call); a real `genai`-style client
drops in via ``client_factory`` without touching the pipeline.  A
``flaky_every`` knob makes the stand-in return garbage on the first attempt
for every k-th document, exercising the retry path inside the pipeline.
"""

from __future__ import annotations

import json

import pyarrow as pa

LLM_TRIPLE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("attempts", pa.int32()),
        ("ok", pa.bool_()),
    ]
)


def deterministic_client_factory(flaky_every: int = 0):
    """A stand-in 'LLM': renders the deterministic extractor's JSON-LD for
    the conversation's document text.  ``flaky_every > 0`` makes every
    k-th document's FIRST attempt malformed (drives the retry loop)."""
    from ..kernels.extractor import extract_document
    from ..kernels.jsonld import render_jsonld

    state = {"doc_count": 0, "seen": set()}

    def client(conversation) -> str:
        text = conversation[1]["content"]
        first_attempt = len(conversation) == 2
        if first_attempt:
            state["doc_count"] += 1
        if (
            flaky_every
            and first_attempt
            and state["doc_count"] % flaky_every == 0
        ):
            return "malformed response with no json"
        doc = render_jsonld(extract_document(text).triples)
        return "```json\n" + json.dumps(doc) + "\n```"

    return client


class LLMExtract:
    """Actor-pool stage: pages (url, text) -> WebNLG-flavor triple rows via
    the full LLM path (client -> instructor retries -> JSON-LD -> flatten).

    The client is built ONCE per actor (``client_factory`` runs in
    ``__init__`` — where a real deployment opens its HTTP client / loads
    its prompt config)."""

    def __init__(self, client_factory=None, max_retries: int = 2):
        from ..functions.instructor import extract_with_retry  # noqa: F401

        factory = client_factory or deterministic_client_factory
        self.client = factory()
        self.max_retries = max_retries

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.instructor import extract_with_retry
        from ..kernels.jsonld import flatten_webnlg

        cols = {name: [] for name in LLM_TRIPLE_SCHEMA.names}
        for url, text in zip(
            batch.column("url").to_pylist(), batch.column("text").to_pylist()
        ):
            if not text:
                continue
            result = extract_with_retry(self.client, text, max_retries=self.max_retries)
            n_attempts = len(result.attempts)
            if not result.ok:
                cols["url"].append(url)
                cols["subj"].append("")
                cols["pred"].append("")
                cols["obj"].append("")
                cols["attempts"].append(n_attempts)
                cols["ok"].append(False)
                continue
            for s, p, o in sorted(flatten_webnlg(result.document)):
                cols["url"].append(url)
                cols["subj"].append(s)
                cols["pred"].append(p)
                cols["obj"].append(o)
                cols["attempts"].append(n_attempts)
                cols["ok"].append(True)
        return pa.table(
            {n: pa.array(cols[n], LLM_TRIPLE_SCHEMA.field(n).type)
             for n in LLM_TRIPLE_SCHEMA.names}
        )


def llm_extract_pipeline(pages, *, concurrency=(1, 4), batch_size: int = 64,
                         client_factory=None, max_retries: int = 2):
    """pages Dataset (url, text) -> LLM-path triples Dataset."""
    return pages.map_batches(
        LLMExtract,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "client_factory": client_factory,
            "max_retries": max_retries,
        },
    )
