"""Instructor-pattern validate-and-retry loop (ST2).

Re-expresses /root/reference/src/extractor.rs:227-308: an extractor is
called with a growing conversation (system prompt + user text + structured
error feedback from failed attempts); each response is JSON-extracted,
parsed, normalized and validated; on failure the error is appended and the
extractor re-asked, up to ``max_retries`` (reference default 2,
lib.rs:100-102).  This is SEMANTIC retry inside the UDF, distinct from Ray
task retry (which re-runs the whole deterministic task).

The deterministic pipeline does not use it; it is the shell for the
optional LLM-backed extractor mode (plug an LLM client in as
``extract_fn``) and is exercised in tests with deterministic fakes.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from ..kernels.jsonld import extract_json_block, inject_hardcoded_context
from ..kernels.normalize import normalize_jsonld_value
from ..kernels.validation import validate_document

DEFAULT_MAX_RETRIES = 2

SYSTEM_PROMPT = (
    "Extract entities and relations from the text as a Schema.org JSON-LD "
    "object with @context, @type and name; nest related entities one level "
    "deep under their relation keys."
)


@dataclass
class Attempt:
    response: str
    error: str | None = None


@dataclass
class RetryResult:
    document: dict | None
    attempts: list[Attempt] = field(default_factory=list)
    conversation: list[dict] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.document is not None


def extract_with_retry(
    extract_fn,
    text: str,
    *,
    max_retries: int = DEFAULT_MAX_RETRIES,
    min_confidence: float = 0.7,
    system_prompt: str = SYSTEM_PROMPT,
) -> RetryResult:
    """Run ``extract_fn(conversation) -> str`` through the validate-and-
    retry loop.  The conversation grows across attempts exactly as in the
    reference (system + user, then error feedback per failure)."""
    conversation = [
        {"role": "system", "content": system_prompt},
        {"role": "user", "content": text},
    ]
    result = RetryResult(document=None, conversation=conversation)
    for _ in range(max_retries + 1):
        response = extract_fn(conversation)
        error: str | None = None
        doc = None
        block = extract_json_block(response)
        if block is None:
            error = "No JSON object found in response"
        else:
            try:
                doc = json.loads(block)
            except json.JSONDecodeError as exc:
                error = f"Invalid JSON: {exc}"
        if doc is not None:
            normalize_jsonld_value(doc)
            doc = inject_hardcoded_context(doc)
            validation = validate_document(doc, min_confidence=min_confidence)
            if not validation.valid:
                error = "Validation failed: " + "; ".join(
                    v.message for v in validation.violations
                )
                doc = None
        result.attempts.append(Attempt(response=response, error=error))
        if doc is not None:
            result.document = doc
            return result
        # push the assistant's own (failed) response before the feedback so
        # a retried client sees its prior output (extractor.rs:271 parity)
        conversation.append({"role": "assistant", "content": response})
        conversation.append(
            {
                "role": "user",
                "content": (
                    f"The previous response was invalid: {error}. "
                    "Return only a corrected JSON-LD object."
                ),
            }
        )
    return result
