"""Entity-name and predicate normalization.

Re-expresses the reference semantics (/root/reference/src/normalize.rs):

- ``normalize_entity_name``: slugify + ``-`` -> ``_``  (normalize.rs:27-31).
  The slugifier transliterates Unicode to ASCII, lowercases, and collapses
  non-alphanumeric runs to a single separator (matching the behavior of the
  Rust ``slug`` crate on the fixture corpus: "José García" -> "jose_garcia",
  "AT&T Corporation" -> "at_t_corporation").
- ``normalize_predicate``: lowercase then Snowball-English stem
  (normalize.rs:52-71).  Note the reference lowercases *before* testing for
  camelCase, so the camel-split branch never fires: "birthDate" -> "birthdat".
  We reproduce that observable behavior exactly.
- ``normalize_docred_subject``: lowercase + spaces->underscores, punctuation
  preserved ("Apple Inc." -> "apple_inc."), per
  examples/docred_evaluation.rs:236-238.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

from .stemmer import stem

# Transliteration fallbacks for Latin letters that NFKD cannot decompose.
_TRANSLIT = {
    "ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "ð": "d", "þ": "th",
    "đ": "d", "ħ": "h", "ı": "i", "ĸ": "k", "ŀ": "l", "ł": "l",
    "ŋ": "ng", "ŧ": "t",
}


def slugify(text: str) -> str:
    """ASCII slug: transliterate, lowercase, non-alnum runs -> ``-``, trim."""
    out: list[str] = []
    pending_sep = False
    for ch in unicodedata.normalize("NFKD", text.lower()):
        if unicodedata.combining(ch):
            continue
        ch = _TRANSLIT.get(ch, ch)
        for c in ch:
            if c.isascii() and c.isalnum():
                if pending_sep and out:
                    out.append("-")
                pending_sep = False
                # lowercase again: NFKD can decompose caseless symbols into
                # uppercase ASCII (e.g. mathematical bold capital A)
                out.append(c.lower())
            else:
                pending_sep = True
    return "".join(out)


@lru_cache(maxsize=65536)
def normalize_entity_name(name: str) -> str:
    """"Alan Bean" -> "alan_bean"; "José García" -> "jose_garcia"."""
    return slugify(name).replace("-", "_")


@lru_cache(maxsize=65536)
def normalize_predicate(predicate: str) -> str:
    """Lowercase + Snowball stem: "birthDate" -> "birthdat", "serves" -> "serv"."""
    return stem(predicate.lower())


def normalize_docred_subject(name: str) -> str:
    """Lowercase, spaces -> underscores, punctuation preserved."""
    return name.lower().replace(" ", "_")


def normalize_jsonld_value(value, is_root: bool = True):
    """Normalize a JSON-LD tree in place, root entity name only.

    Mirrors normalize.rs:98-142: the root object's ``name`` is slugified;
    nested entity names are preserved for KB matching; free strings are
    normalized only when they look like a proper name with whitespace
    (no ``-``, no URL, at least one uppercase char).
    """
    if isinstance(value, dict):
        if is_root and isinstance(value.get("name"), str):
            value["name"] = normalize_entity_name(value["name"])
        for key, val in value.items():
            if key not in ("@context", "@id", "@type", "name"):
                value[key] = normalize_jsonld_value(val, is_root=False)
        return value
    if isinstance(value, list):
        return [normalize_jsonld_value(v, is_root=False) for v in value]
    if isinstance(value, str):
        s = value
        if (
            not s.startswith("http")
            and "://" not in s
            and "-" not in s
            and any(c.isspace() for c in s)
            and any(c.isupper() for c in s)
        ):
            return normalize_entity_name(s)
        return s
    return value
