"""Entity linking against a local KB (deterministic).

Re-expresses /root/reference/src/entity_linker.rs:127-500 without Oxigraph:
the KB is a small Parquet table (uri, label, aliases, types) loaded into an
in-memory index (exact lowercase dict + first-char/length candidate
buckets).  Matching semantics preserved:

- exact (case-insensitive) label/alias match -> confidence 0.95
  (entity_linker.rs:360-369);
- fuzzy candidates scored with Jaro-Winkler on lowercased strings,
  kept when >= fuzzy_threshold (default 0.8), confidence = similarity
  (entity_linker.rs:371-387);
- filter by confidence_threshold (default 0.5), sort by confidence desc,
  deterministic tie-break by uri asc (the reference's unstable sort made
  LLM-free top-1 ambiguous; we pin it for N-vs-4N determinism), take top-1.

The Ray stage holds one ``KBIndex`` per actor (built once in __init__ from
a ray.put broadcast), replacing the reference's per-process Oxigraph store.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

EXACT_CONFIDENCE = 0.95
DEFAULT_FUZZY_THRESHOLD = 0.8
DEFAULT_CONFIDENCE_THRESHOLD = 0.5
MIN_CANDIDATES_FOR_LLM = 2  # entity_linker.rs:409-479 (lib.rs config default)


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1) -> float:
    """Jaro-Winkler as in the strsim crate (prefix up to 4, scale 0.1)."""
    j = jaro(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 == c2:
            prefix += 1
        else:
            break
    return j + prefix * prefix_scale * (1.0 - j)


@dataclass
class LinkedEntity:
    surface_form: str
    uri: str
    types: tuple
    confidence: float


class KBIndex:
    """In-memory KB: exact dict + (first_char, len-bucket) fuzzy blocks.

    Candidate generation approximates the reference's SPARQL ``CONTAINS``
    scan (entity_linker.rs:289-319) without a linear pass: fuzzy candidates
    are labels sharing the query's first character or containing the query
    as a substring within +/-60% length.  At 10^12 scale the same blocking
    keys become the shuffle keys of a partitioned link join (SURVEY.md J2).
    """

    def __init__(self, records, fuzzy_threshold=DEFAULT_FUZZY_THRESHOLD,
                 confidence_threshold=DEFAULT_CONFIDENCE_THRESHOLD,
                 disambiguator=None,
                 min_candidates_for_llm=MIN_CANDIDATES_FOR_LLM):
        self.fuzzy_threshold = fuzzy_threshold
        self.confidence_threshold = confidence_threshold
        #: optional ``disambiguator(surface, candidates) -> LinkedEntity | None``
        #: plug point mirroring the reference's LLM disambiguation hook
        #: (entity_linker.rs:409-479, min_candidates_for_llm=2); invoked only
        #: when >= min_candidates_for_llm candidates survive filtering, and
        #: the deterministic top-1 remains the fallback when it declines.
        self.disambiguator = disambiguator
        self.min_candidates_for_llm = min_candidates_for_llm
        self.exact: dict[str, list[tuple[str, str, tuple]]] = defaultdict(list)
        self.by_first: dict[str, list[tuple[str, str, tuple]]] = defaultdict(list)
        for rec in records:
            uri = rec["uri"]
            types = tuple(rec.get("types") or ())
            labels = [rec["label"], *(rec.get("aliases") or ())]
            for lab in labels:
                low = lab.lower()
                entry = (low, uri, types)
                self.exact[low].append((lab, uri, types))
                if low:
                    self.by_first[low[0]].append((lab, uri, types))

    def candidates(self, name: str) -> list[LinkedEntity]:
        low = name.lower()
        out: list[LinkedEntity] = []
        exact_hits = self.exact.get(low, ())
        for lab, uri, types in exact_hits:
            out.append(LinkedEntity(lab, uri, types, EXACT_CONFIDENCE))
        if not out:
            seen = set()
            for lab, uri, types in self.by_first.get(low[:1], ()):
                if (lab, uri) in seen:
                    continue
                seen.add((lab, uri))
                lab_low = lab.lower()
                if abs(len(lab_low) - len(low)) > max(3, int(0.6 * len(low))) and low not in lab_low:
                    continue
                sim = jaro_winkler(lab_low, low)
                if sim >= self.fuzzy_threshold:
                    out.append(LinkedEntity(lab, uri, types, sim))
        out = [c for c in out if c.confidence >= self.confidence_threshold]
        out.sort(key=lambda c: (-c.confidence, c.uri))
        return out

    def link(self, name: str) -> LinkedEntity | None:
        """Top-1 link: deterministic (conf desc, uri asc) by default; when a
        ``disambiguator`` is plugged and the candidate set is ambiguous
        (>= min_candidates_for_llm), it picks among the candidates — the
        scale-safe deterministic tie-break stays the fallback."""
        if not name:
            return None
        cands = self.candidates(name)
        if not cands:
            return None
        if self.disambiguator is not None and len(cands) >= self.min_candidates_for_llm:
            chosen = self.disambiguator(name, list(cands))
            if chosen is not None:
                return chosen
        return cands[0]

    def link_batch(self, names) -> list[LinkedEntity | None]:
        cache: dict[str, LinkedEntity | None] = {}
        out = []
        for n in names:
            if n not in cache:
                cache[n] = self.link(n)
            out.append(cache[n])
        return out
