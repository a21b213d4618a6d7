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


def jaro_winkler_batch(s1s, s2s, prefix_scale: float = 0.1,
                       chunk: int = 16384):
    """Vectorized Jaro-Winkler over N string pairs -> float64[N].

    Bit-identical to the scalar ``jaro_winkler`` (parity-tested): the
    greedy window matching runs as a column sweep — one numpy pass over
    all N pairs per character position, O(L1) python iterations total
    instead of O(N x L1 x L2) interpreted char comparisons.  This is the
    fuzzy link join's scoring kernel: candidate volume is
    band-blocking-proportional, so at 10^8 surfaces the per-candidate
    cost must be a numpy op, not an interpreted loop.  Row-chunked so the
    (chunk x L2) working set stays cache-sized regardless of N.
    """
    import numpy as np

    s1s, s2s = list(s1s), list(s2s)
    n = len(s1s)
    out = np.zeros(n, np.float64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        out[lo:hi] = _jw_chunk(s1s[lo:hi], s2s[lo:hi], prefix_scale)
    return out


def _jw_chunk(s1s: list, s2s: list, prefix_scale: float):
    import numpy as np

    n = len(s1s)
    len1 = np.fromiter((len(s) for s in s1s), np.int64, n)
    len2 = np.fromiter((len(s) for s in s2s), np.int64, n)
    L1 = max(int(len1.max()), 1)
    L2 = max(int(len2.max()), 1)
    # numpy U-dtype arrays pad with \0 -> (n, L) uint32 codepoint grids
    A = np.asarray(s1s, dtype=f"U{L1}").view(np.uint32).reshape(n, L1)
    B = np.asarray(s2s, dtype=f"U{L2}").view(np.uint32).reshape(n, L2)

    w = np.maximum(np.maximum(len1, len2) // 2 - 1, 0)
    cols2 = np.arange(L2, dtype=np.int64)
    used = np.zeros((n, L2), bool)
    m1 = np.zeros((n, L1), np.uint32)  # matched s1 chars, in i order
    mcnt = np.zeros(n, np.int64)
    ridx = np.arange(n)
    for i in range(L1):
        active = i < len1
        if not active.any():
            break
        lo_b = np.maximum(0, i - w)[:, None]
        hi_b = np.minimum(len2, i + w + 1)[:, None]
        cand = ((B == A[:, i][:, None]) & ~used
                & (cols2 >= lo_b) & (cols2 < hi_b) & active[:, None])
        hit = cand.any(axis=1)
        j = cand.argmax(axis=1)
        r = ridx[hit]
        used[r, j[hit]] = True
        m1[r, mcnt[r]] = A[r, i]
        mcnt[r] += 1
    # matched s2 chars in j order
    m2 = np.zeros((n, L1), np.uint32)
    c2 = np.zeros(n, np.int64)
    for j in range(L2):
        r = ridx[used[:, j]]
        m2[r, c2[r]] = B[r, j]
        c2[r] += 1
    valid = np.arange(L1) < mcnt[:, None]
    trans = ((m1 != m2) & valid).sum(axis=1)
    m = mcnt.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro_v = (m / len1 + m / len2 + (m - trans / 2.0) / m) / 3.0
    jaro_v = np.where(mcnt == 0, 0.0, jaro_v)
    # scalar jaro short-circuits s1 == s2 -> 1.0 (covers the empty==empty
    # case its length guard would otherwise zero)
    eq = np.fromiter((a == b for a, b in zip(s1s, s2s)), bool, n)
    jaro_v = np.where(eq, 1.0, jaro_v)
    # winkler prefix: leading equal chars, capped at 4, within both lengths
    P = min(4, L1, L2)
    if P:
        pref_eq = (A[:, :P] == B[:, :P]) & \
            (np.arange(P) < np.minimum(len1, len2)[:, None])
        prefix = np.cumprod(pref_eq, axis=1).sum(axis=1)
    else:
        prefix = np.zeros(n, np.int64)
    return jaro_v + prefix * prefix_scale * (1.0 - jaro_v)


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
