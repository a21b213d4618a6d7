"""Text analysis kernels: language ID, quality scoring, token counting.

Training-data-pipeline operators (not present in the reference; first-class
per the build brief).  All are deterministic pure functions; the stage
versions vectorize with pandas/pyarrow.  The language-ID heuristic and the
quality score are intentionally simple closed-form functions so the DuckDB
oracle SQL can mirror them exactly.
"""

from __future__ import annotations

import re

# marker stopwords per language (closed lists so oracle SQL can replicate)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "es"),
}

STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as by at".split()
)

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword splitter: letter runs, digit runs, single punctuation
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    return len(_TOKEN_RE.findall(text))


def token_count_bpe(text: str) -> int:
    """BPE-ish token estimate: letter runs + digit runs + punctuation marks."""
    return len(_BPE_RE.findall(text))


def lang_id(text: str) -> str:
    """Argmax of per-language marker-word counts; ties/zero -> "und".

    Deterministic tie-break: the language earlier in en < de < fr < es wins.
    """
    words = text.lower().split()
    if not words:
        return "und"
    best_lang, best_score = "und", 0
    for lang in ("en", "de", "fr", "es"):
        score = sum(1 for w in words if w in LANG_MARKERS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def quality_score(text: str) -> dict:
    """Quality features + composite score in [0,1].

    Features: length, mean word length, stopword ratio, punctuation ratio,
    alpha ratio.  Composite = mix used to filter training corpora; kept as
    an explicit formula (no model) for oracle parity.
    """
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    if n_words == 0:
        return {
            "n_chars": n_chars, "n_words": 0, "mean_word_len": 0.0,
            "stopword_ratio": 0.0, "punct_ratio": 0.0, "alpha_ratio": 0.0,
            "quality": 0.0,
        }
    n_alpha = sum(1 for c in text if c.isalpha())
    n_punct = sum(1 for c in text if c in ".,;:!?'\"()-")
    n_stop = sum(1 for w in words if w.lower() in STOPWORDS_EN)
    mean_wl = (sum(len(w) for w in words)) / n_words
    stop_r = n_stop / n_words
    punct_r = n_punct / n_chars if n_chars else 0.0
    alpha_r = n_alpha / n_chars if n_chars else 0.0
    length_term = min(1.0, n_words / 50.0)
    wl_term = 1.0 if 3.0 <= mean_wl <= 8.0 else 0.5
    quality = max(0.0, min(1.0, 0.4 * length_term + 0.2 * wl_term
                           + 0.2 * min(1.0, 2.0 * stop_r) + 0.2 * alpha_r))
    return {
        "n_chars": n_chars, "n_words": n_words, "mean_word_len": mean_wl,
        "stopword_ratio": stop_r, "punct_ratio": punct_r, "alpha_ratio": alpha_r,
        "quality": quality,
    }
