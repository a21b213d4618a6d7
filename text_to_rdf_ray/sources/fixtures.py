"""Deterministic synthetic corpora (no external data, fixed seed).

Generates:
- the sentence-grid gold corpus extending the reference's WebNLG patterns
  (FIXTURES.md §2) with computable expected triples;
- Common-Crawl-style ``pages`` Parquet tables (FIXTURES.md §1) whose
  ``html`` wraps the gold ``text`` so the boilerplate-strip stage must
  recover it byte-identically;
- the KB/alias table (FIXTURES.md §4) for mention detection and linking.

Everything is a pure function of (n, seed): safe to regenerate anywhere.
"""

from __future__ import annotations

import html as html_mod
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIRST_NAMES = [
    "Alan", "Marie", "Pierre", "Grace", "Linus", "Ada", "Edsger", "Barbara",
    "Donald", "Radia", "Vint", "Hedy", "Claude", "Rosalind", "Niels", "Lise",
]
LAST_NAMES = [
    "Bean", "Curie", "Hopper", "Lovelace", "Dijkstra", "Liskov", "Knuth",
    "Perlman", "Cerf", "Lamarr", "Shannon", "Franklin", "Bohr", "Meitner",
]
UNIVERSITIES = [
    "UT Austin", "University of Paris", "Stanford University", "MIT",
    "Aarhus University", "University of Warsaw", "ETH Zurich",
    "Cambridge University", "Princeton University", "Oxford University",
]
CITIES = [
    "Aarhus", "Warsaw", "Cupertino", "Paris", "Berlin", "Madrid", "Rome",
    "Vienna", "Dublin", "Lisbon", "Prague", "Oslo", "Helsinki", "Geneva",
]
COUNTRIES_LIST = [
    "Denmark", "Poland", "America", "France", "Germany", "Spain", "Italy",
    "Austria", "Ireland", "Portugal", "Norway", "Finland", "Switzerland",
]
COMPANIES = [
    "Acme Corp", "Globex Corp", "Initech Inc", "Umbrella Corp",
    "Stark Industries Inc", "Wayne Enterprises Inc", "Hooli Inc", "Vandelay Industries Inc",
]
MONTH_NAMES = ["January", "February", "March", "April", "May", "June", "July",
               "August", "September", "October", "November", "December"]

# hot entities for the skew path (repeated across many pages)
HOT_ENTITIES = ["United States", "Apple Inc", "Stanford University"]


def _name(i: int) -> str:
    return f"{FIRST_NAMES[i % len(FIRST_NAMES)]} {LAST_NAMES[(i // len(FIRST_NAMES)) % len(LAST_NAMES)]}"


def gold_case(i: int) -> tuple[str, set[tuple[str, str, str]]]:
    """Deterministic gold sentence + expected (subj_slug, pred, obj) set."""
    from ..kernels.normalize import normalize_entity_name

    kind = i % 4
    name = _name(i)
    slug = normalize_entity_name(name)
    day = 1 + (i % 28)
    month = MONTH_NAMES[i % 12]
    year = 1900 + (i % 100)
    iso = f"{year:04d}-{1 + (i % 12):02d}-{day:02d}"
    city = CITIES[i % len(CITIES)]
    country = COUNTRIES_LIST[i % len(COUNTRIES_LIST)]
    univ = UNIVERSITIES[i % len(UNIVERSITIES)]
    if kind == 0:
        th = {1: "st", 2: "nd", 3: "rd"}.get(day % 10 if day not in (11, 12, 13) else 0, "th")
        text = f"{name} was born on the {day}{th} of {month} {year}."
        return text, {(slug, "birthdat", iso)}
    if kind == 1:
        text = f"{name} graduated from {univ} in {year} with a B.S."
        return text, {(slug, "alumniof", univ)}
    if kind == 2:
        text = f"{city} Airport serves the city of {city}, {country}."
        return text, {(normalize_entity_name(f"{city} Airport"), "locat", city)}
    text = f"The {city} is the airport of {city}, {country}."
    return text, {(normalize_entity_name(f"{city} Airport"), "locat", city)}


def long_document(i: int, min_chars: int = 15000) -> str:
    """Multi-paragraph document exceeding the chunking threshold, with
    pronouns and definite descriptions so coref is load-bearing."""
    name = _name(i)
    city = CITIES[i % len(CITIES)]
    country = COUNTRIES_LIST[i % len(COUNTRIES_LIST)]
    univ = UNIVERSITIES[i % len(UNIVERSITIES)]
    company = COMPANIES[i % len(COMPANIES)]
    paras = [
        f"{name} was born in {city} , {country} in {1900 + i % 90} .",
        f"{name} studied at the {univ} , where research was carried out .",
        f"{company} is headquartered in {city} , {country} .",
        f"{name} served as CEO until retirement .",
    ]
    filler_bits = []
    j = 0
    while sum(len(p) for p in paras) + sum(len(f) for f in filler_bits) < min_chars:
        filler_bits.append(
            f"In year {1950 + (i + j) % 70} the laboratory recorded result number {j} "
            f"during the long experiment, and the archive kept growing steadily."
        )
        j += 1
    body = []
    for k, p in enumerate(paras):
        body.append(p)
        body.extend(filler_bits[k * len(filler_bits) // 4 : (k + 1) * len(filler_bits) // 4])
    return "\n\n".join(body)


def wrap_html(title: str, text: str) -> bytes:
    """Synthetic page wrapper; the extractor must recover exactly ``text``."""
    esc = html_mod.escape(text, quote=False)
    t = html_mod.escape(title, quote=False)
    return (
        f"<html><head><title>{t}</title><script>var x = 1;</script>"
        f"<style>p {{margin: 0}}</style></head><body><nav>home | about | contact</nav>"
        f"<article>{esc}</article><footer>&copy; 2026 fixtures.test</footer>"
        f"</body></html>"
    ).encode("utf-8")


def _lang_for(i: int, seed: int) -> str:
    """Per-index deterministic language tag (~80%% en, 10%% de, 10%% empty) —
    index-addressable so page ranges can be generated independently."""
    import hashlib

    h = hashlib.blake2b(f"lang-{seed}-{i}".encode(), digest_size=2).digest()[0] % 10
    return "en" if h < 8 else ("de" if h == 8 else "")


def page_rows(n: int, seed: int = 42, long_every: int = 200, hot_every: int = 17,
              start: int = 0):
    """Yield dict rows of the pages schema (FIXTURES.md §1) for indices
    [start, n) — pure function of the index, so ranges parallelize."""
    for i in range(start, n):
        if long_every and i % long_every == long_every - 1:
            text = long_document(i)
        else:
            text, _ = gold_case(i)
            if hot_every and i % hot_every == 0:
                hot = HOT_ENTITIES[i % len(HOT_ENTITIES)]
                text = text + f" The project at {hot} continued."
        url = f"https://fixtures.test/doc/{i:08d}"
        yield {
            "url": url,
            "warc_ts": 1704067200_000000 + i * 1_000_000,  # 2024-01-01 + i sec (us)
            "html": wrap_html(f"Doc {i}", text),
            "text": text,
            "lang": _lang_for(i, seed),
        }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def _write_pages_file(args) -> None:
    path, file_idx, start, stop, seed, long_every = args
    rows = list(page_rows(stop, seed=seed, long_every=long_every, start=start))
    table = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(path, f"pages-{file_idx:05d}.parquet"))


def write_pages(path: str, n: int, seed: int = 42, rows_per_file: int = 50_000,
                long_every: int = 200) -> str:
    """Write a deterministic pages Parquet dataset (multiple files so Ray
    can parallelize the read; files generated in parallel — rows are pure
    functions of their index).  Skips work if the dataset already exists
    with the same parameters."""
    marker = os.path.join(path, f".complete-{n}-{seed}-{long_every}-v2")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    for old in os.listdir(path):
        if old.endswith(".parquet") or old.startswith(".complete"):
            os.remove(os.path.join(path, old))
    jobs = []
    file_idx = 0
    for start in range(0, n, rows_per_file):
        jobs.append((path, file_idx, start, min(start + rows_per_file, n), seed, long_every))
        file_idx += 1
    if len(jobs) > 3:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=min(16, len(jobs))) as pool:
            list(pool.map(_write_pages_file, jobs, chunksize=1))
    else:
        for job in jobs:
            _write_pages_file(job)
    open(marker, "w").close()
    return path


def kb_records() -> list[dict]:
    """KB/alias table records covering the fixture grid (FIXTURES.md §4)."""
    from ..kernels.normalize import normalize_entity_name

    recs = []

    def add(label, types, extra_aliases=()):
        slug = normalize_entity_name(label).replace("_", "-")
        typo = label[:-1] if len(label) > 4 else label  # fuzzy JW>=0.8 path
        recs.append(
            {
                "uri": f"https://kb.test/resource/{slug}",
                "label": label,
                "aliases": [typo, *extra_aliases],
                "types": list(types),
            }
        )

    for i in range(len(FIRST_NAMES) * len(LAST_NAMES)):
        add(_name(i), ["Person"])
    for u in UNIVERSITIES:
        add(u, ["EducationalOrganization", "Organization"])
    for c in CITIES:
        add(c, ["Place"])
        add(f"{c} Airport", ["Airport", "Place"])
    for c in COUNTRIES_LIST:
        add(c, ["Country", "Place"])
    for c in COMPANIES:
        add(c, ["Organization"])
    for h in HOT_ENTITIES:
        add(h, ["Organization"])
    # ambiguous pair sharing a label: deterministic tie-break by uri asc
    recs.append({"uri": "https://kb.test/resource/apple-fruit", "label": "Apple",
                 "aliases": [], "types": ["Thing"]})
    recs.append({"uri": "https://kb.test/resource/apple-inc", "label": "Apple",
                 "aliases": ["Apple Inc"], "types": ["Organization"]})
    return recs


def write_kb(path: str) -> str:
    recs = kb_records()
    table = pa.table(
        {
            "uri": [r["uri"] for r in recs],
            "label": [r["label"] for r in recs],
            "aliases": pa.array([r["aliases"] for r in recs], pa.list_(pa.string())),
            "types": pa.array([r["types"] for r in recs], pa.list_(pa.string())),
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path)
    return path
