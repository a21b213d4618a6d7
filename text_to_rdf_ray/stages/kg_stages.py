"""Ray Data stages of the KG-construction pipeline.

Stage functions are Arrow-in/Arrow-out ``map_batches`` bodies; the linker
is an actor-pool class (state loaded once per actor).  All stages are pure
w.r.t. row content (deterministic under task retry, SURVEY.md §4.2).

Pipeline shape (pipelines/kg.py):
  read_parquet(pages, columns pruned)
  -> strip_html (drops the wide ``html`` column immediately)
  -> filter_lang
  -> extract_triples (per-document kernel; doc = row, chunk loop inside)
  -> LinkEntities actor pool (KB broadcast once via ray.put)
  -> validate
  -> canonicalize + global dedup (stages/canonicalize.py, shuffles)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.extractor import extract_document
from ..kernels.text import extract_text
from ..kernels.validation import DATE_PREDICATES

#: the relational row view custom ValidationRules are evaluated against in
#: ``validate_triples`` — a rule requiring any other property (e.g. a real
#: per-document entity property like 'birthDate') would silently fail
#: every matching triple, so the pipeline REJECTS such rules at build time
RELATIONAL_RULE_KEYS = frozenset({"@type", "name", "pred_key", "obj"})

TRIPLE_FIELDS = [
    ("url", pa.string()),
    ("subj", pa.string()),
    ("subj_slug", pa.string()),
    ("subj_lower", pa.string()),
    ("pred", pa.string()),
    ("pred_key", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("nested_in", pa.string()),
    ("chunk_id", pa.int32()),
    ("span_start", pa.int64()),
    ("span_end", pa.int64()),
    ("confidence", pa.float64()),
    ("method", pa.string()),
]
TRIPLE_SCHEMA = pa.schema(TRIPLE_FIELDS)


def strip_html(batch: pa.Table) -> pa.Table:
    """html -> text; drops the wide binary column so downstream blocks are
    text-only (SURVEY.md §4.2 'very wide rows')."""
    html_col = batch.column("html")
    texts = [extract_text(h.as_py()) if h.is_valid else "" for h in html_col]
    batch = batch.drop_columns(["html"])
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", pa.array(texts, pa.large_string()))


def make_lang_filter(lang: str = "en"):
    def filter_lang(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("lang"), lang))

    return filter_lang


def extract_triples(batch: pa.Table, extract_kwargs: dict | None = None) -> pa.Table:
    """Per-document extraction: one input page row -> N triple rows.

    The Python loop is over *documents* (each iteration runs the full
    chunk/coref/pattern kernel on one doc) — the vectorization unit is the
    document, mirroring the reference's doc-at-a-time semantics
    (/root/reference/src/extractor.rs:570-698) with provenance columns.
    ``extract_kwargs`` forwards runtime config (coref strategy, chunk
    sizing) to ``extract_document``."""
    import sys

    kw = extract_kwargs or {}
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    cols: dict[str, list] = {name: [] for name, _ in TRIPLE_FIELDS}
    for url, text in zip(urls, texts):
        if not text:
            continue
        try:
            ex = extract_document(text, **kw)
        except Exception as exc:  # lossy fault-tolerance (extractor.rs:689-692):
            # a pathological document is logged and skipped, the batch
            # (and pipeline) continues — mirrors the reference's
            # chunk-failure behavior; Ray task retry would re-raise
            # deterministically, so skipping is the only useful policy
            print(f"extract_triples: skipping {url}: {exc!r}", file=sys.stderr)
            continue
        for t in ex.triples:
            cols["url"].append(url)
            cols["subj"].append(t.subj)
            cols["subj_slug"].append(t.subj_slug)
            cols["subj_lower"].append(t.subj_lower)
            cols["pred"].append(t.pred)
            cols["pred_key"].append(t.pred_key)
            cols["obj"].append(t.obj)
            cols["subj_type"].append(t.subj_type)
            cols["obj_type"].append(t.obj_type)
            cols["nested_in"].append(t.nested_in)
            cols["chunk_id"].append(t.chunk_id)
            cols["span_start"].append(t.span_start)
            cols["span_end"].append(t.span_end)
            cols["confidence"].append(t.confidence)
            cols["method"].append(t.method)
    return pa.table({name: pa.array(cols[name], typ) for name, typ in TRIPLE_FIELDS})


def _link_batch(index, cache, batch: pa.Table) -> pa.Table:
    """Shared per-batch linking body (used by actor and task modes).
    ``cache`` is a TTLCache (1h expiry + bounded size — the reference's
    Spotlight-lookup cache shape, PHASE3_COMPLETION_REPORT.md:223-229)."""

    def lookup(name: str):
        hit = cache.get(name)
        if hit is None:
            linked = index.link(name)
            hit = (linked.uri, linked.confidence) if linked else (None, 0.0)
            cache[name] = hit
        return hit

    subj_uri, subj_conf, obj_uri, obj_conf = [], [], [], []
    subjs = batch.column("subj").to_pylist()
    objs = batch.column("obj").to_pylist()
    obj_types = batch.column("obj_type").to_pylist()
    for s, o, ot in zip(subjs, objs, obj_types):
        uri, conf = lookup(s)
        subj_uri.append(uri)
        subj_conf.append(conf)
        if ot:  # entity object
            uri, conf = lookup(o)
            obj_uri.append(uri)
            obj_conf.append(conf)
        else:
            obj_uri.append(None)
            obj_conf.append(0.0)
    return (
        batch.append_column("subj_uri", pa.array(subj_uri, pa.string()))
        .append_column("subj_link_conf", pa.array(subj_conf, pa.float64()))
        .append_column("obj_uri", pa.array(obj_uri, pa.string()))
        .append_column("obj_link_conf", pa.array(obj_conf, pa.float64()))
    )


class LinkEntities:
    """Actor-pool stage: link subj/obj surfaces to KB URIs.

    The KB index is built ONCE per actor in ``__init__`` from a broadcast
    object-store ref (``ray.put`` of the KB records on the driver) — the
    Ray-native replacement for the reference's per-process Oxigraph store
    (/root/reference/src/entity_linker.rs:133-151).  Per-batch work is a
    dict-cached lookup over the batch's distinct surfaces.

    Use this mode when the KB is heavy (GB-scale index / model): the pool
    bounds the number of index replicas.  NOTE: Ray Data fuses the upstream
    map chain into the actor pool, so the pool size caps the parallelism of
    everything fused with it — size ``concurrency`` accordingly, or use
    ``make_link_task`` (task mode, per-worker cached index) when the KB is
    cheap to replicate.
    """

    def __init__(self, kb_ref=None, kb_records=None, fuzzy_threshold=0.8,
                 confidence_threshold=0.5, disambiguator_factory=None):
        import ray

        from ..kernels.linker import KBIndex

        if kb_records is None:
            kb_records = ray.get(kb_ref)
        # disambiguator built ONCE per actor (where a real deployment opens
        # its LLM client — the entity_linker.rs:409-479 plug point)
        disambiguator = disambiguator_factory() if disambiguator_factory else None
        self.index = KBIndex(
            kb_records,
            fuzzy_threshold=fuzzy_threshold,
            confidence_threshold=confidence_threshold,
            disambiguator=disambiguator,
        )
        from ..functions.ttl_cache import TTLCache

        self.cache = TTLCache()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _link_batch(self.index, self.cache, batch)


# per-worker-process KB index cache for task-mode linking
_KB_INDEX_CACHE: dict[str, tuple] = {}


def make_link_task(kb_ref, fuzzy_threshold=0.8, confidence_threshold=0.5):
    """Task-mode linker: stateless map_batches function whose KB index is
    built lazily ONCE PER WORKER PROCESS (module-level cache keyed by the
    broadcast ref).  Keeps the map chain fully task-parallel — no actor
    pool to cap fused-stage parallelism — at the cost of one index replica
    per worker; right when the KB is small relative to worker heap."""
    base = kb_ref.hex() if hasattr(kb_ref, "hex") else str(kb_ref)
    key = f"{base}:{fuzzy_threshold}:{confidence_threshold}"

    def link_batch(batch: pa.Table) -> pa.Table:
        import ray

        from ..kernels.linker import KBIndex

        entry = _KB_INDEX_CACHE.get(key)
        if entry is None:
            from ..functions.ttl_cache import TTLCache

            index = KBIndex(ray.get(kb_ref), fuzzy_threshold=fuzzy_threshold,
                            confidence_threshold=confidence_threshold)
            entry = (index, TTLCache())
            _KB_INDEX_CACHE[key] = entry
        index, cache = entry
        return _link_batch(index, cache, batch)

    return link_batch


def link_entities_join(
    triples,
    kb_records,
    *,
    fuzzy_threshold: float = 0.8,
    confidence_threshold: float = 0.5,
    num_partitions: int = 16,
):
    """Shuffle-join linking — the at-scale form of J1/J2 for KBs too large
    to broadcast (``make_link_task``/``LinkEntities`` replicate the index
    per worker/actor; this path replicates NOTHING):

      distinct surfaces (groupby — small vs triples)
        exact:  hash join on lowercased label              [conf 0.95]
        fuzzy:  surfaces without an exact hit, candidates generated by
                MinHash band blocking (SURVEY.md J2): surfaces and KB
                labels explode to payload-free (band_id, band_hash, id64)
                rows; a hash join on the band key yields candidate
                (surface, label) pairs — sub-linear in |KB| per surface,
                unlike first-character blocks (~30 buckets, each ~|KB|/30).
                Candidates are then filtered by the in-memory index's
                EXACT blocking predicate (same first char + length window)
                and Jaro-Winkler scored, kept >= fuzzy_threshold.
        top-1 per surface by (conf desc, uri asc)          [KBIndex.link]
      surface->uri map hash-joined back onto subj and entity-obj columns.

    Output columns and values equal the broadcast paths exactly on every
    pair the band blocking surfaces (parity-tested).  Recall note: a
    JW-similar pair whose character-shingle Jaccard is very low can be
    missed by the bands (21 bands x 3 rows: >=99.8% at Jaccard 0.64, the
    one-char-edit regime; real surface variants share most shingles);
    the broadcast modes remain the exhaustive-within-block reference.
    """
    import ray.data as rd

    from ..kernels.linker import EXACT_CONFIDENCE, jaro_winkler_batch
    from .canonicalize import _solid
    from .exchange import exchange_join, join_out_schema

    if not isinstance(kb_records, rd.Dataset):
        kb_ds = rd.from_items(list(kb_records))
    else:
        kb_ds = kb_records

    # static schemas for every exchange_join below: chained lazy joins
    # fuse into one executor plan ONLY when the planner never has to run
    # a schema probe (exchange.py docstring)
    _S_LABELS = pa.schema([("kb_uri", pa.string()), ("kb_label", pa.string()),
                           ("kb_low", pa.string()), ("lid", pa.int64())])
    _S_SURF = pa.schema([("surface", pa.string()), ("low", pa.string()),
                         ("sid", pa.int64())])
    _S_EXACT_PROJ = pa.schema([("low", pa.string()), ("kb_uri", pa.string())])
    _S_BAND_S = pa.schema([("band_id", pa.int32()), ("band_hash", pa.int64()),
                           ("sid", pa.int64())])
    _S_BAND_L = pa.schema([("band_id", pa.int32()), ("band_hash", pa.int64()),
                           ("lid", pa.int64())])
    _S_CAND = pa.schema([("sid", pa.int64()), ("lid", pa.int64())])

    import hashlib as _hl

    def _id64(key: str) -> int:
        return int.from_bytes(
            _hl.blake2b(key.encode(), digest_size=8).digest(), "little"
        ) >> 1

    # lid/sid 64-bit row ids ride along from the FIRST pass (one shared
    # materialization instead of separate *_with_id re-maps — every
    # materialize is a full executor run, and this operator's cost at
    # small scale is almost entirely such fixed barriers)
    def kb_labels(batch: pa.Table) -> pa.Table:
        uris, labels, lows, lids = [], [], [], []
        for row in batch.to_pylist():
            for lab in [row["label"], *(row.get("aliases") or ())]:
                low = lab.lower()
                uris.append(row["uri"])
                labels.append(lab)
                lows.append(low)
                # must match _band_rows' row key "\x00".join([low, uri])
                lids.append(_id64(f"{low}\x00{row['uri']}"))
        return pa.table(
            {
                "kb_uri": pa.array(uris, pa.string()),
                "kb_label": pa.array(labels, pa.string()),
                "kb_low": pa.array(lows, pa.string()),
                "lid": pa.array(lids, pa.int64()),
            }
        )

    # batch_size=2048 coalesces the KB into ~|KB|/2048 blocks: enough
    # parallelism for the per-label MinHash in _band_rows (one giant block
    # would serialize it), few enough that the downstream sort-based
    # groupby exchanges stay cheap (Ray's sort cost grows with BLOCK
    # count: measured 0.3s at 16 blocks vs 3.2s at 232 for the same rows)
    labels_ds = _solid(
        kb_ds.map_batches(kb_labels, batch_format="pyarrow",
                          batch_size=2048))

    def surface_rows(batch: pa.Table) -> pa.Table:
        subs = batch.column("subj").to_pylist()
        objs = batch.column("obj").to_pylist()
        ots = batch.column("obj_type").to_pylist()
        names = {s for s in subs if s}
        names |= {o for o, ot in zip(objs, ots) if ot and o}
        names = sorted(names)
        lows = [n.lower() for n in names]
        sids = [_id64(low) for low in lows]
        return pa.table(
            {
                "surface": pa.array(names, pa.string()),
                "low": pa.array(lows, pa.string()),
                # sid keys the LOWERCASED form (same as the band row key):
                # case-variant surfaces share a sid and re-attach together
                "sid": pa.array(sids, pa.int64()),
                # partition key for the distinct exchange below: equal
                # surfaces share a sid, so they land in one partition
                "_part": pa.array(
                    np.asarray(sids, np.uint64) % np.uint64(64), pa.int32()),
            }
        )

    # distinct surfaces via hash exchange + per-PARTITION vectorized
    # drop_duplicates — NOT groupby("surface").map_groups (one Python
    # call per distinct surface: the measured Ray-2.49 per-key pathology,
    # 153s vs <2s at 48k keys — NOTES_r3.md).  LAZY: since the exact
    # join and anti-join merged into one left_outer exchange, `surfaces`
    # has exactly one consumer (`matched`), so the distinct fuses into
    # that plan instead of paying its own materialization barrier.
    triples_solid = _solid(triples)
    surfaces = (
        triples_solid.map_batches(surface_rows, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(lambda g: g.drop_duplicates("surface"),
                    batch_format="pandas")
        .map_batches(
            lambda t: pa.table({n: t.column(n) for n in ("surface", "low", "sid")}),
            batch_format="pyarrow",
        )
    )

    _LINK_SCHEMA = pa.schema([("surface", pa.string()), ("uri", pa.string()),
                              ("conf", pa.float64())])

    # ONE left_outer exchange splits the surfaces: matched rows ARE the
    # exact links (duplicated per matching label, same as the old inner
    # join), unmatched rows ARE the fuzzy side — the separate exact-hit
    # projection + anti-join exchange is gone (one fewer shuffle of the
    # surface table and one fewer materialization barrier)
    matched = _solid(
        exchange_join(
            surfaces,
            labels_ds.map_batches(
                lambda t: pa.table({"low": t.column("kb_low"),
                                    "kb_uri": t.column("kb_uri")}),
                batch_format="pyarrow",
            ),
            on="low", how="left_outer", num_partitions=num_partitions,
            left_schema=_S_SURF, right_schema=_S_EXACT_PROJ,
        )
    )

    exact = matched.map_batches(
        lambda t: (lambda f: pa.table(
            {
                "surface": f.column("surface"),
                "uri": f.column("kb_uri"),
                "conf": pa.array([EXACT_CONFIDENCE] * len(f), pa.float64()),
            }
        ))(t.filter(pc.is_valid(t.column("kb_uri")))),
        batch_format="pyarrow",
    )

    # a surface with ANY match contributes no unmatched row, so the null
    # filter is exactly the anti-join (one row per unmatched surface —
    # surfaces are distinct)
    no_exact = _solid(
        matched.map_batches(
            lambda t: (lambda f: pa.table(
                {"surface": f.column("surface"), "low": f.column("low"),
                 "sid": f.column("sid")}
            ))(t.filter(pc.is_null(t.column("kb_uri")))),
            batch_format="pyarrow",
        )
    )

    def fuzzy_score(batch: pa.Table) -> pa.Table:
        from ..state.counters import incr

        surfs = batch.column("surface").to_pylist()
        lows = batch.column("low").to_pylist()
        labs = batch.column("kb_label").to_pylist()
        uris = batch.column("kb_uri").to_pylist()
        # observable blocking volume: JW runs on exactly this many
        # band-blocked candidates (vs |no_exact| x |KB|/~30 under
        # first-char blocking)
        incr({"linkjoin_fuzzy_candidates": len(surfs)})
        lab_lows = [lab.lower() for lab in labs]
        # KBIndex.candidates blocking parity (linker.py), vectorized:
        # same first char (by_first bucket membership) + length window;
        # the substring escape hatch is interpreted ONLY on the (rare)
        # pairs that fail the window — not per candidate
        n = len(lows)
        l_low = np.fromiter((len(x) for x in lows), np.int64, n)
        l_lab = np.fromiter((len(x) for x in lab_lows), np.int64, n)
        first_ok = np.fromiter(
            (a[:1] == b[:1] for a, b in zip(lab_lows, lows)), bool, n)
        win_bad = np.abs(l_lab - l_low) > np.maximum(
            3, (0.6 * l_low).astype(np.int64))
        keep = first_ok.copy()
        for i in np.flatnonzero(first_ok & win_bad):
            if lows[i] not in lab_lows[i]:
                keep[i] = False
        idx = np.flatnonzero(keep)
        sims = jaro_winkler_batch([lab_lows[i] for i in idx],
                                  [lows[i] for i in idx])
        good = idx[sims >= fuzzy_threshold]
        good_sims = sims[sims >= fuzzy_threshold]
        return pa.table(
            {"surface": pa.array([surfs[i] for i in good], pa.string()),
             "uri": pa.array([uris[i] for i in good], pa.string()),
             "conf": pa.array(good_sims, pa.float64())}
        )

    def _band_rows(src: "rd.Dataset", text_col: str, out_id: str,
                   keep_cols: tuple = ()) -> "rd.Dataset":
        """Explode lowercased strings to (band_id, band_hash, id64) rows —
        the ONLY columns the blocking exchange moves (payload-free, the
        dedup.py band-exchange pattern).  id64 = blake2b64(row key)."""
        import hashlib as _hl

        from ..kernels.minhash import char_shingles, minhash_signatures

        def explode(batch: pa.Table) -> pa.Table:
            import numpy as _np

            from ..kernels.minhash import band_keys_batch

            lows = batch.column(text_col).to_pylist()
            extra = [batch.column(c).to_pylist() for c in keep_cols]
            row_keys = [
                "\x00".join([low, *[e[i] for e in extra]])
                for i, low in enumerate(lows)
            ]
            # 21 bands x 3 rows: >=99.8% band recall at shingle-Jaccard
            # 0.64 (a one-char edit on a short name) while filtering
            # syllable-sharing non-matches ~4x harder than 2-row bands
            sigs = minhash_signatures(
                [char_shingles(low) for low in lows], num_perm=63
            )
            keys = band_keys_batch(sigs, 21)  # (n, 21) int64, one numpy pass
            rids = _np.array(
                [
                    int.from_bytes(
                        _hl.blake2b(rk.encode(), digest_size=8).digest(), "little"
                    ) >> 1
                    for rk in row_keys
                ],
                dtype=_np.int64,
            )
            n, nb = keys.shape
            return pa.table(
                {
                    "band_id": pa.array(
                        _np.tile(_np.arange(nb, dtype=_np.int32), n), pa.int32()),
                    "band_hash": pa.array(keys.ravel(), pa.int64()),
                    out_id: pa.array(_np.repeat(rids, nb), pa.int64()),
                }
            )

        # lazy over a materialized parent: the explode output always has a
        # schema (typed empty tables included), so the band join consumes
        # it directly — no extra materialization barrier per side
        return src.map_batches(explode, batch_format="pyarrow")

    if no_exact.count() == 0:
        # every surface had an exact hit: nothing to band-explode
        fuzzy = rd.from_arrow(_LINK_SCHEMA.empty_table())
    else:
        # lid/sid already ride on labels_ds / no_exact (hashed in the
        # first-pass maps above); the band join moves only ids, strings
        # re-attach via exchange joins on the tiny candidate set.  The
        # WHOLE fuzzy chain — band join, global pair dedup, two re-attach
        # joins, scoring — is lazy and fuses into the single links
        # executor run below (exchange joins are plain tasks: no
        # JoinOperator actor-pool spin-up per plan, measured 1.5-1.9s
        # fixed -> ~0.4s each).
        surf_bands = _band_rows(
            no_exact.map_batches(
                lambda t: pa.table({"low": t.column("low")}),
                batch_format="pyarrow"), "low", "sid")
        # label id must hash (low, uri) exactly like kb_labels' lid: rebuild
        # the same row key by keeping uri alongside
        label_bands = _band_rows(
            labels_ds.map_batches(
                lambda t: pa.table({"kb_low": t.column("kb_low"),
                                    "kb_uri": t.column("kb_uri")}),
                batch_format="pyarrow"), "kb_low", "lid", keep_cols=("kb_uri",))

        def cand_part(t: pa.Table) -> pa.Table:
            # batch-local dedup (combiner) + a single int partition key for
            # the global pair dedup — NEVER a per-pair map_groups (hundreds
            # of thousands of one-row python groups)
            g = pa.table({"sid": t.column("sid"), "lid": t.column("lid")})
            g = g.group_by(["sid", "lid"]).aggregate([])
            s = g.column("sid").to_numpy(zero_copy_only=False).astype(np.uint64)
            l_ = g.column("lid").to_numpy(zero_copy_only=False).astype(np.uint64)
            pp = ((s * np.uint64(0x9E3779B97F4A7C15)) ^ l_) % np.uint64(64)
            return g.append_column("ppart", pa.array(pp.astype(np.int32), pa.int32()))

        cand_ids = (
            exchange_join(
                surf_bands, label_bands, on=("band_id", "band_hash"),
                num_partitions=num_partitions,
                left_schema=_S_BAND_S, right_schema=_S_BAND_L,
            ).map_batches(cand_part, batch_format="pyarrow", batch_size=65536)
            .groupby("ppart")
            .map_groups(
                lambda g: g.drop_duplicates(["sid", "lid"])[["sid", "lid"]],
                batch_format="pandas",
            )
            .map_batches(
                lambda t: pa.table({"sid": t.column("sid"),
                                    "lid": t.column("lid")}),
                batch_format="pyarrow",
            )
        )
        with_surface = exchange_join(
            cand_ids, no_exact, on="sid", num_partitions=num_partitions,
            left_schema=_S_CAND, right_schema=_S_SURF,
        )
        fuzzy = (
            exchange_join(
                with_surface, labels_ds, on="lid",
                num_partitions=num_partitions,
                left_schema=join_out_schema(_S_CAND, _S_SURF, "sid"),
                right_schema=_S_LABELS,
            )
            .map_batches(fuzzy_score, batch_format="pyarrow")
        )

    def top1_vec(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic top-1 per surface (conf desc, uri asc), vectorized
        # across ALL surfaces in the frame: after the sort the first row of
        # each surface IS its max-conf / smallest-uri candidate (alias
        # duplicates of one uri can never occupy the first slot ahead of
        # it) — KBIndex.link parity without one Python call per surface
        g = g[g["conf"] >= confidence_threshold]
        if not len(g):
            return g[["surface", "uri", "conf"]]
        g = g.sort_values(["surface", "conf", "uri"],
                          ascending=[True, False, True])
        return g.drop_duplicates("surface", keep="first")[
            ["surface", "uri", "conf"]]

    def top1_combine(b: pd.DataFrame) -> pd.DataFrame:
        # batch-local top-1 is a safe combiner: the global top-1 under the
        # (conf desc, uri asc) total order is the max of batch maxima
        from ..kernels.minhash import _hash_shingles

        b = top1_vec(b)
        part = (_hash_shingles(b["surface"].tolist())
                % np.uint64(64)).astype(np.int32)
        return b.assign(_part=part)

    links = _solid(
        exact.union(fuzzy)
        .map_batches(top1_combine, batch_format="pandas", batch_size=65536)
        .groupby("_part")
        .map_groups(lambda g: top1_vec(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .map_batches(
            lambda t: pa.table({n: t.column(n) for n in ("surface", "uri", "conf")}),
            batch_format="pyarrow",
        )
    )

    def rename_links(key: str, ucol: str, ccol: str) -> "rd.Dataset":
        # lazy rename over the materialized links — the join right side
        # consumes it directly (barrier-free; output schema is always typed)
        return links.map_batches(
            lambda t, key=key, ucol=ucol, ccol=ccol: pa.table(
                {key: t.column("surface"), ucol: t.column("uri"),
                 ccol: t.column("conf")}
            ),
            batch_format="pyarrow",
        )

    # both link-attach joins fuse into the caller's one consuming plan:
    # schemas are static, so no probe executions and no barrier between
    ts = triples_solid.schema()
    _S_TRIPLES = pa.schema(list(zip(ts.names, ts.types)))
    _S_LINK_SUBJ = pa.schema([("subj", pa.string()),
                              ("subj_uri", pa.string()),
                              ("subj_link_conf", pa.float64())])
    _S_LINK_OBJ = pa.schema([("obj", pa.string()),
                             ("obj_uri_j", pa.string()),
                             ("obj_link_conf_j", pa.float64())])
    out = exchange_join(
        exchange_join(
            triples_solid,
            rename_links("subj", "subj_uri", "subj_link_conf"),
            on="subj", how="left_outer", num_partitions=num_partitions,
            left_schema=_S_TRIPLES, right_schema=_S_LINK_SUBJ,
        ),
        rename_links("obj", "obj_uri_j", "obj_link_conf_j"),
        on="obj", how="left_outer", num_partitions=num_partitions,
        left_schema=join_out_schema(_S_TRIPLES, _S_LINK_SUBJ, "subj"),
        right_schema=_S_LINK_OBJ,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = len(batch)
        is_ent = pc.invert(pc.equal(batch.column("obj_type"), ""))
        obj_uri = pc.if_else(is_ent, batch.column("obj_uri_j"),
                             pa.array([None] * n, pa.string()))
        obj_conf = pc.if_else(
            pc.and_(is_ent, pc.is_valid(batch.column("obj_link_conf_j"))),
            batch.column("obj_link_conf_j"), pa.scalar(0.0),
        )
        subj_conf = pc.fill_null(batch.column("subj_link_conf"), 0.0)
        cols = {
            name: batch.column(name)
            for name in batch.column_names
            if name not in ("obj_uri_j", "obj_link_conf_j", "subj_link_conf")
        }
        cols["subj_link_conf"] = subj_conf
        cols["obj_uri"] = obj_uri
        cols["obj_link_conf"] = obj_conf
        order = [f[0] for f in TRIPLE_FIELDS] + [
            "subj_uri", "subj_link_conf", "obj_uri", "obj_link_conf"
        ]
        return pa.table({name: cols[name] for name in order})

    return out.map_batches(finalize, batch_format="pyarrow")


def validate_triples(batch: pa.Table, rules=()) -> pa.Table:
    """Vectorized relational validation (validation.rs:120-160 + 183-298):

    - Person/Organization/Place/Event require ``name``: in the relational
      model the subject surface IS the node's name, so an empty subj (or an
      empty entity-typed obj) of a name-required type is an Error, -0.2;
    - -0.05 malformed date literal on date predicates (Warning);
    - -0.1 malformed URI-shaped literal object (Warning);
    - confidence clamped to [0,1];
    - valid = NO Error-severity violation AND confidence >= 0.7
      (validation.rs:296-298 semantics — an Error invalidates regardless
      of the clamped score).

    ``rules``: registered ``functions.registry.ValidationRule`` objects
    (add_rule), captured at pipeline build time and shipped to workers;
    each is evaluated per matching row on the relational row view
    ``{"@type": subj_type, "name": subj, "pred_key": ..., "obj": ...}``.
    """
    from ..kernels.validation import _NAME_REQUIRED_TYPES

    n = len(batch)
    conf = np.ones(n)
    subj = batch.column("subj")
    subj_type = batch.column("subj_type")
    obj = batch.column("obj")
    obj_type = batch.column("obj_type")
    pred_key = batch.column("pred_key")

    req = pa.array(sorted(_NAME_REQUIRED_TYPES), pa.string())

    def b(arr) -> np.ndarray:
        return arr.to_numpy(zero_copy_only=False).astype(bool)

    subj_missing = b(pc.and_(pc.equal(subj, ""), pc.is_in(subj_type, value_set=req)))
    obj_missing = b(
        pc.and_(pc.is_in(obj_type, value_set=req), pc.equal(obj, ""))
    )
    conf -= 0.2 * subj_missing
    conf -= 0.2 * obj_missing
    error_hit = subj_missing | obj_missing

    is_literal = b(pc.equal(obj_type, ""))
    date_pred = b(pc.is_in(pred_key, value_set=pa.array(sorted(DATE_PREDICATES))))
    ln = pc.utf8_length(obj).to_numpy(zero_copy_only=False)
    c4 = pc.utf8_slice_codeunits(obj, 4, 5).to_numpy(zero_copy_only=False)
    c7 = pc.utf8_slice_codeunits(obj, 7, 8).to_numpy(zero_copy_only=False)
    date_ok = (ln == 10) & (c4 == "-") & (c7 == "-")
    bad_date = is_literal & date_pred & ~date_ok
    conf -= 0.05 * bad_date

    starts_http = b(pc.starts_with(obj, "http"))
    has_scheme = b(pc.match_substring(obj, "://"))
    bad_uri = is_literal & starts_http & ~has_scheme & ~bad_date
    conf -= 0.1 * bad_uri

    if rules:
        subj_l = subj.to_pylist()
        st_l = subj_type.to_pylist()
        pk_l = pred_key.to_pylist()
        obj_l = obj.to_pylist()
        for i in range(n):
            row = {"@type": st_l[i], "name": subj_l[i], "pred_key": pk_l[i],
                   "obj": obj_l[i]}
            for rule in rules:
                if rule.entity_type is not None and rule.entity_type != st_l[i]:
                    continue
                failed = any(not row.get(p) for p in rule.required_properties)
                if rule.check_fn is not None and not rule.check_fn(row):
                    failed = True
                if failed:
                    conf[i] += rule.confidence_impact
                    if rule.severity == "Error":
                        error_hit[i] = True

    conf = np.clip(conf, 0.0, 1.0)
    batch = batch.drop_columns(["confidence"])
    batch = batch.append_column("confidence", pa.array(conf, pa.float64()))
    return batch.append_column(
        "valid", pa.array((conf >= 0.7) & ~error_hit, pa.bool_())
    )
