"""Distributed text retrieval over a document corpus.

BM25 ranking (Robertson-Sparck Jones probabilistic idf in the Lucene
``ln(1 + (N - df + 0.5)/(df + 0.5))`` form, which is always positive) as
a two-pass Ray Data composition:

1. **Bounded statistics pass** — document frequency restricted to the
   QUERY vocabulary (never the corpus vocabulary), plus corpus N and
   total token length, via per-batch ``Counter`` partials -> one
   term-keyed ``exchange_agg`` sum -> a driver collect bounded by
   ``len(query_terms) + 1`` rows regardless of corpus size.
2. **Pure-map scoring pass** — the per-term idf table, avgdl and the
   query list are broadcast once via ``ray.put`` (cached per worker
   process); each batch tokenizes its documents, keeps only query-term
   tf counts, and emits ``(query_id, doc_id, score)`` rows for docs
   matching >= 1 term.  No shuffle ever touches the corpus text.
3. **Top-k funnel** — ``topk_per_group`` on ``query_id`` (batch-local
   top-k combiner before a 64-way hash exchange), so at most
   ``batches x queries x k`` rows move.

Scores are rounded to 6 decimals BEFORE ranking and tie-broken on
``doc_id`` ascending, making the ranking deterministic and replayable in
SQL (the final sum's addend order differs between engines; rounding
absorbs the <=1e-15 reassociation noise).

The reference engine has no retrieval surface; this operator belongs to
the large-scale training-data family (retrieval-based data selection /
decontamination against a query set).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .curation import _terms


def bm25_topk(
    ds: rd.Dataset,
    queries: dict[str, list[str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    num_partitions: int = 64,
) -> rd.Dataset:
    """Top-``k`` documents per query under BM25.

    ``queries`` maps query_id -> list of (already lowercased) terms.
    Returns ``(query_id, doc_id, score, rank)`` with ``rank`` 1-based
    per query under (score desc, doc_id asc); ``score`` rounded to 6
    decimals (the ranking key — see module docstring).
    """
    from .analytics import topk_per_group
    from .exchange import exchange_agg

    qset = frozenset(t for ts in queries.values() for t in ts)
    if not qset:
        raise ValueError("bm25_topk: queries contain no terms")

    # ---- pass 1: df over the query vocabulary + corpus N / total dl.
    # The sentinel term "" carries (n_docs, sum_dl); real terms carry df.
    def stats(batch: pa.Table) -> pa.Table:
        dfc: Counter = Counter()
        n = 0
        sdl = 0
        for txt in batch.column(text_col).to_pylist():
            toks = _terms(txt or "")
            n += 1
            sdl += len(toks)
            dfc.update(qset.intersection(toks))
        terms = [""] + sorted(dfc)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "df": pa.array([0] + [dfc[t] for t in terms[1:]], pa.int64()),
            "n_docs": pa.array([n] + [0] * (len(terms) - 1), pa.int64()),
            "sum_dl": pa.array([sdl] + [0] * (len(terms) - 1), pa.int64()),
        })

    agg = exchange_agg(
        ds.map_batches(stats, batch_format="pyarrow"),
        "term",
        [("df", "sum", "df"), ("n_docs", "sum", "n_docs"),
         ("sum_dl", "sum", "sum_dl")],
        num_partitions=min(num_partitions, 16),
    ).to_pandas()  # bounded: <= len(qset) + 1 rows BY CONSTRUCTION

    sent = agg[agg["term"] == ""]
    n_docs = int(sent["n_docs"].sum())
    sum_dl = int(sent["sum_dl"].sum())
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = sum_dl / n_docs
    idf = {
        t: math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))
        for t, d in zip(agg["term"], agg["df"]) if t
    }
    qlist = sorted((qid, sorted(set(ts))) for qid, ts in queries.items())
    bcast = ray.put((qlist, idf, avgdl))
    cache: dict = {}

    # ---- pass 2: pure map — score every doc against every query.
    def score(batch: pa.Table) -> pa.Table:
        st = cache.get("s")
        if st is None:
            st = cache["s"] = ray.get(bcast)
        ql, idfm, adl = st
        out_q: list[str] = []
        out_d: list[int] = []
        out_s: list[float] = []
        ids = batch.column(id_col).to_pylist()
        for did, txt in zip(ids, batch.column(text_col).to_pylist()):
            toks = _terms(txt or "")
            dl = len(toks)
            tf = Counter(t for t in toks if t in idfm)
            if not tf:
                continue
            norm = k1 * (1.0 - b + b * dl / adl)
            for qid, terms in ql:
                s = 0.0
                hit = False
                for t in terms:
                    f = tf.get(t, 0)
                    if f:
                        hit = True
                        s += idfm[t] * f * (k1 + 1.0) / (f + norm)
                if hit:
                    out_q.append(qid)
                    out_d.append(did)
                    out_s.append(round(s, 6))
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    scored = ds.map_batches(score, batch_format="pyarrow")
    return topk_per_group(scored, key_col="query_id", sort_col="score",
                          tiebreak_col="doc_id", k=k, descending=True)


def bm25_topk_join(
    ds: rd.Dataset,
    query_terms: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    num_partitions: int = 64,
) -> rd.Dataset:
    """BM25 top-k for the MANY-queries regime: ``query_terms`` is a
    Dataset of ``(query_id, term)`` rows (tens of thousands of queries —
    too many to loop per document the way ``bm25_topk`` does).

    Join shape, mirroring the repo's broadcast-vs-join duality
    (``link_mode="join"``, ``semi_join_filter`` vs ``exchange_join``):

    1. The query-term table's distinct terms are collected (bounded by
       the query vocabulary — raises above 1M terms) and broadcast as a
       filter set, so the doc explode emits ``(term, doc_id, tf, dl)``
       rows for QUERY terms only — candidate-proportional, never the
       full posting volume.
    2. df per term + corpus N/avgdl from the same pruned explode
       (plus a sentinel row for totals), one term-keyed exchange.
    3. ONE term-keyed ``exchange_join`` of the pruned doc rows against
       the query rows (idf attached to the term first), then a
       per-(query, doc) score sum via packed-key ``exchange_agg`` and
       the ``topk_per_group`` funnel.

    Produces the SAME ranking contract as ``bm25_topk`` (scores rounded
    to 6dp before ranking, doc_id tiebreak) — parity-tested.
    """
    from .analytics import topk_per_group
    from .exchange import exchange_agg, exchange_join

    qt = query_terms
    qdf = qt.to_pandas()
    if len(qdf) > 1_000_000:
        raise ValueError("bm25_topk_join: query-term table too large to "
                         "broadcast; shard the query set")
    qset = frozenset(qdf["term"])
    qref = ray.put(qset)
    cache: dict = {}

    def explode(batch: pa.Table) -> pa.Table:
        qs = cache.get("q")
        if qs is None:
            qs = cache["q"] = ray.get(qref)
        terms_out: list[str] = []
        docs_out: list[int] = []
        tf_out: list[int] = []
        dl_out: list[int] = []
        n = 0
        sdl = 0
        ids = batch.column(id_col).to_pylist()
        for did, txt in zip(ids, batch.column(text_col).to_pylist()):
            toks = _terms(txt or "")
            n += 1
            sdl += len(toks)
            tf = Counter(t for t in toks if t in qs)
            for t, f in tf.items():
                terms_out.append(t)
                docs_out.append(did)
                tf_out.append(f)
                dl_out.append(len(toks))
        # sentinel row carries (n_docs, sum_dl) for N / avgdl
        terms_out.append("")
        docs_out.append(-1)
        tf_out.append(n)
        dl_out.append(sdl)
        return pa.table({
            "term": pa.array(terms_out, pa.string()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "tf": pa.array(tf_out, pa.int64()),
            "dl": pa.array(dl_out, pa.int64()),
        })

    pruned = ds.map_batches(explode, batch_format="pyarrow").materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        t = batch.column("term").to_pylist()
        mask = np.array([x == "" for x in t])
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        dl = batch.column("dl").to_numpy(zero_copy_only=False)
        terms = [x for x, m in zip(t, mask) if not m] + [""]
        dfs = [1] * (len(terms) - 1) + [0]
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "df": pa.array(dfs, pa.int64()),
            "n_docs": pa.array([0] * (len(terms) - 1)
                               + [int(tf[mask].sum())], pa.int64()),
            "sum_dl": pa.array([0] * (len(terms) - 1)
                               + [int(dl[mask].sum())], pa.int64()),
        })

    agg = exchange_agg(
        pruned.map_batches(df_partial, batch_format="pyarrow"),
        "term",
        [("df", "sum", "df"), ("n_docs", "sum", "n_docs"),
         ("sum_dl", "sum", "sum_dl")],
        num_partitions=min(num_partitions, 16)).to_pandas()
    sent = agg[agg["term"] == ""]
    n_docs = int(sent["n_docs"].sum())
    sum_dl = int(sent["sum_dl"].sum())
    if n_docs == 0:
        raise ValueError("bm25_topk_join: empty corpus")
    avgdl = sum_dl / n_docs
    dfm = {t: int(d) for t, d in zip(agg["term"], agg["df"]) if t}

    # attach idf to each query row (small side, driver compute)
    qdf = qdf.copy()
    qdf["idf"] = [
        math.log(1.0 + (n_docs - dfm.get(t, 0) + 0.5)
                 / (dfm.get(t, 0) + 0.5))
        for t in qdf["term"]]
    qds = rd.from_pandas(qdf[["query_id", "term", "idf"]])

    def drop_sentinel(batch: pa.Table) -> pa.Table:
        t = batch.column("term").to_pylist()
        return batch.filter(pa.array([x != "" for x in t]))

    docs_side = pruned.map_batches(drop_sentinel, batch_format="pyarrow")
    joined = exchange_join(
        docs_side, qds, on="term", how="inner",
        num_partitions=num_partitions,
        left_schema=pa.schema([("term", pa.string()),
                               ("doc_id", pa.int64()),
                               ("tf", pa.int64()), ("dl", pa.int64())]),
        right_schema=pa.schema([("term", pa.string()),
                                ("query_id", pa.string()),
                                ("idf", pa.float64())]))

    def contrib(batch: pd.DataFrame) -> pd.DataFrame:
        tf = batch["tf"].to_numpy(np.float64)
        dl = batch["dl"].to_numpy(np.float64)
        c = (batch["idf"].to_numpy()
             * tf * (k1 + 1.0)
             / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        return pd.DataFrame({"query_id": batch["query_id"],
                             "doc_id": batch["doc_id"], "c": c})

    contribs = joined.map_batches(contrib, batch_format="pandas")
    summed = exchange_agg(contribs, ["query_id", "doc_id"],
                          [("c", "sum", "score")],
                          num_partitions=num_partitions)

    def rnd(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(score=batch["score"].round(6))

    return topk_per_group(summed.map_batches(rnd, batch_format="pandas"),
                          key_col="query_id", sort_col="score",
                          tiebreak_col="doc_id", k=k, descending=True)


def phrase_search(
    ds: rd.Dataset,
    phrase: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> rd.Dataset:
    """Exact phrase match via positional postings — ``(id, start_pos)``
    for every occurrence of the consecutive token sequence ``phrase``
    (tokens = the corpus-wide ``_terms`` convention).

    The slot-count trick turns the classic k-way positional-postings
    join into ONE exchange: a token matching phrase slot ``s`` at
    position ``p`` emits candidate start ``p - s``; a start position is
    a real match iff ALL k slots emitted it, i.e. its count equals k
    (each slot can emit a given (doc, start) at most once, so no
    HAVING-overcount even with repeated phrase words).  Shuffle volume
    is Σ tf(phrase term) candidate rows — the non-phrase vocabulary
    never leaves the scan, and there are no joins at all.
    """
    from .curation import _terms
    from .exchange import exchange_agg

    if not phrase:
        raise ValueError("phrase_search: empty phrase")
    k = len(phrase)
    slots: dict[str, list[int]] = {}
    for i, t in enumerate(phrase):
        slots.setdefault(t, []).append(i)

    def explode(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        toks = [_terms(t or "")
                for t in batch.column(text_col).to_pylist()]
        lens = np.array([len(t) for t in toks], dtype=np.int64)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        seg_id = np.repeat(ids, lens)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs, lens)
        out_id, out_base = [], []
        for term, slot_list in slots.items():
            m = flat == term
            for slot in slot_list:
                base = pos[m] - slot
                ok = base >= 0
                out_id.append(seg_id[m][ok])
                out_base.append(base[ok])
        return pd.DataFrame({
            id_col: np.concatenate(out_id) if out_id else
            np.array([], dtype=np.int64),
            "start_pos": np.concatenate(out_base) if out_base else
            np.array([], dtype=np.int64)})

    cand = ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=4096)
    counted = exchange_agg(cand, [id_col, "start_pos"],
                           [("start_pos", "count", "n_slots")],
                           num_partitions=num_partitions)
    return counted.map_batches(
        lambda t: t.filter(pc.equal(t.column("n_slots"),
                                    pa.scalar(k, pa.int64())))
        .drop_columns(["n_slots"]),
        batch_format="pyarrow")


def rerank_by_embedding(
    candidates: "pd.DataFrame",
    embeddings: rd.Dataset,
    *,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
) -> "pd.DataFrame":
    """Second-stage retrieval: rerank per-query BM25 candidates by
    cosine similarity to the query's rank-1 candidate's embedding
    (query-by-example semantics — the standard lexical-recall →
    semantic-precision hybrid).  ``candidates`` is a BOUNDED
    (n_queries × k_candidates) driver table by construction (the
    bm25_topk funnel output), so reranking is driver math; the only
    distributed work is fetching candidate vectors — a broadcast-set
    pure-map filter over the embedding table, no shuffle.

    Cosines are computed in float64 and rounded to 6dp BEFORE ranking
    (the bm25_topk convention) so the order is engine-independent.
    Output: (query_id, doc_id, cos, rerank) — top-``k`` per query by
    (cos desc, doc_id asc).
    """
    import ray

    need = set(candidates[id_col].astype(int).tolist())
    need_ref = ray.put(need)
    cache: dict = {}

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column(vec_id_col).to_numpy(zero_copy_only=False)
        nd = cache.get("n")
        if nd is None:
            nd = cache["n"] = ray.get(need_ref)
        mask = np.fromiter((int(i) in nd for i in ids), bool, len(ids))
        return batch.filter(pa.array(mask))

    vec_rows = embeddings.map_batches(
        pick, batch_format="pyarrow").to_pandas()
    vecs = {int(r): np.asarray(v, np.float64)
            for r, v in zip(vec_rows[vec_id_col], vec_rows[emb_col])}

    out = []
    for qid, grp in candidates.groupby("query_id", sort=True):
        grp = grp.sort_values("rank")
        ref_id = int(grp.iloc[0][id_col])
        ref = vecs.get(ref_id)
        if ref is None:
            continue
        rn = np.sqrt((ref * ref).sum())
        rows = []
        for did in grp[id_col].astype(int):
            v = vecs.get(did)
            if v is None:
                continue
            cos = float((ref * v).sum()
                        / (rn * np.sqrt((v * v).sum())))
            rows.append((did, round(cos, 6)))
        rows.sort(key=lambda x: (-x[1], x[0]))
        for i, (did, c) in enumerate(rows[:k], 1):
            out.append((qid, did, c, i))
    return pd.DataFrame(out, columns=["query_id", id_col, "cos",
                                      "rerank"])


def _r6(x: float) -> float:
    """Round half away from zero to 6dp (DuckDB round() semantics)."""
    return float(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6)


def mmr_rerank(
    embeddings: rd.Dataset,
    *,
    query_vec_id: int = 0,
    vec_id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_candidates: int = 20,
    k: int = 5,
    lam: float = 0.7,
    mu: float = 0.3,
) -> pd.DataFrame:
    """Maximal-marginal-relevance diversified top-``k`` (Carbonell &
    Goldstein 1998): greedily pick the candidate maximizing
    ``lam·rel − mu·max_sim_to_selected`` — the standard retrieval
    diversifier (plain top-k returns five near-copies of the best hit;
    MMR trades a little relevance for coverage).  ``mu`` is an explicit
    parameter, not ``1−lam`` (0.3 is representable; 1−0.7 is not).

    Determinism contract (the bm25/rerank convention): every cosine is
    float64 rounded to 6dp BEFORE entering a score; each greedy score is
    rounded to 6dp before the argmax; ties break on smaller vec_id — so
    any engine replays the pick sequence exactly.

    Scale shape: relevance cosines are DISTRIBUTED (one matmul per
    batch against the broadcast query vector + batch-local top-n
    partials, the knn_bruteforce shape), so the corpus streams; only
    the ``n_candidates`` survivors (a bounded driver table by
    construction) enter the O(k·n²) greedy, which is driver math like
    the RBO readout.  Output: (pick, vec_id, rel) — pick is 1-based
    selection order.
    """
    # query vector: bounded pure-map filter
    qrow = embeddings.filter(
        lambda r: int(r[vec_id_col]) == int(query_vec_id)).take(1)
    if not qrow:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    q = np.asarray(qrow[0][emb_col], np.float64)
    qn = np.sqrt((q * q).sum())
    q_ref = ray.put(q)

    def batch_top(batch: pa.Table) -> pa.Table:
        ids = batch.column(vec_id_col).to_numpy(zero_copy_only=False)
        keep = ids != int(query_vec_id)
        ids = ids[keep]
        if len(ids) == 0:
            return pa.table({vec_id_col: pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        mat = np.stack([np.asarray(v, np.float64) for m, v in zip(
            keep, batch.column(emb_col).to_pylist()) if m])
        qv = ray.get(q_ref)
        norms = np.sqrt((mat * mat).sum(axis=1))
        cos = (mat @ qv) / (norms * np.sqrt((qv * qv).sum()))
        # batch-local cut by the SAME (rounded rel, id) key as the final
        # cut, so a rounded tie straddling position n can't diverge
        rel = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
        order = np.lexsort((ids, -rel))[:n_candidates]
        return pa.table({vec_id_col: pa.array(ids[order], pa.int64()),
                         "cos": pa.array(rel[order], pa.float64())})

    partials = embeddings.map_batches(
        batch_top, batch_format="pyarrow").to_pandas()
    partials["rel"] = partials["cos"]
    cand = (partials.sort_values(["rel", vec_id_col],
                                 ascending=[False, True])
            .head(n_candidates).reset_index(drop=True))

    # candidate vectors: broadcast-set pure-map fetch (bounded)
    need = set(int(i) for i in cand[vec_id_col])

    def pick_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(vec_id_col).to_numpy(zero_copy_only=False)
        mask = np.fromiter((int(i) in need for i in ids), bool, len(ids))
        return batch.filter(pa.array(mask))

    rows = embeddings.map_batches(pick_rows,
                                  batch_format="pyarrow").to_pandas()
    vecs = {int(r): np.asarray(v, np.float64)
            for r, v in zip(rows[vec_id_col], rows[emb_col])}

    ids = [int(i) for i in cand[vec_id_col]]
    rel = {int(i): float(r) for i, r in zip(cand[vec_id_col],
                                            cand["rel"])}
    sim: dict[tuple[int, int], float] = {}
    for a in ids:
        va = vecs[a]
        na = np.sqrt((va * va).sum())
        for b in ids:
            if a == b:
                continue
            vb = vecs[b]
            sim[(a, b)] = _r6(float(
                (va * vb).sum() / (na * np.sqrt((vb * vb).sum()))))

    selected: list[int] = []
    out = []
    for pick in range(1, min(k, len(ids)) + 1):
        best = None
        for c in ids:
            if c in selected:
                continue
            if selected:
                score = _r6(lam * rel[c]
                            - mu * max(sim[(c, s)] for s in selected))
            else:
                score = _r6(lam * rel[c])
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c)
        chosen = best[1]
        selected.append(chosen)
        out.append((pick, chosen, rel[chosen]))
    return pd.DataFrame(out, columns=["pick", vec_id_col, "rel"])


def rrf_fuse(
    rankings: list[pd.DataFrame],
    *,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_cols: list[str] | None = None,
    k: int = 60,
    top_n: int = 10,
) -> pd.DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N
    ranked lists: ``score(q, d) = Σ_lists 1/(k + rank)`` over the lists
    that returned d, re-ranked by (score desc, doc asc) — the standard
    zero-training fusion of lexical + dense retrieval (and the third
    leg beside rerank and RBO in this repo's retrieval family).

    The inputs are TOP-K FUNNEL OUTPUTS by construction (each O(queries
    x k) rows), so fusion is bounded driver math — the same contract as
    ``mmr_rerank``'s greedy tail.  Each 1/(k+rank) term is one exact
    float division; with two lists the sum is a single commutative
    addition, so the unrounded ordering is engine-exact.  Emits
    (query, doc, n_lists, rrf_score, rrf_rank <= top_n).
    """
    if not rankings:
        raise ValueError("rrf_fuse: no rankings")
    rank_cols = rank_cols or ["rank"] * len(rankings)
    if len(rank_cols) != len(rankings):
        raise ValueError("rrf_fuse: rank_cols/rankings length mismatch")
    parts = []
    for df, rc in zip(rankings, rank_cols):
        parts.append(pd.DataFrame({
            query_col: df[query_col],
            doc_col: df[doc_col].astype("int64"),
            "_c": 1.0 / (k + df[rc].astype("int64").to_numpy(np.float64)),
        }))
    u = pd.concat(parts, ignore_index=True)
    f = (u.groupby([query_col, doc_col], sort=False)["_c"]
         .agg(rrf_score="sum", n_lists="size").reset_index())
    f = f.sort_values([query_col, "rrf_score", doc_col],
                      ascending=[True, False, True], kind="mergesort")
    f["rrf_rank"] = f.groupby(query_col, sort=False).cumcount() + 1
    f = f[f["rrf_rank"] <= top_n].reset_index(drop=True)
    f["n_lists"] = f["n_lists"].astype("int64")
    f["rrf_rank"] = f["rrf_rank"].astype("int64")
    return f[[query_col, doc_col, "n_lists", "rrf_score", "rrf_rank"]]


def lexical_qrels(
    docs: rd.Dataset,
    queries: dict[str, list[str]],
    *,
    ranked_ids: set[int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_terms: int = 2,
) -> tuple[set[tuple[str, int]], dict[str, int]]:
    """Deterministic lexical judgment set shared by the ranked-eval
    family (binary_ndcg, retrieval_eval): a doc is relevant to a query
    iff it contains >= ``min_terms`` DISTINCT query terms (whitespace
    tokens, lowercased) — fully replayable in SQL, no external qrels.

    One vectorized pass over the corpus builds distinct (doc,
    query-vocab term) pairs per batch (doc-local, so per-batch dedup
    is global dedup); per-query totals go through one count exchange.
    Returns ``(rel_set, n_total)`` where rel_set holds (qid, doc_id)
    pairs restricted to ``ranked_ids`` when given (bounded — the
    ranking is a top-k funnel output) and n_total maps qid -> TOTAL
    relevant docs in the corpus.
    """
    from .exchange import exchange_agg

    qitems = sorted(queries.items())
    term_q: dict[str, list[str]] = {}
    for qid, ts in qitems:
        for t in set(ts):
            term_q.setdefault(t, []).append(qid)
    qvocab = frozenset(term_q)
    _empty = pd.DataFrame({"_qid": pd.Series([], dtype="object"),
                           id_col: pd.Series([], dtype="int64")})

    def rel_rows(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return _empty.copy()
        # null text -> "" (str.split(NaN) yields NaN lens and breaks the
        # int64 cast below; the _terms(txt or "") convention elsewhere)
        toks = b[text_col].fillna("").str.lower().str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        dids = np.repeat(b[id_col].to_numpy(np.int64), lens)
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in toks])
        m = pd.Series(flat).isin(qvocab).to_numpy()
        if not m.any():
            return _empty.copy()
        pairs = (pd.DataFrame({id_col: dids[m], "term": flat[m]})
                 .drop_duplicates())
        pairs = pairs.assign(_qid=pairs["term"].map(term_q))
        pairs = pairs.explode("_qid")
        cnt = (pairs.groupby(["_qid", id_col], sort=False)
               .size().reset_index(name="nt"))
        hit = cnt[cnt["nt"] >= min_terms]
        return pd.DataFrame({
            "_qid": hit["_qid"].astype(object),
            id_col: hit[id_col].astype("int64")})

    rel = docs.map_batches(rel_rows, batch_format="pandas").materialize()
    totals = exchange_agg(
        rel.map_batches(
            lambda t: pa.table({
                "_qid": t.column("_qid"),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        "_qid", [("one", "sum", "n_rel")], num_partitions=8).to_pandas()
    rel_pairs = rel.to_pandas() if ranked_ids is None else rel.map_batches(
        lambda b, ids=ranked_ids: b[b[id_col].isin(ids)],
        batch_format="pandas").to_pandas()
    rel_set = set(zip(rel_pairs["_qid"], rel_pairs[id_col]))
    n_total = {q: int(n) for q, n in zip(totals["_qid"], totals["n_rel"])}
    return rel_set, n_total


def binary_ndcg(
    docs: rd.Dataset,
    queries: dict[str, list[str]],
    ranking: pd.DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rank_col: str = "rank",
    k: int = 10,
    min_terms: int = 2,
) -> pd.DataFrame:
    """NDCG@k with binary relevance — the graded-ranking eval leg
    beside RBO (drift) and per-slice AUC (discrimination).  Relevance
    is the deterministic lexical rule ``doc contains >= min_terms
    DISTINCT query terms`` so the judgment set is fully replayable
    (no external qrels exist for a synthetic corpus).

    DCG = Σ_{ranked hits} 1/log2(rank+1); IDCG = Σ_{i<=min(R,k)}
    1/log2(i+1) with R = the query's TOTAL relevant docs — computed
    distributed (a vectorized query-vocab token-membership pass + one
    count exchange; per-batch rows <= |queries| x batch docs).  The
    ranking is a top-k funnel output, so the final join/sums are
    bounded driver math.  Every gain term is rounded to 9dp BEFORE
    summing and dcg/idcg/ndcg to 6dp, so the result is bit-equal to a
    SQL replay regardless of summation order.
    Returns (query_id, n_rel_total, n_rel_ranked, dcg, idcg, ndcg).
    """
    qitems = sorted(queries.items())
    rel_set, n_total = lexical_qrels(
        docs, queries,
        ranked_ids=None if ranking.empty
        else set(map(int, ranking[id_col])),
        id_col=id_col, text_col=text_col, min_terms=min_terms)
    rows = []
    for qid, _terms_ in qitems:
        sub = ranking[(ranking["query_id"] == qid)
                      & (ranking[rank_col] <= k)]
        ranks = sub[rank_col].to_numpy(np.int64)
        hits = np.asarray([(qid, int(d)) in rel_set
                           for d in sub[id_col]], bool)
        dcg = round(float(np.round(
            1.0 / np.log2(ranks[hits] + 1.0), 9).sum()), 6)
        r_tot = int(n_total.get(qid, 0))
        ideal = np.arange(1, min(r_tot, k) + 1, dtype=np.float64)
        idcg = round(float(np.round(
            1.0 / np.log2(ideal + 1.0), 9).sum()), 6)
        rows.append((qid, r_tot, int(hits.sum()), dcg, idcg,
                     round(dcg / idcg, 6) if idcg > 0 else 0.0))
    return pd.DataFrame(rows, columns=[
        "query_id", "n_rel_total", "n_rel_ranked", "dcg", "idcg",
        "ndcg"])


def retrieval_eval(
    docs: rd.Dataset,
    queries: dict[str, list[str]],
    ranking: pd.DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rank_col: str = "rank",
    k: int = 10,
    min_terms: int = 2,
) -> pd.DataFrame:
    """MRR / precision@k / recall@k of a ranking against the shared
    deterministic lexical qrels (lexical_qrels — same judgment rule as
    binary_ndcg, so the three graded-eval legs agree on relevance).

    MRR = 1/rank of the FIRST relevant doc within the top k (0 when
    none); precision@k divides by k (the fixed cutoff, not the
    returned count — standard trec_eval semantics); recall@k divides
    by the query's corpus-wide relevant total R (computed distributed
    inside lexical_qrels).  All ratios rounded 6dp.
    Returns (query_id, n_rel_total, n_rel_ranked, first_rel_rank,
    mrr, precision_at_k, recall_at_k).
    """
    qitems = sorted(queries.items())
    rel_set, n_total = lexical_qrels(
        docs, queries,
        ranked_ids=None if ranking.empty
        else set(map(int, ranking[id_col])),
        id_col=id_col, text_col=text_col, min_terms=min_terms)
    rows = []
    for qid, _terms_ in qitems:
        sub = ranking[(ranking["query_id"] == qid)
                      & (ranking[rank_col] <= k)]
        ranks = sub[rank_col].to_numpy(np.int64)
        hits = np.asarray([(qid, int(d)) in rel_set
                           for d in sub[id_col]], bool)
        hit_ranks = ranks[hits]
        first = int(hit_ranks.min()) if hit_ranks.size else 0
        r_tot = int(n_total.get(qid, 0))
        n_hit = int(hits.sum())
        rows.append((
            qid, r_tot, n_hit, first,
            round(1.0 / first, 6) if first else 0.0,
            round(n_hit / k, 6),
            round(n_hit / r_tot, 6) if r_tot else 0.0))
    return pd.DataFrame(rows, columns=[
        "query_id", "n_rel_total", "n_rel_ranked", "first_rel_rank",
        "mrr", "precision_at_k", "recall_at_k"])


def _vocab_stats(
    ds: rd.Dataset,
    vocab: frozenset[str],
    *,
    text_col: str = "text",
    num_partitions: int = 16,
) -> tuple[int, float, dict[str, float]]:
    """Corpus N / avgdl + Lucene idf for a BOUNDED vocabulary — the
    bm25_topk pass-1 shape (sentinel term '' carries the totals; the
    exchange output is <= len(vocab)+1 rows BY CONSTRUCTION)."""
    from .exchange import exchange_agg

    def stats(batch: pa.Table) -> pa.Table:
        dfc: Counter = Counter()
        n = 0
        sdl = 0
        for txt in batch.column(text_col).to_pylist():
            toks = _terms(txt or "")
            n += 1
            sdl += len(toks)
            dfc.update(vocab.intersection(toks))
        terms = [""] + sorted(dfc)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "df": pa.array([0] + [dfc[t] for t in terms[1:]], pa.int64()),
            "n_docs": pa.array([n] + [0] * (len(terms) - 1), pa.int64()),
            "sum_dl": pa.array([sdl] + [0] * (len(terms) - 1), pa.int64()),
        })

    agg = exchange_agg(
        ds.map_batches(stats, batch_format="pyarrow"),
        "term",
        [("df", "sum", "df"), ("n_docs", "sum", "n_docs"),
         ("sum_dl", "sum", "sum_dl")],
        num_partitions=num_partitions).to_pandas()
    sent = agg[agg["term"] == ""]
    n_docs = int(sent["n_docs"].sum())
    if n_docs == 0:
        raise ValueError("_vocab_stats: empty corpus")
    avgdl = int(sent["sum_dl"].sum()) / n_docs
    idf = {t: math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))
           for t, d in zip(agg["term"], agg["df"]) if t}
    return n_docs, avgdl, idf


def bm25_prf(
    ds: rd.Dataset,
    queries: dict[str, list[str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 3,
    beta: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    num_partitions: int = 64,
) -> rd.Dataset:
    """BM25 with Rocchio-style pseudo-relevance feedback: rank with
    the original query, treat its top ``fb_docs`` as relevant, expand
    the query with the ``fb_terms`` highest tf x idf terms from those
    docs (weight ``beta``; original terms keep weight 1.0), and
    re-rank with the weighted query.

    Every non-corpus-scale intermediate is bounded: the feedback set
    is ``fb_docs x |queries|`` docs (collected once), the candidate
    vocabulary is their distinct tokens, and the second stats pass is
    vocabulary-bounded (:func:`_vocab_stats`).  The corpus is scanned
    exactly three times (pass-1 stats via bm25_topk, feedback-doc
    fetch, weighted scoring) — never shuffled.

    Determinism: expansion selection ranks on (round(tf x idf, 6)
    desc, term asc); final scores round 6dp BEFORE ranking (the bm25
    contract).  Returns (query_id, doc_id, score, rank).
    """
    from .analytics import topk_per_group

    r1 = bm25_topk(ds, queries, text_col=text_col, id_col=id_col,
                   k=fb_docs, k1=k1, b=b,
                   num_partitions=num_partitions).to_pandas()
    fb_ids = frozenset(int(i) for i in r1[id_col])
    fb = ds.map_batches(
        lambda t, ids=fb_ids: t.filter(
            pc.is_in(t.column(id_col),
                     value_set=pa.array(sorted(ids), pa.int64()))),
        batch_format="pyarrow").to_pandas()  # bounded: fb_docs x |queries|
    fb_toks = {int(i): _terms(t or "")
               for i, t in zip(fb[id_col], fb[text_col])}

    qlist = sorted((qid, sorted(set(ts))) for qid, ts in queries.items())
    cand_vocab = frozenset(t for toks in fb_toks.values() for t in toks)
    vocab = cand_vocab | frozenset(t for _, ts in qlist for t in ts)
    _, avgdl, idf = _vocab_stats(ds, vocab, text_col=text_col)

    weighted: list[tuple[str, list[tuple[str, float]]]] = []
    for qid, terms in qlist:
        tf_fb: Counter = Counter()
        for did in r1.loc[r1["query_id"] == qid, id_col]:
            tf_fb.update(fb_toks.get(int(did), []))
        cands = sorted(
            ((round(n * idf.get(t, 0.0), 6), t)
             for t, n in tf_fb.items() if t not in terms),
            key=lambda x: (-x[0], x[1]))
        exp = [t for _, t in cands[:fb_terms]]
        weighted.append((qid, sorted(
            [(t, 1.0) for t in terms] + [(t, beta) for t in exp])))

    bcast = ray.put((weighted, idf, avgdl))
    cache: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        st = cache.get("s")
        if st is None:
            st = cache["s"] = ray.get(bcast)
        wq, idfm, adl = st
        out_q: list[str] = []
        out_d: list[int] = []
        out_s: list[float] = []
        ids = batch.column(id_col).to_pylist()
        for did, txt in zip(ids, batch.column(text_col).to_pylist()):
            toks = _terms(txt or "")
            dl = len(toks)
            tf = Counter(t for t in toks if t in idfm)
            if not tf:
                continue
            norm = k1 * (1.0 - b + b * dl / adl)
            for qid, terms in wq:
                s = 0.0
                hit = False
                for t, w in terms:
                    f = tf.get(t, 0)
                    if f:
                        hit = True
                        s += w * idfm[t] * f * (k1 + 1.0) / (f + norm)
                if hit:
                    out_q.append(qid)
                    out_d.append(did)
                    out_s.append(round(s, 6))
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    scored = ds.map_batches(score, batch_format="pyarrow")
    return topk_per_group(scored, key_col="query_id", sort_col="score",
                          tiebreak_col="doc_id", k=k, descending=True)
