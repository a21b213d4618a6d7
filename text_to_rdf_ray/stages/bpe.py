"""Distributed BPE merge learning (byte-pair encoding tokenizer training,
Sennrich et al. 2016 — public algorithm) over a document corpus.

Structure, Ray-Data-first:

1. **Word-count pass** — per-batch ``Counter`` partials over whitespace
   terms -> one word-keyed ``exchange_agg`` sum.  The WORD table (not
   the corpus) is the iteration state; at web scale it is millions of
   rows where the corpus is billions, and it stays a distributed
   Dataset throughout.
2. **Per-merge iteration** (driver loop, ``n_merges`` times):
   adjacent-symbol-pair counts via a fully vectorized per-batch kernel
   (flatten all symbol lists with ``np.repeat``/``np.concatenate``,
   mask pairs that cross word boundaries, pandas groupby-sum partial)
   -> pair-keyed ``exchange_agg`` sum -> global top-1 through the
   ``topk_per_group`` constant-key funnel (batch-local combiner; the
   pair table is never collected).  The winning merge is applied with a
   vectorized ``str.replace`` (single-pass left-to-right, identical to
   SQL ``replace`` — the oracle replays merges bit-for-bit) and the
   word table re-materialized as the next iteration's input, exactly
   like the per-iteration rank table in ``stages/graph.py::pagerank``.

Symbols are DOUBLE-space-joined inside a double-space-padded string
(``'  h  a  s  h  </w>  '``) so a merge is one single-pass string
``replace`` whose pattern consumes one space from each side of a gap
and whose replacement restores it — the double-space invariant makes
left-to-right non-overlapping ``replace`` EXACTLY canonical greedy BPE
on runs of a repeated symbol (``a a a a`` -> ``[aa, aa]``; a
single-space form would give ``[aa, a, a]`` because the shared
separator is consumed), and Python ``str.replace`` == SQL ``replace``
so the oracle replays merges bit-for-bit.  ``</w>`` is the end-of-word
marker.  Ties break (count desc, pair asc) for determinism.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .curation import _terms

_EOW = "</w>"


def _word_counts(ds: rd.Dataset, text_col: str,
                 num_partitions: int) -> rd.Dataset:
    from .exchange import exchange_agg

    def explode(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in batch.column(text_col).to_pylist():
            c.update(_terms(txt or ""))
        words = sorted(c)
        return pa.table({
            "word": pa.array(words, pa.string()),
            "cnt": pa.array([c[w] for w in words], pa.int64()),
        })

    return exchange_agg(ds.map_batches(explode, batch_format="pyarrow"),
                        "word", [("cnt", "sum", "cnt")],
                        num_partitions=num_partitions)


def _pair_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """Vectorized adjacent-pair counts for one batch of the word table."""
    syms = batch["sym"].str.strip().str.split("  ")
    lens = syms.str.len().to_numpy()
    if len(batch) == 0 or lens.sum() == 0:
        # typed empty: pandas "string" -> Arrow string (a bare object
        # empty becomes Arrow null and breaks the schema merge)
        return pd.DataFrame({"pair": pd.Series([], dtype="string"),
                             "cnt": pd.Series([], dtype="int64")})
    flat = np.concatenate([np.asarray(s, dtype=object) for s in syms])
    wid = np.repeat(np.arange(len(batch)), lens)
    wcnt = np.repeat(batch["cnt"].to_numpy(), lens)
    mask = wid[:-1] == wid[1:]
    left = pd.Series(flat[:-1][mask])
    right = pd.Series(flat[1:][mask])
    out = pd.DataFrame({"pair": left.str.cat(right, sep=" "),
                        "cnt": wcnt[:-1][mask]})
    return out.groupby("pair", as_index=False, sort=False)["cnt"].sum()


def bpe_train(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    n_merges: int = 6,
    num_partitions: int = 32,
) -> tuple[pd.DataFrame, rd.Dataset]:
    """Learn ``n_merges`` BPE merges.  Returns ``(merges, words)``:
    ``merges`` is a driver DataFrame (bounded: ``n_merges`` rows) of
    ``(rank, left, right, merged, pair_cnt)``; ``words`` is the
    distributed word table ``(word, cnt, sym)`` with the final
    segmentation (``sym`` = space-joined symbols, ``</w>``-terminated).
    """
    from .analytics import topk_per_group
    from .exchange import exchange_agg

    def init_sym(batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        sym = ["  " + "  ".join(list(w) + [_EOW]) + "  " for w in words]
        return pa.table({
            "word": batch.column("word"),
            "cnt": batch.column("cnt"),
            "sym": pa.array(sym, pa.string()),
        })

    words = (_word_counts(ds, text_col, num_partitions)
             .map_batches(init_sym, batch_format="pyarrow")
             .materialize())

    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        pairs = exchange_agg(
            words.map_batches(_pair_partials, batch_format="pandas"),
            "pair", [("cnt", "sum", "cnt")],
            num_partitions=num_partitions)

        def tag(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "_all", pa.array(np.zeros(len(batch), np.int32), pa.int32()))

        top = topk_per_group(pairs.map_batches(tag, batch_format="pyarrow"),
                             key_col="_all", sort_col="cnt",
                             tiebreak_col="pair", k=1,
                             descending=True).take_all()
        if not top:
            break
        best = top[0]
        pair, pcnt = str(best["pair"]), int(best["cnt"])
        left, right = pair.split(" ")
        merged = left + right
        merges.append({"rank": rank, "left": left, "right": right,
                       "merged": merged, "pair_cnt": pcnt})

        pat, repl = f" {left}  {right} ", f" {merged} "

        def apply(batch: pd.DataFrame, pat=pat, repl=repl) -> pd.DataFrame:
            return batch.assign(
                sym=batch["sym"].str.replace(pat, repl, regex=False))

        words = (words.map_batches(apply, batch_format="pandas")
                 .materialize())

    def normalize(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(
            sym=batch["sym"].str.replace("  ", " ", regex=False).str.strip())

    return (pd.DataFrame(merges),
            words.map_batches(normalize, batch_format="pandas"))
