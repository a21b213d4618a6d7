"""Text-analysis Ray stages (language ID, quality, tokens, fingerprints).

Vectorized pandas/numpy bodies whose outputs match the pure kernels in
kernels/textstats.py exactly (tested row-by-row); the closed-form
definitions also back the DuckDB oracle SQL in __ray_entry__.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..kernels.minhash import rolling_fingerprint, simhash64
from ..kernels.textstats import lang_id, quality_score, token_count_bpe, token_count_ws


def add_token_counts(ds: rd.Dataset, text_col: str = "text",
                     id_col: str = "doc_id") -> rd.Dataset:
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col]
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_tokens_ws": texts.map(token_count_ws).astype("int64"),
                "n_tokens_bpe": texts.map(token_count_bpe).astype("int64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas", batch_size=4096)


def add_lang_id(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "pred_lang": batch[text_col].map(lang_id),
            }
        )

    return ds.map_batches(fn, batch_format="pandas", batch_size=4096)


def add_quality(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
                keep_cols: tuple[str, ...] = ()) -> rd.Dataset:
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        feats = batch[text_col].map(quality_score)
        out = pd.DataFrame(list(feats))
        out.insert(0, id_col, batch[id_col].to_numpy())
        for i, c in enumerate(keep_cols):
            out.insert(i + 1, c, batch[c].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas", batch_size=4096)


def add_fingerprints(ds: rd.Dataset, text_col: str = "text",
                     id_col: str = "doc_id") -> rd.Dataset:
    """Winnowing fingerprints + SimHash per document."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = batch.column(text_col).to_pylist()
        fps = [rolling_fingerprint(t) for t in texts]
        sh = [simhash64(t) - (1 << 63) for t in texts]  # shift into int64 range
        return pa.table(
            {
                id_col: ids,
                "fingerprints": pa.array(fps, pa.list_(pa.int64())),
                "n_fingerprints": pa.array([len(f) for f in fps], pa.int32()),
                "simhash": pa.array(sh, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=2048)
