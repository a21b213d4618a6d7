"""Document deduplication operators (training-data pipeline ops).

All operate on a Dataset with (id_col: int64, text_col: string):

- ``exact_dedup``: content-hash two-phase dedup (batch combiner + hash
  aggregation) — keeps the min id per distinct text.
- ``minhash_lsh_pairs`` / ``minhash_dedup``: near-dup candidate pairs via
  word-shingle MinHash banding verified with exact Jaccard; dedup maps
  every near-dup cluster (connected components) to its min id.
- ``simhash_pairs``: 64-bit SimHash, banded into 4x16-bit sub-keys
  (guarantees recall for Hamming distance <= 3), verified by Hamming.
- ``ngram_jaccard_pairs``: exact character-n-gram Jaccard over LSH-blocked
  candidates.
- ``embedding_neardup_pairs``: cosine near-dup over an embedding column via
  deterministic random-hyperplane LSH buckets + exact cosine verify.

Pairs outputs are (id_a, id_b, score) with id_a < id_b, globally deduped.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..kernels.minhash import (
    band_keys,
    char_shingles,
    hamming64,
    jaccard,
    minhash_signature,
    simhash64,
    word_shingles,
)


def _text_hash64(texts: list[str]) -> list[int]:
    return [
        int.from_bytes(hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little") >> 1
        for t in texts
    ]


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """One row per distinct text: (id_col = min id, text_col).

    Combiner: per-batch min-id per hash; exchange: groupby(hash).min(id);
    texts are re-attached by joining min-id rows back (hash -> text carried
    through the aggregation to avoid a second shuffle).
    """
    from ray.data.aggregate import Min

    def combine(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "h": pa.array(_text_hash64(batch.column(text_col).to_pylist()), pa.int64()),
                id_col: batch.column(id_col),
                text_col: batch.column(text_col),
            }
        ).to_pandas()
        df = df.sort_values(["h", id_col]).drop_duplicates("h", keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col), Min(text_col, alias_name=text_col))
        .select_columns([id_col, text_col])
    )
    return agg


def _pairs_from_buckets(
    ds: rd.Dataset,
    band_fn,
    verify_fn,
    id_col: str,
    payload_col: str,
    max_bucket: int = 256,
    prepare_fn=None,
) -> rd.Dataset:
    """Generic LSH pipeline: explode band keys -> groupby bucket ->
    verified pairs -> global pair dedup.

    ``prepare_fn(payload)`` computes the verification features ONCE per
    distinct id per shard (shingle sets, hashes, normalized vectors);
    ``verify_fn(f1, f2)`` scores a candidate pair.  Pair results are also
    memoized within a shard (a pair can collide in several bands)."""
    from ray.data.aggregate import Min

    if prepare_fn is None:
        prepare_fn = lambda p: p  # noqa: E731

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        payloads = batch.column(payload_col).to_pylist()
        ob, oh, oi, op = [], [], [], []
        for i, p in zip(ids, payloads):
            for band_id, band_hash in band_fn(p):
                ob.append(band_id)
                oh.append(band_hash)
                oi.append(i)
                op.append(p)
        shard = [(h ^ (bi << 56)) % 512 for bi, h in zip(ob, oh)]
        return pa.table(
            {
                "shard": pa.array(shard, pa.int32()),
                "band_id": pa.array(ob, pa.int32()),
                "band_hash": pa.array(oh, pa.int64()),
                id_col: pa.array(oi, pa.int64()),
                payload_col: op,
            }
        )

    def shard_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """One Ray group = one shard = many LSH buckets; bucket iteration is
        a local pandas groupby (avoids per-bucket Ray map_groups overhead
        when buckets number in the tens of thousands)."""
        a, b, sc = [], [], []
        feats: dict = {}
        pair_seen: set = set()
        for _, g in group.groupby(["band_id", "band_hash"], sort=True):
            g = g.drop_duplicates(id_col).sort_values(id_col)
            n = len(g)
            if n < 2 or n > max_bucket:
                continue
            ids = g[id_col].to_numpy()
            payloads = g[payload_col].tolist()
            for i in range(n):
                if ids[i] not in feats:
                    feats[ids[i]] = prepare_fn(payloads[i])
                for j in range(i + 1, n):
                    key = (ids[i], ids[j])
                    if key in pair_seen:
                        continue
                    pair_seen.add(key)
                    if ids[j] not in feats:
                        feats[ids[j]] = prepare_fn(payloads[j])
                    score = verify_fn(feats[ids[i]], feats[ids[j]])
                    if score is not None:
                        a.append(ids[i])
                        b.append(ids[j])
                        sc.append(score)
        return pd.DataFrame(
            {"id_a": np.array(a, dtype=np.int64), "id_b": np.array(b, dtype=np.int64),
             "score": np.array(sc, dtype=np.float64)}
        )

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pandas")
    )

    _SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                         ("score", pa.float64())])

    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return _SCHEMA.empty_table()
        return pa.table({n: t.column(n).cast(_SCHEMA.field(n).type) for n in
                         ("id_a", "id_b", "score")})

    # a pair can surface from several bands: dedup on (id_a, id_b);
    # normalize schema afterwards (empty aggregates lose their columns)
    return (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Min("score", alias_name="score"))
        .map_batches(norm, batch_format="pyarrow")
    )


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_words: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> rd.Dataset:
    def band_fn(text: str):
        sig = minhash_signature(word_shingles(text, shingle_words), num_perm=num_perm)
        return list(enumerate(band_keys(sig, bands)))

    def prepare(text: str):
        return word_shingles(text, shingle_words)

    def verify(s1, s2):
        j = jaccard(s1, s2)
        return j if j >= threshold else None

    return _pairs_from_buckets(
        ds.select_columns([id_col, text_col]), band_fn, verify, id_col, text_col,
        prepare_fn=prepare,
    )


def minhash_dedup(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id", **kwargs
) -> rd.Dataset:
    """(id, canonical_id): every doc mapped to the min id of its near-dup
    cluster (connected components over verified pairs)."""
    from .canonicalize import connected_components

    pairs = minhash_lsh_pairs(ds, text_col, id_col, **kwargs)
    # map_groups emits pandas blocks; convert to arrow + rename in one pass
    # (Dataset.rename_columns chokes on pandas blocks in Ray 2.49)
    edges = pairs.map_batches(
        lambda t: pa.table({"src": t.column("id_a"), "dst": t.column("id_b")}),
        batch_format="pyarrow",
    ).materialize()  # consumed by count + connected components + take_all
    if edges.count() == 0:
        return ds.map_batches(
            lambda t: pa.table(
                {id_col: t.column(id_col), "canonical_id": t.column(id_col)}
            ),
            batch_format="pyarrow",
        )
    from .canonicalize import DRIVER_UNION_FIND_THRESHOLD, _solid

    comp = connected_components(edges)
    if comp.count() < DRIVER_UNION_FIND_THRESHOLD:
        # near-dup clusters are a tiny fraction of the corpus: broadcast the
        # component map instead of shuffling every id through a join
        import ray

        comp_ref = ray.put({r["name_id"]: r["component"] for r in comp.take_all()})

        class Attach:
            def __init__(self):
                self.map = ray.get(comp_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ids_list = t.column(id_col).to_pylist()
                return pa.table(
                    {
                        id_col: t.column(id_col),
                        "canonical_id": pa.array(
                            [self.map.get(i, i) for i in ids_list], pa.int64()
                        ),
                    }
                )

        return ds.select_columns([id_col]).map_batches(
            Attach, batch_format="pyarrow", concurrency=(1, 4)
        )
    comp = _solid(comp.map_batches(
        lambda t: pa.table({id_col: t.column("name_id"), "component": t.column("component")}),
        batch_format="pyarrow",
    ))
    ids = _solid(ds.select_columns([id_col]))
    joined = ids.join(comp, join_type="left_outer", num_partitions=16, on=(id_col,))
    return joined.map_batches(
        lambda t: pa.table(
            {
                id_col: t.column(id_col),
                "canonical_id": pa.array(
                    [
                        c if c is not None else i
                        for c, i in zip(
                            t.column("component").to_pylist(),
                            t.column(id_col).to_pylist(),
                        )
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def simhash_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
) -> rd.Dataset:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Banding into 4 x 16-bit keys guarantees any pair within Hamming 3
    shares at least one band (pigeonhole)."""

    def band_fn(text: str):
        h = simhash64(text)
        return [(bi, (h >> (16 * bi)) & 0xFFFF) for bi in range(4)]

    def verify(h1: int, h2: int):
        d = hamming64(h1, h2)
        return float(d) if d <= max_hamming else None

    return _pairs_from_buckets(
        ds.select_columns([id_col, text_col]), band_fn, verify, id_col, text_col,
        prepare_fn=simhash64,
    )


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 32,
) -> rd.Dataset:
    """Character n-gram Jaccard >= threshold pairs (LSH-blocked; 32 bands
    of 2 rows keep recall high at 0.8 similarity)."""

    def band_fn(text: str):
        sig = minhash_signature(char_shingles(text, n), num_perm=num_perm)
        return list(enumerate(band_keys(sig, bands)))

    def prepare(text: str):
        return char_shingles(text, n)

    def verify(s1, s2):
        j = jaccard(s1, s2)
        return j if j >= threshold else None

    return _pairs_from_buckets(
        ds.select_columns([id_col, text_col]), band_fn, verify, id_col, text_col,
        prepare_fn=prepare,
    )


def embedding_neardup_pairs(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> rd.Dataset:
    """Cosine >= threshold pairs via random-hyperplane LSH buckets.

    Deterministic hyperplanes (seeded); two sign-bands of ``planes`` bits
    each; exact cosine verification inside buckets."""
    sample = ds.take(1)
    d = dim or len(sample[0][emb_col])
    rng = np.random.RandomState(seed)
    hyper = rng.randn(d, 2 * planes).astype(np.float32)

    def band_fn(vec):
        v = np.asarray(vec, dtype=np.float32)
        bits = (v @ hyper) > 0
        k1 = int(np.packbits(bits[:planes], bitorder="little").view(np.uint16)[0]) if planes == 16 else int(
            sum(1 << i for i in range(planes) if bits[i])
        )
        k2 = int(sum(1 << i for i in range(planes) if bits[planes + i]))
        return [(0, k1), (1, k2)]

    def prepare(vec):
        a = np.asarray(vec, dtype=np.float32)
        norm = float(np.linalg.norm(a))
        return a / norm if norm else a

    def verify(a, b):
        c = float(a @ b)
        return c if c >= threshold else None

    return _pairs_from_buckets(
        ds.select_columns([id_col, emb_col]), band_fn, verify, id_col, emb_col,
        prepare_fn=prepare,
    )
