"""Hash-exchange equi-join built from union + groupby — the cheap join.

Ray 2.49's native ``Dataset.join`` (JoinOperator) spins up a hash-shuffle
aggregator ACTOR POOL per plan: measured ~1.5-1.9s fixed cost per
join-bearing executor run at 16 CPUs even for kilobyte inputs (and two
JoinOperators in one plan can oversubscribe the pool at small CPU budgets
— observed livelock at num_cpus=4).  The barrier-dominated KG operators
(link join, connected components, PageRank) run many small joins, so that
fixed cost IS their wall time at bench scale.

``exchange_join`` expresses the same equi-join as the repo's standard
exchange pattern — tag each side, pad to one Arrow schema, hash-partition
on the key inside the map, union, ONE groupby exchange, and a vectorized
per-partition ``pandas.merge`` — which runs as plain tasks (no actor
pool): measured ~0.4s for the same join, 4-5x less fixed cost, and any
number of them can ride in one plan.

Scale shape: one all-to-all on the key hash (same volume as the native
join's shuffle), merge vectorized across ALL keys in a partition.
Partitioning assumption: one partition's rows (|left|+|right|)/
``num_partitions`` fit in a worker — raise ``num_partitions`` with data
size.

Block-count pathology (measured, Ray 2.49): the ``groupby`` exchange is
sort-based and emits as many output blocks as it gets INPUT blocks, so
its intermediate object count grows ~O(B_in²) — 16 blocks/side join in
0.55s, 128/side in 8-13s, 256/side in 26-46s on identical 60k-row data
(SortMap 512 blocks x SortReduce 512 blocks = 262k refs; remote compute
under 1s throughout).  When a side is a wide-block lineage (a large read
or a many-task map), pass ``coalesce_blocks≈num_partitions`` to insert a
cheap split/merge repartition in front of the exchange: same memory
envelope as the per-partition merge already assumes, bounds the shuffle
at O(P²) refs (256-block case back to ~3s).  Left None by default —
the coalesce barrier costs ~0.35s, a net LOSS for the many-small-
exchange KG paths whose inputs are already few-block.

Output blocks are rebuilt as TYPED Arrow tables (missing
left-outer payloads become proper Arrow nulls, not pandas NaN), so the
result can feed further lazy stages — including more exchange joins —
without a materialization barrier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_SIDE = "_xj_side"
_PART = "_xj_part"


#: hash assigned to a NULL key element (any type) — a fixed arbitrary
#: odd constant so null keys co-partition deterministically
_NULL_KEY_HASH = np.uint64(0x9E3779B97F4A7C15)

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _hash_strings(vals: list) -> np.ndarray:
    """Stable FNV-1a over each string's FULL utf-8 bytes — unlike the
    minhash shingle hash (40-byte truncation, fine for short n-grams),
    partition KEYS must not collide on a shared long prefix (IRIs with
    a common namespace would all land in ONE partition).  The masked
    column loop makes each hash independent of the batch's max width,
    so the same key hashes identically in every batch."""
    encoded = [(s if s is not None else None) for s in vals]
    null_mask = np.array([e is None for e in encoded], bool)
    byts = [e.encode("utf-8") if e is not None else b"" for e in encoded]
    n = len(byts)
    lens = np.array([len(b) for b in byts], np.uint64)
    width = int(lens.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, np.uint64)
    if width:
        buf = b"".join(b.ljust(width, b"\x00") for b in byts)
        arr = (np.frombuffer(buf, np.uint8)
               .reshape(n, width).astype(np.uint64))
        with np.errstate(over="ignore"):
            for j in range(width):
                hx = (h ^ arr[:, j]) * _FNV_PRIME
                h = np.where(lens > np.uint64(j), hx, h)
    with np.errstate(over="ignore"):
        h = (h ^ lens) * _FNV_PRIME
    if null_mask.any():
        h = np.where(null_mask, _NULL_KEY_HASH, h)
    return h


def _key_hash(tbl: pa.Table, on: list[str]) -> np.ndarray:
    """Vectorized uint64 hash of the key tuple (splitmix64 for integer
    columns, full-length FNV for strings; columns combined with a
    rotate-xor).  NULL key elements hash to a fixed constant on every
    type path — an int64 column with nulls must NOT round-trip through
    numpy float64 (ids above 2^53 would round, making a key's partition
    depend on which batch it shares with a null)."""
    import pyarrow.compute as pc

    from .analytics import splitmix64

    acc = np.zeros(len(tbl), np.uint64)
    for c in on:
        col = tbl.column(c)
        nulls = col.null_count
        if pa.types.is_integer(col.type):
            filled = pc.fill_null(col, 0) if nulls else col
            h = splitmix64(
                filled.to_numpy(zero_copy_only=False).astype(np.int64))
        elif pa.types.is_floating(col.type):
            # hash the IEEE bit pattern (equal float64 keys — including
            # +0.0 after the canonicalization below — share a partition)
            filled = pc.fill_null(col, 0.0) if nulls else col
            v = filled.to_numpy(zero_copy_only=False).astype(np.float64)
            v = v + 0.0  # -0.0 -> +0.0 so it groups with +0.0
            h = splitmix64(v.view(np.int64))
        else:
            h = _hash_strings(col.to_pylist())
            nulls = 0  # _hash_strings handled them
        if nulls:
            mask = pc.is_null(col).to_numpy(zero_copy_only=False)
            h = np.where(mask, _NULL_KEY_HASH, h)
        acc = ((acc << np.uint64(13)) | (acc >> np.uint64(51))) ^ h
    return acc


def as_arrow_schema(schema) -> pa.Schema:
    """Ray ``Dataset.schema()`` -> ``pa.Schema``.  A pandas-block-backed
    dataset (``from_pandas``) reports numpy dtypes / Python ``object``
    for strings instead of Arrow types; normalize so schema-driven
    operators (``exchange_join``, ``semi_join_bloom``) accept either."""
    fields = []
    for n, t in zip(schema.names, schema.types):
        if isinstance(t, pa.DataType):
            fields.append((n, t))
        elif t is object or t is str:
            fields.append((n, pa.string()))
        else:
            fields.append((n, pa.from_numpy_dtype(np.dtype(t))))
    return pa.schema(fields)


def join_out_schema(
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    on: tuple[str, ...] | list[str] | str,
) -> pa.Schema:
    """The output schema ``exchange_join`` produces for these inputs —
    pass it back as a ``*_schema`` argument when chaining joins so the
    planner never runs a schema-probe execution on the lazy lineage."""
    on = [on] if isinstance(on, str) else list(on)
    keys = [(k, left_schema.types[left_schema.names.index(k)]) for k in on]
    pay = ([(n, t) for n, t in zip(left_schema.names, left_schema.types)
            if n not in on]
           + [(n, t) for n, t in zip(right_schema.names, right_schema.types)
              if n not in on])
    return pa.schema(keys + pay)


def exchange_agg(
    ds: rd.Dataset,
    keys: tuple[str, ...] | list[str] | str,
    aggs: list[tuple[str, str] | tuple[str, str, str]] = (),
    *,
    num_partitions: int = 32,
    combine: bool = True,
    coalesce_blocks: int | None = None,
) -> rd.Dataset:
    """Grouped aggregation as hash exchange + vectorized Arrow reduce.

    Ray 2.49's ``Dataset.groupby(keys).aggregate(...)`` / ``.count()``
    reduces ONE PYTHON CALL PER KEY (measured here: 5.0s vs 0.85s for
    this helper on a 360k-row / 120k-key min — and 153s vs <2s on a
    48k-key two-string-column distinct, NOTES_r3).  This helper runs the
    same logical aggregation as: optional per-batch Arrow ``group_by``
    combiner -> ONE hash exchange on the key -> per-partition Arrow
    ``group_by`` (C++ hash aggregation, vectorized across every key in
    the partition).

    ``aggs``: ``(col, fn)`` or ``(col, fn, out_name)`` with fn in
    ``min | max | sum | count`` (count re-aggregates as sum of partial
    counts).  Empty ``aggs`` = DISTINCT over the key columns.  Output
    columns: keys + out names.  ``combine=True`` (all supported fns are
    decomposable) shrinks each batch to its distinct keys before the
    exchange, so shuffle volume is per-batch-distinct, not raw rows.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    norm: list[tuple[str, str, str]] = []
    seen_out: set[str] = set(keys)
    for a in aggs:
        col, fn = a[0], a[1]
        out = a[2] if len(a) > 2 else col
        if fn not in ("min", "max", "sum", "count"):
            raise ValueError(f"unsupported agg fn {fn!r}")
        if out in seen_out:
            # two aggs defaulting to the same out name would silently
            # keep only the last one in the reduce's dict-build
            raise ValueError(
                f"duplicate output column {out!r} — give each agg an "
                "explicit out name")
        if out == _PART:
            raise ValueError(
                f"output name {_PART!r} is reserved by the exchange")
        seen_out.add(out)
        norm.append((col, fn, out))
    if _PART in keys:
        raise ValueError(f"key name {_PART!r} is reserved by the exchange")

    def _agg(t: pa.Table, specs: list[tuple[str, str, str]]) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, fn) for c, fn, _ in specs])
        cols = {k: g.column(k) for k in keys}
        for c, fn, out in specs:
            cols[out] = g.column(f"{c}_{fn}")
        return pa.table(cols) if cols else g

    # after the combiner, partial columns carry the OUT name and partial
    # counts re-aggregate as sums; without it the reduce applies the
    # original fn to the (renamed) raw column
    reduce_specs = [
        (out, ("sum" if fn == "count" else fn) if combine else fn, out)
        for _, fn, out in norm]

    def part_of(t: pa.Table) -> pa.Table:
        h = (_key_hash(t, keys) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column(_PART, pa.array(h, pa.int32()))

    def combine_batch(t: pa.Table) -> pa.Table:
        return part_of(_agg(t, norm))

    def tag_batch(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in keys}
        for c, fn, out in norm:
            cols[out] = t.column(c)
        return part_of(pa.table(cols))

    def reduce_part(t: pa.Table) -> pa.Table:
        t = t.drop_columns([_PART])
        if not reduce_specs:
            return t.group_by(keys).aggregate([])
        return _agg(t, reduce_specs)

    first = combine_batch if combine else tag_batch
    tagged = ds.map_batches(first, batch_format="pyarrow")
    if coalesce_blocks is not None:
        # bound the sort exchange at O(coalesce_blocks^2) refs (see module
        # docstring) — worth it only for wide-block lineages
        tagged = tagged.repartition(coalesce_blocks)
    return (tagged.groupby(_PART)
            .map_groups(reduce_part, batch_format="pyarrow"))


def exchange_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: tuple[str, ...] | list[str] | str,
    how: str = "inner",
    num_partitions: int = 32,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    coalesce_blocks: int | None = None,
) -> rd.Dataset:
    """Equi-join ``left`` with ``right`` on the shared key column(s).

    ``how``: "inner", "left_outer" or "full_outer".  Payload column
    names must be disjoint between the sides (same contract as the
    native join call sites here); key columns must exist on both sides
    with identical names.  Output columns: keys + left payload + right
    payload, typed per the input schemas (right payload nullable under
    left_outer; both payloads nullable under full_outer, where key
    columns are coalesced from whichever side matched).  Row order is
    not defined (hash-partitioned), matching Dataset.join.

    ``left_schema``/``right_schema``: pass explicitly when a side is a
    lazy map_groups lineage (e.g. a previous exchange_join) — otherwise
    ``.schema()`` triggers a schema-probe execution of that lineage.
    Chained exchange joins with schemas provided fuse into ONE executor
    plan (no actor pools, no intermediate materialization).

    Semantics deviation from Dataset.join / SQL, by contract: NULL
    join keys MATCH each other (they co-partition via a fixed hash and
    pandas-merge treats them as equal) — callers with nullable keys
    that need SQL null semantics must filter nulls first.  No oracled
    path here carries null keys.
    """
    import pyarrow.compute as _pc  # noqa: F401  (used below)

    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"unsupported how={how!r}")
    on = [on] if isinstance(on, str) else list(on)
    ls = left_schema if left_schema is not None else left.schema()
    rs = right_schema if right_schema is not None else right.schema()

    def _family(t: pa.DataType) -> str:
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            return "float"
        return "other"

    key_types = {}
    for k in on:
        if k not in ls.names or k not in rs.names:
            raise ValueError(f"join key {k!r} missing from one side")
        lt = ls.types[ls.names.index(k)]
        rt = rs.types[rs.names.index(k)]
        if _family(lt) != _family(rt):
            # int vs float keys hash on DIFFERENT code paths (value vs
            # IEEE bits) — equal-valued keys would never co-partition,
            # silently returning an empty/partial join; refuse loudly
            raise ValueError(
                f"join key {k!r} type family mismatch: {lt} vs {rt} — "
                "cast both sides to one family first")
        key_types[k] = lt
    out_schema = join_out_schema(ls, rs, on)
    l_fields = [(n, t) for n, t in zip(ls.names, ls.types) if n not in on]
    r_fields = [(n, t) for n, t in zip(rs.names, rs.types) if n not in on]
    overlap = {n for n, _ in l_fields} & {n for n, _ in r_fields}
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    reserved = {_SIDE, _PART} & (set(ls.names) | set(rs.names))
    if reserved:
        raise ValueError(
            f"column names {sorted(reserved)} are reserved by "
            "exchange_join's internal padding — rename them")
    all_fields = l_fields + r_fields
    l_names = [n for n, _ in l_fields]
    r_names = [n for n, _ in r_fields]

    def pad(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            # cast to the declared types so .take() outputs match the
            # output schema exactly (e.g. a large_string block)
            cols: dict = {k: batch.column(k).cast(key_types[k]) for k in on}
            for name, typ in all_fields:
                if name in batch.column_names:
                    cols[name] = batch.column(name).cast(typ)
                elif pa.types.is_integer(typ):
                    # NON-NULL zero filler, not pa.nulls: if ANY block in
                    # the unioned lineage is a pandas block (Ray 2.49
                    # emits empty zero-column pandas blocks from some
                    # map_groups lineages, and map_batches skips them),
                    # Ray's sort exchange normalizes ALL blocks to
                    # pandas — a nullable int64 column then rides through
                    # float64 and ids above 2^53 round (review r5,
                    # reproduced).  merge_part gathers each side's
                    # payload from that side's rows only, so the
                    # opposite-side filler is never read.
                    cols[name] = pa.array(np.zeros(n, np.int64)).cast(typ)
                elif pa.types.is_boolean(typ):
                    cols[name] = pa.array(np.zeros(n, bool))
                else:
                    cols[name] = pa.nulls(n, typ)
            cols[_SIDE] = pa.array(np.full(n, side, np.int8))
            cols[_PART] = pa.array(
                (_key_hash(batch, on) % np.uint64(num_partitions))
                .astype(np.int32))
            return pa.table(cols)

        return fn

    def merge_part(g: pa.Table) -> pa.Table:
        # pandas only sees the KEY columns plus row positions — payloads
        # never round-trip through pandas, so a null-padded int64 payload
        # can't be coerced to float64 (which silently corrupts 63-bit
        # ids); matched rows are then .take()n from the Arrow sides.
        side = g.column(_SIDE)
        import pyarrow.compute as pc

        lmask = pc.equal(side, 0)
        L = g.filter(lmask)
        R = g.filter(pc.invert(lmask))
        def key_series(col):
            # a NULLABLE int64 key would round-trip to float64 and
            # round ids above 2^53 (the exact corruption the payload
            # .take() path avoids) — object-dtype ints preserve all 64
            # bits; the null-free fast path stays zero-copy int64
            if (pa.types.is_integer(col.type) and col.null_count):
                return col.to_pandas(integer_object_nulls=True)
            return col.to_pandas()

        ldf = pd.DataFrame({k: key_series(L.column(k)) for k in on})
        ldf["_li"] = np.arange(len(L), dtype=np.int64)
        rdf = pd.DataFrame({k: key_series(R.column(k)) for k in on})
        rdf["_ri"] = np.arange(len(R), dtype=np.int64)
        m = ldf.merge(rdf, on=on,
                      how={"inner": "inner", "left_outer": "left",
                           "full_outer": "outer"}[how])
        # under an outer merge an unmatched index is NaN; a NULL
        # take-index yields a null output element — exactly the
        # outer-join semantics
        li = pa.Array.from_pandas(m["_li"], type=pa.int64())
        ri = pa.Array.from_pandas(m["_ri"], type=pa.int64())
        cols: dict = {}
        for k in on:
            if how == "full_outer":
                # right-only rows have a null left index: take the key
                # from whichever side actually matched
                cols[k] = pc.coalesce(L.column(k).combine_chunks().take(li),
                                      R.column(k).combine_chunks().take(ri))
            else:
                cols[k] = L.column(k).take(li)
        for n_ in l_names:
            cols[n_] = L.column(n_).take(li)
        for n_ in r_names:
            cols[n_] = R.column(n_).take(ri)
        return pa.table([cols[f.name] for f in out_schema],
                        schema=out_schema)

    u = left.map_batches(pad(0), batch_format="pyarrow").union(
        right.map_batches(pad(1), batch_format="pyarrow"))
    if coalesce_blocks is not None:
        # bound the sort exchange at O(coalesce_blocks^2) refs (see module
        # docstring) — worth it only for wide-block lineages
        u = u.repartition(coalesce_blocks)
    return u.groupby(_PART).map_groups(merge_part, batch_format="pyarrow")
