"""Entity canonicalization: MinHash-LSH blocking + union-find as shuffles.

North-star core (BASELINE.json): cross-document surface-form
canonicalization at 10^12-doc scale —

  distinct surfaces
  -> map_batches: char-shingle MinHash signatures, explode to
     (shard, band_id, band_hash, name_id) rows — no surface
     strings enter the exchange                            [no shuffle]
  -> groupby(band_key): per-bucket candidate pairs; surfaces for the
     (tiny) candidate set are re-read in a verify stage and checked by
     exact shingle Jaccard >= tau                           [shuffle 1]
     (buckets larger than ``max_bucket`` are skipped — the skew guard for
      head surface forms; exact duplicates inside a skipped bucket are
      still unified because identical norms share ALL bands and one
      unskewed band key, and identical strings canonicalize identically)
  -> iterative min-label propagation over the edge set     [shuffles 2..k]
     (union-find connected components as groupby-aggregate rounds with
      early convergence detection; only nodes that appear in edges join
      the iteration — singletons shortcut to themselves)
  -> canonical name per component = lexicographically smallest surface
  -> surface -> canonical map joined back onto the triples.

The label-propagation join is hash-partitioned (Dataset.join on Ray
2.49); candidate-pair generation shuffles only (shard, band, hash,
name_id) rows — never surfaces, never documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..kernels.minhash import band_keys, char_shingles, jaccard, minhash_signature

DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16
DEFAULT_TAU = 0.72
DEFAULT_MAX_BUCKET = 64


def _norm(surface: str) -> str:
    return " ".join(surface.lower().replace(".", "").split())


def _surface_prepare(surface: str):
    norm = _norm(surface)
    return norm, char_shingles(norm)


def _surface_verify_fn(tau: float):
    def verify(f1, f2):
        n1, s1 = f1
        n2, s2 = f2
        return 1.0 if (n1 == n2 or jaccard(s1, s2) >= tau) else None

    return verify


def _arrow(ds: rd.Dataset) -> rd.Dataset:
    """Force arrow blocks (groupby aggregates emit pandas blocks in Ray
    2.49, on which rename/Project operators break)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _solid(ds: rd.Dataset, n: int = 8) -> rd.Dataset:
    """Join-safe materialization: map_groups/aggregate lineages can leave
    schema-less empty blocks that crash the pyarrow hash join ("no match
    for FieldRef..."); repartition coalesces them away."""
    return _arrow(ds).repartition(n).materialize()


DRIVER_UNION_FIND_THRESHOLD = 200_000


def _local_union_find(edge_rows) -> list[dict]:
    """Driver-side path-compressed union-find; deterministic (min root)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = find(int(r["src"])), find(int(r["dst"]))
        if a != b:
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    nodes = set()
    for r in edge_rows:
        nodes.add(int(r["src"]))
        nodes.add(int(r["dst"]))
    return [{"name_id": n, "component": find(n)} for n in sorted(nodes)]


def connected_components(
    edges: rd.Dataset,
    max_rounds: int = 64,
    driver_threshold: int = DRIVER_UNION_FIND_THRESHOLD,
    engine: str = "bsp",
) -> rd.Dataset:
    """Min-label propagation + pointer jumping over undirected edges ->
    (name_id, component).

    Each round combines TWO shrink moves before one groupby-min:

    - neighbor propagation: component(x) <= min over neighbors'
      components (a hash join edges x labels) — the classic min-label
      step, O(diameter) rounds alone;
    - pointer jump: component(x) <= component(component(x)) (labels
      self-join on the label value) — the path-halving move of
      pointer-doubling / Hash-to-Min (Rastogi et al. 2013), which cuts
      the round count to O(log diameter): a 10^9-edge graph with a
      1000-hop chain converges in ~10 rounds instead of ~1000.

    Labels only decrease, so a stable global label sum IS convergence
    (the stop test).  The observed round count is exported via the
    ``cc_rounds`` operator counter.  If ``max_rounds`` is hit while
    labels are still changing the function RAISES rather than silently
    returning split clusters.

    Candidate-pair sets from LSH blocking are a vanishing fraction of the
    corpus, so when the edge set is provably small (< driver_threshold,
    checked by count) a driver-side path-compressed union-find replaces the
    iterative shuffles — identical output, none of the per-round barrier
    cost.  The distributed path remains for larger graphs (and is what the
    skew/scale design assumes).
    """
    n_edges = edges.count()
    if n_edges == 0:
        # from_arrow, not from_items([]).map_batches: with zero blocks
        # the lambda never runs and the dataset is schema-less
        # (review r5)
        return rd.from_arrow(pa.table(
            {"name_id": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}))
    if n_edges < driver_threshold:
        rows = _local_union_find(edges.take_all())
        return rd.from_arrow(
            pa.table(
                {
                    "name_id": pa.array([r["name_id"] for r in rows], pa.int64()),
                    "component": pa.array([r["component"] for r in rows], pa.int64()),
                }
            )
        )

    fwd = edges.select_columns(["src", "dst"])
    # swap via explicit arrow rebuild (a rename_columns swap-dict collides)
    rev = edges.map_batches(
        lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")}),
        batch_format="pyarrow",
    )
    # coalesce: und feeds every round's exchange, and Ray's sort-groupby
    # cost grows with BLOCK count (0.3s at 16 blocks vs 3.2s at 232 for
    # identical rows) — a 2x-union of a 64-block edge set would otherwise
    # drag 128 tiny blocks through every round
    if engine == "bsp":
        # stationary-partition BSP (stages/bsp.py): edges exchanged ONCE
        # into pinned hash partitions; per round only the O(nodes) label
        # table moves.  Same semantics (min-label + pointer jump, exact
        # label-sum convergence test) as the Dataset path below.
        from .bsp import connected_components_bsp

        und_lazy = fwd.union(rev)
        labels_ds, rounds = connected_components_bsp(
            und_lazy, num_parts=16, max_rounds=max_rounds)
        try:
            from ..state.counters import incr

            incr({"cc_rounds": rounds})
        except Exception:
            pass
        return labels_ds

    und = _solid(fwd.union(rev).map_batches(
        lambda t: t, batch_format="pyarrow", batch_size=16384))

    from .exchange import exchange_agg, exchange_join

    # initial labels: distinct node ids, self-labeled.  exchange_agg
    # distinct (arrow group_by per partition) — Ray's groupby().count()
    # reduces per key in Python (3.3s vs 0.5s at 120k nodes)
    labels = _solid(
        exchange_agg(und.select_columns(["src"]), "src", num_partitions=16)
        .map_batches(
            lambda t: pa.table(
                {"name_id": t.column("src"), "component": t.column("src")}
            ),
            batch_format="pyarrow",
        )
    )
    def _as(ds, mapping):
        """Column projection/rename via arrow rebuild — rename_columns
        interacts badly with the 2.49 join planner on some plans."""
        return ds.map_batches(
            lambda t, m=mapping: pa.table({new: t.column(old) for old, new in m}),
            batch_format="pyarrow",
        )

    def _label_sum(lbl: rd.Dataset) -> int:
        """Exact arbitrary-precision sum of labels (one tiny partial row per
        batch; Dataset.sum overflows int64 — 63-bit ids x 10^5 rows)."""

        def part(t: pa.Table) -> pa.Table:
            s = sum(t.column("component").to_pylist())
            return pa.table({"s": pa.array([str(s)], pa.string())})

        rows = lbl.map_batches(part, batch_format="pyarrow").take_all()
        return sum(int(r["s"]) for r in rows)

    _S_EDGE = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    _S_LBL_SRC = pa.schema([("src", pa.int64()), ("component", pa.int64())])
    _S_C1 = pa.schema([("name_id", pa.int64()), ("c1", pa.int64())])
    _S_C1C2 = pa.schema([("c1", pa.int64()), ("c2", pa.int64())])

    prev_sum = None
    converged = False
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # BOTH shrink moves ride in ONE executor plan per round — exchange
        # joins are plain tasks (no JoinOperator actor pool), so two of
        # them plus the groupby-min fuse safely at any CPU budget.
        # Neighbor propagation: component(x) <= min over neighbors.
        msgs = _as(
            exchange_join(
                und,
                _as(labels, [("name_id", "src"), ("component", "component")]),
                on="src", num_partitions=16,
                left_schema=_S_EDGE, right_schema=_S_LBL_SRC,
            ),
            [("dst", "name_id"), ("component", "component")],
        )
        # Pointer jump: (x, c) joined to (c, c') -> (x, c').  Every label
        # value is a node id, so the inner self-join is total; c' <= c by
        # the min invariant, so this only shrinks labels.
        ptr = _as(
            exchange_join(
                _as(labels, [("name_id", "name_id"), ("component", "c1")]),
                _as(labels, [("name_id", "c1"), ("component", "c2")]),
                on="c1", num_partitions=16,
                left_schema=_S_C1, right_schema=_S_C1C2,
            ),
            [("name_id", "name_id"), ("c2", "component")],
        )
        # one hash exchange + per-partition arrow group_by min — NOT
        # Ray's Aggregate (per-key Python: 5.0s vs 0.85s per round at
        # 120k keys, measured)
        labels = _solid(
            exchange_agg(
                labels.union(msgs).union(ptr),
                "name_id", [("component", "min")], num_partitions=16,
            )
        )
        # stop test: a stable sum under the COMBINED update means the
        # propagation alone changed nothing, which (und is symmetric)
        # forces labels equal across every edge — uniform per component,
        # the global fixed point.
        cur = _label_sum(labels)
        if prev_sum is not None and cur == prev_sum:
            converged = True
            break
        prev_sum = cur
    try:
        from ..state.counters import incr

        incr({"cc_rounds": rounds})
    except Exception:
        pass
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} rounds "
            "(a component's diameter exceeds the round budget); raise max_rounds"
        )
    return labels



def canonicalize_local(surface_list: list[str], *, num_perm: int = DEFAULT_NUM_PERM,
                       bands: int = DEFAULT_BANDS, tau: float = DEFAULT_TAU,
                       max_bucket: int = DEFAULT_MAX_BUCKET) -> dict[str, str]:
    """Driver-local canonicalization of a SMALL distinct-surface list.

    Same LSH blocking + union-find semantics as ``canonicalize_surfaces``
    (identical bands/thresholds; the distributed path ADDITIONALLY
    prunes candidates whose b-bit sketch agreement falls below tau-0.2
    — a wide-margin estimate whose false-prune rate is vanishingly
    small but not zero, so pairs within one ulp of the threshold are
    not bit-contracted to agree across the paths; same-norm pairs are
    exact on BOTH paths via the dedicated pass); used by the pipeline
    when the distinct-surface set fits comfortably on the driver — the
    broadcast-small-side analogue of the distributed path.  Returns only
    the surfaces whose canonical differs.
    """
    from collections import defaultdict

    norms = {sfc: _norm(sfc) for sfc in surface_list}
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    ordered = sorted(surface_list)
    for idx, sfc in enumerate(ordered):
        sig = minhash_signature(char_shingles(norms[sfc]), num_perm=num_perm)
        for bi, bh in enumerate(band_keys(sig, bands)):
            buckets[(bi, bh)].append(idx)
    parent = list(range(len(ordered)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    shingle_cache: dict[int, set] = {}

    def sh(i):
        if i not in shingle_cache:
            shingle_cache[i] = char_shingles(norms[ordered[i]])
        return shingle_cache[i]

    # EXACT same-norm unification first, independent of bucket caps: a
    # head entity with >max_bucket identical-norm spellings saturates
    # every band bucket (identical signatures), so the LSH loop below
    # would skip all of them — the documented still-unified guarantee
    # needs this dedicated O(n) pass (review r5)
    by_norm: dict[str, int] = {}
    for idx in range(len(ordered)):
        nrm = norms[ordered[idx]]
        first = by_norm.setdefault(nrm, idx)
        if first != idx:
            union(first, idx)

    for members in buckets.values():
        members = sorted(set(members))
        if len(members) < 2 or len(members) > max_bucket:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if norms[ordered[a]] == norms[ordered[b]] or jaccard(sh(a), sh(b)) >= tau:
                    union(a, b)
    comp_min: dict[int, str] = {}
    for i in range(len(ordered)):
        r = find(i)
        cur = comp_min.get(r)
        if cur is None or ordered[i] < cur:
            comp_min[r] = ordered[i]
    return {
        ordered[i]: comp_min[find(i)]
        for i in range(len(ordered))
        if comp_min[find(i)] != ordered[i]
    }


def canonicalize_surfaces(
    surfaces: rd.Dataset,
    *,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    tau: float = DEFAULT_TAU,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    cc_driver_threshold: int = DRIVER_UNION_FIND_THRESHOLD,
) -> rd.Dataset:
    """(surface) -> (surface, canonical) mapping dataset.

    ``surfaces`` must have a ``surface`` string column (distinct values).
    """
    def assign_ids(t: pa.Table) -> pa.Table:
        from hashlib import blake2b

        return pa.table({
            "surface": t.column("surface"),
            "name_id": pa.array(
                [int.from_bytes(
                    blake2b(s.encode("utf-8"), digest_size=8).digest(),
                    "little") >> 1
                 for s in t.column("surface").to_pylist()],
                pa.int64()),
        })

    ids = surfaces.map_batches(assign_ids,
                               batch_format="pyarrow").materialize()

    # 63-bit id collision guard: a digest collision would silently merge
    # two unrelated surfaces into one component corpus-wide (birthday
    # bound ~5% at 1e9 distinct surfaces), so the distinct-id count is
    # checked against the distinct-surface contract before clustering
    from .exchange import exchange_agg, exchange_join

    n_surfaces = ids.count()
    n_ids = exchange_agg(
        ids.map_batches(lambda t: pa.table({"name_id": t.column("name_id")}),
                        batch_format="pyarrow"),
        "name_id", [], num_partitions=16).count()
    if n_ids != n_surfaces:
        raise RuntimeError(
            f"canonicalize_surfaces: {n_surfaces - n_ids} 63-bit name_id "
            "collisions detected — raise the digest size (two unrelated "
            "surfaces would silently share a canonical form)")

    # payload-free LSH pair generation (stages/dedup.py machinery): the band
    # exchange carries only (shard, band, hash, name_id); surfaces are
    # re-read for the (tiny) candidate set in the verify stage
    from .dedup import _pairs_from_buckets

    from .dedup import _minhash_bands_feat_batch

    pairs = _pairs_from_buckets(
        ids,
        None,
        _surface_verify_fn(tau),
        "name_id",
        "surface",
        max_bucket=max_bucket,
        prepare_fn=_surface_prepare,
        # generous margin: surfaces are short (small shingle sets -> noisier
        # estimates) and baseline name-name similarity is low, so a loose
        # prune still kills shared-shingle bucket blowups without recall risk
        prune_est=max(0.0, tau - 0.2),
        # batch-vectorized signatures: per-surface outer-product dispatch
        # dominates on short payloads
        bands_feat_batch_fn=_minhash_bands_feat_batch(
            lambda s: char_shingles(_norm(s)), num_perm, bands
        ),
        # head-surface skew guard stays; dropped volume visible via
        # canon_skipped_* counters.  Exact-duplicate recall does NOT
        # depend on it: the same-norm edge pass below unifies identical
        # norms directly (identical signatures saturate EVERY band
        # bucket, so a >max_bucket group would otherwise never pair —
        # review r5)
        counter_prefix="canon",
    )

    # exact same-norm edges: min name_id per norm (one combiner-backed
    # exchange over short strings), members joined back, edge to the
    # group min for every non-min member — O(n), no quadratic explode,
    # immune to bucket caps
    nm = ids.map_batches(
        lambda t: pa.table({
            "norm": pa.array([_norm(s) for s in
                              t.column("surface").to_pylist()],
                             pa.string()),
            "name_id": t.column("name_id")}),
        batch_format="pyarrow")
    nmin = exchange_agg(nm, "norm", [("name_id", "min", "root")],
                        num_partitions=16)
    nsch = pa.schema([("norm", pa.string()), ("name_id", pa.int64())])
    njoin = exchange_join(
        nm, nmin, on="norm", num_partitions=16,
        left_schema=nsch,
        right_schema=pa.schema([("norm", pa.string()),
                                ("root", pa.int64())]))
    norm_edges = njoin.map_batches(
        lambda t: (lambda f: pa.table({"src": f.column("name_id"),
                                       "dst": f.column("root")}))(
            t.filter(pc.invert(pc.equal(t.column("name_id"),
                                        t.column("root"))))),
        batch_format="pyarrow")

    edges = pairs.map_batches(
        lambda t: pa.table({"src": t.column("id_a"), "dst": t.column("id_b")}),
        batch_format="pyarrow",
    ).union(norm_edges).materialize()

    if edges.count() == 0:
        return ids.map_batches(
            lambda t: pa.table(
                {"surface": t.column("surface"), "canonical": t.column("surface")}
            ),
            batch_format="pyarrow",
        )

    # connected_components already returns a materialized (or from_arrow)
    # labels table; ids was materialized above — both join sides are solid
    # without further barriers
    comp = connected_components(edges, driver_threshold=cc_driver_threshold)
    from .exchange import exchange_agg, exchange_join

    _S_IDS = pa.schema([("surface", pa.string()), ("name_id", pa.int64())])
    _S_COMP = pa.schema([("name_id", pa.int64()), ("component", pa.int64())])
    _S_WC = pa.schema([("surface", pa.string()), ("component", pa.int64())])
    _S_CANON = pa.schema([("component", pa.int64()),
                          ("canonical", pa.string())])
    # attach component to every (name_id, surface); nodes without edges
    # keep themselves (fill_null with own id).  Materialized ONCE — it
    # feeds both the per-component canonical-pick reduce and the final
    # application join.  All three tail steps run as exchange joins /
    # arrow-reduce aggs (plain tasks, vectorized across keys) — the
    # native JoinOperator + Aggregate tail measured 3.5 + 3.4 + 2.2s at
    # 120k surfaces; this shape runs it in ~1.5s total.
    with_comp = _solid(
        exchange_join(
            ids, comp, on="name_id", how="left_outer", num_partitions=16,
            left_schema=_S_IDS, right_schema=_S_COMP,
        ).map_batches(
            lambda t: pa.table(
                {
                    "surface": t.column("surface"),
                    "component": pc.coalesce(
                        t.column("component"), t.column("name_id")),
                }
            ),
            batch_format="pyarrow",
        )
    )
    canon = exchange_agg(
        with_comp, "component", [("surface", "min", "canonical")],
        num_partitions=16)
    return exchange_join(
        with_comp, canon, on="component", num_partitions=16,
        left_schema=_S_WC, right_schema=_S_CANON,
    ).select_columns(["surface", "canonical"])


def apply_canonical_map(triples: rd.Dataset, mapping: dict[str, str]) -> rd.Dataset:
    """Rewrite subj/obj through a broadcast canonical map (ray.put'd dict).

    At bench scale the mapping is small (distinct surfaces << triples) so a
    broadcast lookup beats a shuffle join; at 10^12 scale swap this for a
    hash-partitioned join on (surface) — same output contract.
    """
    import ray

    map_ref = ray.put(mapping)
    def rewrite(batch: pa.Table) -> pa.Table:
        # task mode via the per-worker object cache (a closure dict is
        # re-pickled EMPTY for every task — dedup._WORKER_OBJ_CACHE's
        # documented measurement; a class here would become an actor
        # pool and cap the parallelism of every fused stage)
        from .dedup import _worker_obj_cache

        m = _worker_obj_cache(map_ref)
        subj = [m.get(s, s) for s in batch.column("subj").to_pylist()]
        objs = batch.column("obj").to_pylist()
        obj_types = batch.column("obj_type").to_pylist()
        obj = [m.get(o, o) if ot else o for o, ot in zip(objs, obj_types)]
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["subj"] = pa.array(subj, pa.string())
        cols["obj"] = pa.array(obj, pa.string())
        slug, lower = _subject_norm_columns(subj)
        cols["subj_slug"] = slug
        cols["subj_lower"] = lower
        return pa.table(cols)

    return triples.map_batches(rewrite, batch_format="pyarrow")


def _subject_norm_columns(subj: list) -> tuple[pa.Array, pa.Array]:
    """(subj_slug, subj_lower) columns computed per DISTINCT subject —
    subjects repeat heavily across a document's triples, so the slug
    kernels run once per distinct value, not once per row."""
    from ..kernels.normalize import normalize_docred_subject, normalize_entity_name

    cache: dict[str, tuple[str, str]] = {}
    slugs, lowers = [], []
    for s in subj:
        v = cache.get(s)
        if v is None:
            v = cache[s] = (normalize_entity_name(s), normalize_docred_subject(s))
        slugs.append(v[0])
        lowers.append(v[1])
    return pa.array(slugs, pa.string()), pa.array(lowers, pa.string())


def apply_canonical_join(
    triples: rd.Dataset, cmap: rd.Dataset, num_partitions: int = 16
) -> rd.Dataset:
    """Rewrite subj/obj through a (surface, canonical) mapping DATASET via
    hash-partitioned left joins — the at-scale form of
    ``apply_canonical_map`` (same output contract) for mappings too large
    to broadcast.  ``cmap`` needs only the CHANGED surfaces (surface !=
    canonical); unmatched rows keep their surface.

    Both joins run as chained ``exchange_join``s (plain tasks, no
    JoinOperator actor pools) with schemas passed through, so the two
    rewrites and the final column surgery fuse into ONE executor plan
    with no materialization barrier."""
    from .exchange import exchange_join, join_out_schema

    def rename(key: str, ccol: str) -> tuple[rd.Dataset, pa.Schema]:
        side = cmap.map_batches(
            lambda t, key=key, ccol=ccol: pa.table(
                {key: t.column("surface").cast(pa.string()),
                 ccol: t.column("canonical").cast(pa.string())}
            ),
            batch_format="pyarrow",
        )
        return side, pa.schema([(key, pa.string()), (ccol, pa.string())])

    t_schema = triples.schema()
    ts = pa.schema(list(zip(t_schema.names, t_schema.types)))
    subj_side, subj_schema = rename("subj", "subj_canon")
    obj_side, obj_schema = rename("obj", "obj_canon")
    j1 = exchange_join(
        triples, subj_side, on="subj", how="left_outer",
        num_partitions=num_partitions,
        left_schema=ts, right_schema=subj_schema,
    )
    joined = exchange_join(
        j1, obj_side, on="obj", how="left_outer",
        num_partitions=num_partitions,
        left_schema=join_out_schema(ts, subj_schema, "subj"),
        right_schema=obj_schema,
    )

    def rewrite(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        subj = pc.fill_null(batch.column("subj_canon"), batch.column("subj"))
        is_ent = pc.invert(pc.equal(batch.column("obj_type"), ""))
        obj = pc.if_else(
            pc.and_(is_ent, pc.is_valid(batch.column("obj_canon"))),
            batch.column("obj_canon"), batch.column("obj"),
        )
        cols = {
            name: batch.column(name)
            for name in batch.column_names
            if name not in ("subj_canon", "obj_canon")
        }
        cols["subj"] = subj
        cols["obj"] = obj
        slug, lower = _subject_norm_columns(subj.to_pylist())
        cols["subj_slug"] = slug
        cols["subj_lower"] = lower
        return pa.table(cols)

    return joined.map_batches(rewrite, batch_format="pyarrow")


_PACK_SEP = "\x1f"


#: dedup_triples output schema (unpack's column layout) — used for the
#: typed empty-input result
_DEDUP_OUT_SCHEMA = pa.schema([
    ("url", pa.string()), ("subj", pa.string()),
    ("subj_slug", pa.string()), ("subj_lower", pa.string()),
    ("pred", pa.string()), ("pred_key", pa.string()),
    ("obj", pa.string()), ("subj_type", pa.string()),
    ("obj_type", pa.string()), ("nested_in", pa.string()),
    ("chunk_id", pa.int32()), ("span_start", pa.int64()),
    ("span_end", pa.int64()), ("method", pa.string()),
    ("subj_uri", pa.string()), ("subj_link_conf", pa.float64()),
    ("obj_uri", pa.string()), ("obj_link_conf", pa.float64()),
    ("confidence", pa.float64()), ("valid", pa.bool_()),
])


def dedup_triples(triples: rd.Dataset, salt: int = 16,
                  engine: str = "tasks") -> rd.Dataset:
    """Global exact (subj, pred, obj) dedup — the final canonical shuffle
    (HashSet semantics of integration_tests.rs:70, A3 in SURVEY.md).

    Two-phase and fully vectorized (pyarrow kernels, no per-row Python —
    this is the one stage every triple of a 100-TB run passes through):
    1. map_batches combiner: pack all provenance columns into ONE
       lexicographically-sortable string (url first, then zero-padded
       chunk/span) with ``pc.binary_join_element_wise``; collapse
       within-batch duplicates with an arrow ``group_by(...).min``.  This
       absorbs head-entity skew before the exchange.
    2. salted partial aggregation groupby((subj, pred, obj, salt)) with
       salt = fnv(url) % S: a globally-hot key is spread across S reducers.
    3. unsalted final merge groupby((subj, pred, obj)) over <= salt rows
       per key.  Grouping on the REAL key columns (not a 64-bit digest)
       makes a key collision impossible at any scale.  Min of the packed
       string selects a CONSISTENT representative row (deterministic
       first-by-(url, chunk, span)); Min is associative and commutative, so
       the salted two-phase result is exactly the single-phase result.
    4. map_batches: unpack provenance back into columns (vectorized
       split_pattern + list_element + casts).
    """
    import pyarrow.compute as pc

    from ..kernels.minhash import _hash_shingles

    P = 64  # reduce partitions per phase

    def pack(batch: pa.Table) -> pa.Table:
        n = len(batch)
        names = set(batch.column_names)

        def col(name, default=None, typ=pa.string()):
            if name in names:
                return batch.column(name)
            return pa.array([default] * n, typ)

        def s(arr) -> pa.ChunkedArray:
            return pc.cast(arr, pa.string())

        def pad(arr, width):
            return pc.utf8_lpad(s(arr), width=width, padding="0")

        # string defaults are "" — a null column element would null the
        # ENTIRE packed prov via binary_join_element_wise, silently
        # erasing every row's provenance when one optional column is
        # absent (review r5)
        prov = pc.binary_join_element_wise(
            col("url", ""),
            pad(col("chunk_id", 0, pa.int32()), 8),
            pad(col("span_start", 0, pa.int64()), 10),
            pad(col("span_end", 0, pa.int64()), 10),
            col("method", ""),
            col("nested_in", ""),
            col("subj_type", ""),
            col("obj_type", ""),
            pc.fill_null(col("subj_uri"), ""),
            s(col("subj_link_conf", 0.0, pa.float64())),
            pc.fill_null(col("obj_uri"), ""),
            s(col("obj_link_conf", 0.0, pa.float64())),
            s(col("confidence", 0.0, pa.float64())),
            pc.if_else(col("valid", True, pa.bool_()), pa.scalar("1"), pa.scalar("0")),
            col("subj_slug", ""),
            col("subj_lower", ""),
            col("pred_key", ""),
            _PACK_SEP,
        )
        # salt = fnv(url) % S: a globally-hot (s,p,o) spreads over S
        # reducers in phase 1 (SURVEY.md §4.2 skew handling); the salt only
        # exists in the partial-agg phase and is dropped by phase 2
        salts = (_hash_shingles(
            [u if u is not None else ""
             for u in col("url", "").to_pylist()])
            % np.uint64(salt)).astype(np.int32)
        tbl = pa.table(
            {
                "subj": batch.column("subj"),
                "pred": batch.column("pred"),
                "obj": batch.column("obj"),
                "salt": pa.array(salts, pa.int32()),
                "prov": prov,
            }
        )
        # within-batch combiner: keep min prov per (spo, salt)
        g = tbl.group_by(["subj", "pred", "obj", "salt"]).aggregate([("prov", "min")])
        # partition keys: p1 spreads a hot spo over `salt` reducers (phase 1),
        # p2 co-locates all of a spo's <= salt survivors (phase 2)
        spo = pc.binary_join_element_wise(
            g.column("subj"), g.column("pred"), g.column("obj"), "\x00"
        )
        spo_h = _hash_shingles(spo.to_pylist())
        salt_np = g.column("salt").to_numpy(zero_copy_only=False).astype(np.uint64)
        p1 = ((spo_h * np.uint64(0x9E3779B97F4A7C15)) ^ salt_np) % np.uint64(P)
        p2 = spo_h % np.uint64(P)
        return pa.table(
            {
                "subj": g.column("subj"),
                "pred": g.column("pred"),
                "obj": g.column("obj"),
                "salt": g.column("salt"),
                "prov": g.column("prov_min"),
                "p1": pa.array(p1.astype(np.int32), pa.int32()),
                "p2": pa.array(p2.astype(np.int32), pa.int32()),
            }
        )

    def unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("prov"), pattern=_PACK_SEP)

        def f(i):
            return pc.list_element(parts, i)

        def fint(i, typ):
            return pc.cast(f(i), typ)

        def ffloat(i):
            return pc.cast(f(i), pa.float64())

        def fnullable(i):
            v = f(i)
            return pc.if_else(pc.equal(v, ""), pa.scalar(None, pa.string()), v)

        return pa.table(
            {
                "url": f(0),
                "subj": batch.column("subj"),
                "subj_slug": f(14),
                "subj_lower": f(15),
                "pred": batch.column("pred"),
                "pred_key": f(16),
                "obj": batch.column("obj"),
                "subj_type": f(6),
                "obj_type": f(7),
                "nested_in": f(5),
                "chunk_id": fint(1, pa.int32()),
                "span_start": fint(2, pa.int64()),
                "span_end": fint(3, pa.int64()),
                "method": f(4),
                "subj_uri": fnullable(8),
                "subj_link_conf": ffloat(9),
                "obj_uri": fnullable(10),
                "obj_link_conf": ffloat(11),
                "confidence": ffloat(12),
                "valid": pc.equal(f(13), "1"),
            }
        )

    # phase 1: salted partial aggregation (hot keys spread over `salt`
    # reducers); phase 2: unsalted final merge over <= salt rows per key.
    # Large combiner batches both strengthen the pre-aggregation (dup factor
    # compounds across input blocks) and coalesce many small upstream blocks
    # so the shuffle fan is O(data/64k), not O(upstream task count).  Each
    # phase is a hash-partition exchange (single int key) with the reduce
    # itself a VECTORIZED arrow group_by inside map_groups — Ray's built-in
    # Aggregate reduces per key in Python and is ~50x slower here.
    def reduce1(g: pa.Table) -> pa.Table:
        r = g.group_by(["subj", "pred", "obj", "salt"]).aggregate(
            [("prov", "min"), ("p2", "min")]
        )
        return pa.table(
            {
                "subj": r.column("subj"),
                "pred": r.column("pred"),
                "obj": r.column("obj"),
                "prov": r.column("prov_min"),
                "p2": r.column("p2_min"),
            }
        )

    def reduce2(g: pa.Table) -> pa.Table:
        r = g.group_by(["subj", "pred", "obj"]).aggregate([("prov", "min")])
        return pa.table(
            {
                "subj": r.column("subj"),
                "pred": r.column("pred"),
                "obj": r.column("obj"),
                "prov": r.column("prov_min"),
            }
        )

    if engine == "tasks":
        # raw-task two-phase exchange (stages/bsp.py): same shuffle
        # volume and identical output set, none of the two sort-based
        # all-to-all operators' ~1.5s-each fixed cost — this tail is on
        # the headline path, where that cost neither shrinks with CPUs
        # nor with data (measured: dedup 4.8-8.3s Dataset form vs ~1.5s
        # task form at 663k rows, 16 CPUs)
        from .bsp import two_phase_reduce

        packed = triples.map_batches(pack, batch_format="pyarrow",
                                     batch_size=65536).materialize()
        if packed.count() == 0:
            # zero-block/zero-row input: empty result, not
            # two_phase_reduce's empty-input ValueError (review r5)
            return rd.from_arrow(_DEDUP_OUT_SCHEMA.empty_table())
        agg = two_phase_reduce(packed, "p1", "p2", reduce1, reduce2,
                               num_parts=32)
    else:
        agg = (
            triples.map_batches(pack, batch_format="pyarrow", batch_size=65536)
            .groupby("p1")
            .map_groups(reduce1, batch_format="pyarrow")
            .groupby("p2")
            .map_groups(reduce2, batch_format="pyarrow")
        )
    return agg.map_batches(unpack, batch_format="pyarrow")
