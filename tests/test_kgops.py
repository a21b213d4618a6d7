"""Tests for stages/kgops.py: BGP matching and majority-vote fusion."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from text_to_rdf_ray.stages.kgops import bgp_match, majority_vote


def _triples():
    rows = [
        ("alice", "located_in", "paris"),
        ("bob", "located_in", "paris"),
        ("carol", "located_in", "berlin"),
        ("paris", "part_of", "france"),
        ("berlin", "part_of", "germany"),
        ("france", "named", "France"),
        ("germany", "named", "Germany"),
        ("alice", "knows", "bob"),
        ("bob", "knows", "alice"),
        ("carol", "knows", "carol"),
        # duplicate triple: distinct semantics must collapse it
        ("alice", "located_in", "paris"),
    ]
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(3)


def test_bgp_two_hop_chain(ray_session):
    out = bgp_match(_triples(), [
        ("?p", "located_in", "?city"),
        ("?city", "part_of", "?country"),
        ("?country", "named", "France"),
    ]).to_pandas().sort_values("p").reset_index(drop=True)
    assert set(out.columns) == {"p", "city", "country"}
    assert out["p"].tolist() == ["alice", "bob"]
    assert out["city"].unique().tolist() == ["paris"]
    assert out["country"].unique().tolist() == ["france"]


def test_bgp_distinct_vs_bag(ray_session):
    pat = [("?p", "located_in", "paris")]
    d = bgp_match(_triples(), pat).to_pandas()
    assert sorted(d["p"]) == ["alice", "bob"]
    bag = bgp_match(_triples(), pat, distinct=False).to_pandas()
    assert sorted(bag["p"]) == ["alice", "alice", "bob"]


def test_bgp_repeated_var_within_pattern(ray_session):
    out = bgp_match(_triples(), [("?x", "knows", "?x")]).to_pandas()
    assert out["x"].tolist() == ["carol"]


def test_bgp_var_in_predicate_position(ray_session):
    out = (bgp_match(_triples(), [("alice", "?rel", "?o")])
           .to_pandas().sort_values(["rel", "o"]).reset_index(drop=True))
    assert list(map(tuple, out[["rel", "o"]].to_numpy())) == [
        ("knows", "bob"), ("located_in", "paris")]


def test_bgp_refuses_cartesian(ray_session):
    with pytest.raises(ValueError, match="Cartesian"):
        bgp_match(_triples(), [("?a", "knows", "?b"),
                               ("?c", "part_of", "?d")])


def test_majority_vote_winner_ties_and_totals(ray_session):
    claims = pd.DataFrame({
        "subj": ["e1"] * 5 + ["e2"] * 2 + ["e3"],
        "pred": ["born"] * 5 + ["born"] * 2 + ["born"],
        "obj": ["1950", "1950", "1951", "1950", "1951",  # e1: 3 vs 2
                "b", "a",                                # e2: tie -> "a"
                "solo"],                                 # e3: single claim
    })
    ds = rd.from_pandas(claims).repartition(4)
    out = (majority_vote(ds, key_cols=["subj", "pred"], value_col="obj")
           .to_pandas().sort_values("subj").reset_index(drop=True))
    assert list(map(tuple, out[["subj", "obj", "support", "n_claims"]]
                    .to_numpy())) == [
        ("e1", "1950", 3, 5), ("e2", "a", 1, 2), ("e3", "solo", 1, 1)]


def test_ontology_closure_dag_and_cycle():
    from text_to_rdf_ray.stages.kgops import ontology_closure

    onto = [("Airport", "CivicStructure"), ("CivicStructure", "Place"),
            ("Place", "Thing"), ("EducationalOrganization", "Organization"),
            ("EducationalOrganization", "CivicStructure"),
            ("Organization", "Thing")]
    c = ontology_closure(onto)
    got = set(map(tuple, c.to_numpy()))
    assert ("Airport", "Thing") in got
    assert ("EducationalOrganization", "Place") in got
    assert ("EducationalOrganization", "Thing") in got
    assert ("Thing", "Airport") not in got
    # a cycle terminates and closes both ways, no self pairs
    cyc = ontology_closure([("A", "B"), ("B", "A")])
    assert set(map(tuple, cyc.to_numpy())) == {("A", "B"), ("B", "A")}


def test_type_inference_asserted_wins(ray_session):
    from text_to_rdf_ray.stages.kgops import type_inference

    onto = [("Airport", "Place"), ("Place", "Thing")]
    ds = rd.from_pandas(pd.DataFrame({
        "entity": ["lax", "lax", "paris"],
        # lax asserts both Airport and (redundantly derivable) Place
        "type": ["Airport", "Place", "Place"],
    })).repartition(2)
    out = (type_inference(ds, onto).to_pandas()
           .sort_values(["entity", "type"]).reset_index(drop=True))
    rows = set(map(tuple, out[["entity", "type", "inferred"]].to_numpy()))
    assert rows == {
        ("lax", "Airport", False),
        ("lax", "Place", False),      # asserted beats inferred duplicate
        ("lax", "Thing", True),
        ("paris", "Place", False),
        ("paris", "Thing", True),
    }


def test_random_walks_match_local_reference(ray_session):
    from text_to_rdf_ray.stages.analytics import splitmix64
    from text_to_rdf_ray.stages.graph import random_walks
    import numpy as np

    rng_edges = [(i, (i * 3 + j) % 9 + 10) for i in range(9) for j in range(3)]
    edges = pd.DataFrame(rng_edges, columns=["src", "dst"])
    # bounce-back edges so walks of length 3 never die
    back = edges.rename(columns={"src": "dst", "dst": "src"})
    all_e = pd.concat([edges, back], ignore_index=True)
    starts = pd.DataFrame({"node": list(range(9))})
    out = random_walks(
        rd.from_pandas(all_e).repartition(4),
        rd.from_pandas(starts).repartition(2),
        walk_len=3, seed=7,
    ).to_pandas().sort_values(["start", "step"]).reset_index(drop=True)

    adj = {}
    for s, dd in sorted(set(map(tuple, all_e.to_numpy()))):
        adj.setdefault(s, []).append(dd)
    for s0 in starts["node"]:
        cur = s0
        for step in range(3):
            nbrs = adj[cur]
            z = np.uint64(np.int64(cur)) * np.uint64(1000003) + np.uint64(
                step * 7919 + 7)
            # NB: % must stay in uint64 (uint64 % python-int promotes to
            # float64 and rounds the 64-bit hash)
            cur = nbrs[int(splitmix64(np.array([z], dtype=np.uint64))[0]
                           % np.uint64(len(nbrs)))]
            row = out[(out["start"] == s0) & (out["step"] == step + 1)]
            assert row["node"].tolist() == [cur], (s0, step)
    assert len(out) == 9 * 4


def test_random_walks_truncate_at_sink(ray_session):
    from text_to_rdf_ray.stages.graph import random_walks

    e = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})  # 3 is a sink
    out = random_walks(rd.from_pandas(e),
                       rd.from_pandas(pd.DataFrame({"node": [1]})),
                       walk_len=5, seed=0).to_pandas()
    assert (out.sort_values("step")[["step", "node"]].to_numpy().tolist()
            == [[0, 1], [1, 2], [2, 3]])


def test_random_walks_tier_parity(ray_session):
    from text_to_rdf_ray.stages.graph import random_walks

    rng_edges = [(i, (i * 5 + j) % 20 + 100) for i in range(20)
                 for j in range(4)]
    e = pd.DataFrame(rng_edges, columns=["src", "dst"])
    back = e.rename(columns={"src": "dst", "dst": "src"})
    all_e = pd.concat([e, back], ignore_index=True)
    starts = pd.DataFrame({"node": list(range(20))})

    kw = dict(walk_len=3, seed=13)
    a = (random_walks(rd.from_pandas(all_e).repartition(4),
                      rd.from_pandas(starts), **kw)
         .to_pandas().sort_values(["start", "step"])
         .reset_index(drop=True))
    b = (random_walks(rd.from_pandas(all_e).repartition(4),
                      rd.from_pandas(starts),
                      max_broadcast_frontier=0, **kw)  # force exchange tier
         .to_pandas().sort_values(["start", "step"])
         .reset_index(drop=True))
    assert a[["start", "step", "node"]].to_numpy().tolist() == \
        b[["start", "step", "node"]].to_numpy().tolist()


def test_clustering_prf_matches_manual_pair_counts(ray_session):
    from text_to_rdf_ray.stages.kgops import clustering_prf

    # gold: {1,2,3} {4,5} {6}; pred: {1,2} {3,4} {5} {6}
    gold = pd.DataFrame({"id": [1, 2, 3, 4, 5, 6],
                         "cluster": ["a", "a", "a", "b", "b", "c"]})
    pred = pd.DataFrame({"id": [1, 2, 3, 4, 5, 6],
                         "cluster": ["x", "x", "y", "y", "z", "w"]})
    out = clustering_prf(rd.from_pandas(pred).repartition(2),
                         rd.from_pandas(gold).repartition(3)).to_pandas()
    r = out.iloc[0]
    # pred pairs: (1,2),(3,4) = 2 ; gold pairs: C(3,2)+C(2,2)=3+1=4
    # both: (1,2) only -> P=1/2, R=1/4
    assert (r["pred_pairs"], r["gold_pairs"], r["both_pairs"]) == (2, 4, 1)
    assert r["precision"] == 0.5 and r["recall"] == 0.25
    assert abs(r["f1"] - (2 * 0.5 * 0.25 / 0.75)) < 1e-12

    # perfect prediction: P = R = F1 = 1
    perfect = clustering_prf(rd.from_pandas(gold),
                             rd.from_pandas(gold)).to_pandas().iloc[0]
    assert perfect["precision"] == 1.0 and perfect["recall"] == 1.0


def test_majority_vote_random_parity_vs_pandas(ray_session):
    import numpy as np

    rng = np.random.RandomState(17)
    n = 4000
    df = pd.DataFrame({
        "k1": rng.randint(0, 120, n).astype(str),
        "k2": rng.choice(["p", "q", "r"], n),
        "val": rng.randint(0, 9, n).astype(str),
    })
    got = (majority_vote(rd.from_pandas(df).repartition(7),
                         key_cols=["k1", "k2"], value_col="val")
           .to_pandas().sort_values(["k1", "k2"])
           .reset_index(drop=True))

    def ref(g):
        c = g["val"].value_counts()
        top = c[c == c.max()].index.min()
        return pd.Series({"val": top, "support": int(c.max()),
                          "n_claims": int(len(g))})

    exp = (df.groupby(["k1", "k2"]).apply(ref, include_groups=False)
           .reset_index().sort_values(["k1", "k2"])
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for col in ("val", "support", "n_claims"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


def test_predicate_stats_counts(ray_session):
    import ray.data as rd

    from text_to_rdf_ray.stages.kgops import predicate_stats

    triples = rd.from_items([
        {"subj": "a", "pred": "knows", "obj": "b"},
        {"subj": "a", "pred": "knows", "obj": "c"},
        {"subj": "b", "pred": "knows", "obj": "c"},
        {"subj": "a", "pred": "named", "obj": "Alice"},
        {"subj": "b", "pred": "named", "obj": "Alice"},  # shared literal
    ])
    out = predicate_stats(triples).set_index("pred")
    assert out.loc["knows", "n_triples"] == 3
    assert out.loc["knows", "n_subj"] == 2
    assert out.loc["knows", "n_obj"] == 2
    assert out.loc["named", "n_triples"] == 2
    assert out.loc["named", "n_subj"] == 2
    assert out.loc["named", "n_obj"] == 1


def test_domain_range_check_flags_all_four_reasons(ray_session):
    import ray.data as rd

    from text_to_rdf_ray.stages.kgops import domain_range_check

    triples = rd.from_items([
        {"subj": "s1", "pred": "located_in", "obj": "n1"},   # ok
        {"subj": "s2", "pred": "located_in", "obj": "r1"},   # range_wrong
        {"subj": "s3", "pred": "located_in", "obj": "ghost"},  # range_missing
        {"subj": "r1", "pred": "part_of", "obj": "r2"},      # domain_wrong
        {"subj": "ghost2", "pred": "part_of", "obj": "r1"},  # domain_missing
        {"subj": "x", "pred": "unruled", "obj": "y"},        # pruned
    ])
    types = rd.from_items([
        {"entity": "s1", "type": "Supplier"},
        {"entity": "s2", "type": "Supplier"},
        {"entity": "s3", "type": "Supplier"},
        {"entity": "n1", "type": "Nation"},
        {"entity": "r1", "type": "Region"},
        {"entity": "r2", "type": "Region"},
    ])
    rules = [("located_in", None, "Nation"),
             ("part_of", "Nation", "Region")]
    out = (domain_range_check(triples, types, rules, num_partitions=4)
           .to_pandas())
    got = set(map(tuple, out[["subj", "reason"]].to_numpy()))
    assert got == {("s2", "range_wrong"), ("s3", "range_missing"),
                   ("r1", "domain_wrong"), ("ghost2", "domain_missing")}


def test_sameas_closure_chain_transitive(ray_session):
    import pandas as pd
    import ray.data as rd

    from text_to_rdf_ray.stages.kgops import sameas_closure

    triples = rd.from_pandas(pd.DataFrame({
        "subj": ["e1", "e2", "e3", "e9"],
        "pred": ["knows", "knows", "born_in", "type"],
        "obj": ["e2", "e3", "paris", "Person"],
    }))
    # chain e1-e2-e3: closure needs transitivity, canon = min = e1
    sameas = rd.from_pandas(pd.DataFrame({"a": ["e2", "e3"],
                                          "b": ["e1", "e2"]}))
    out = sameas_closure(triples, sameas).to_pandas()
    got = set(map(tuple, out[["subj", "pred", "obj"]].values))
    # e1->e2 and e2->e3 both rewrite to (e1 knows e1) and dedup to ONE
    assert got == {("e1", "born_in", "paris"), ("e1", "knows", "e1"),
                   ("e9", "type", "Person")}


def test_sameas_closure_untouched_without_edges(ray_session):
    import pandas as pd
    import ray.data as rd

    from text_to_rdf_ray.stages.kgops import sameas_closure

    triples = rd.from_pandas(pd.DataFrame({
        "subj": ["a", "a", "b"], "pred": ["p", "p", "q"],
        "obj": ["x", "x", "y"]}))
    sameas = rd.from_pandas(pd.DataFrame(
        {"a": ["zz"], "b": ["zz2"]}))  # classes disjoint from triples
    out = sameas_closure(triples, sameas).to_pandas()
    got = set(map(tuple, out[["subj", "pred", "obj"]].values))
    # identity rewrite, but exact duplicates still dedup
    assert got == {("a", "p", "x"), ("b", "q", "y")}


def test_bgp_optional_null_for_unmatched(ray_session):
    import pandas as pd
    import ray.data as rd

    from text_to_rdf_ray.stages.kgops import bgp_match_optional

    t = rd.from_pandas(pd.DataFrame({
        "subj": ["a", "b", "a"],
        "pred": ["type", "type", "named"],
        "obj": ["Person", "Person", "Alice"]}))
    out = bgp_match_optional(
        t, [("?e", "type", "Person")], [("?e", "named", "?name")]
    ).to_pandas().sort_values("e").reset_index(drop=True)
    assert out.e.tolist() == ["a", "b"]
    assert out.name.iloc[0] == "Alice"
    assert pd.isna(out.name.iloc[1])


def test_bgp_optional_refuses_cartesian(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from text_to_rdf_ray.stages.kgops import bgp_match_optional

    t = rd.from_pandas(pd.DataFrame({
        "subj": ["a"], "pred": ["type"], "obj": ["Person"]}))
    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match_optional(t, [("?e", "type", "Person")],
                           [("?x", "named", "?y")]).to_pandas()


def test_property_path_min_hops_cycle_and_pruning(ray_session):
    import pandas as pd

    import ray.data as rd
    from text_to_rdf_ray.stages.kgops import property_path

    # chain a->b->c->d plus cycle d->a; distractor predicate must vanish
    t = pd.DataFrame({
        "subj": ["a", "b", "c", "d", "a"],
        "pred": ["p", "p", "p", "p", "q"],
        "obj": ["b", "c", "d", "a", "zzz"],
    })
    out = (property_path(rd.from_pandas(t).repartition(2), "p",
                         max_hops=3)
           .to_pandas().set_index(["src", "dst"])["hops"].to_dict())
    assert out[("a", "b")] == 1 and out[("a", "c")] == 2
    assert out[("a", "d")] == 3
    assert out[("d", "c")] == 3  # through the cycle
    assert ("a", "zzz") not in out  # distractor predicate pruned
    # min-hop wins when a shorter path exists: add shortcut a->c
    t2 = pd.concat([t, pd.DataFrame({"subj": ["a"], "pred": ["p"],
                                     "obj": ["c"]})], ignore_index=True)
    out2 = (property_path(rd.from_pandas(t2), "p", max_hops=3)
            .to_pandas().set_index(["src", "dst"])["hops"].to_dict())
    assert out2[("a", "c")] == 1
    assert out2[("a", "d")] == 2


def test_cardinality_check_distinct_objects_only(ray_session):
    import pandas as pd

    import ray.data as rd
    from text_to_rdf_ray.stages.kgops import cardinality_check

    t = pd.DataFrame({
        "subj": ["s1", "s1", "s2", "s2", "s3", "s3"],
        "pred": ["f", "f", "f", "f", "g", "g"],
        "obj": ["x", "x", "x", "y", "u", "v"],
    })
    out = (cardinality_check(rd.from_pandas(t).repartition(2), ["f"])
           .to_pandas())
    # s1 asserts the same object twice -> not a violation;
    # s2 has two distinct objects -> violation; g is not audited
    assert len(out) == 1
    assert out.iloc[0]["subj"] == "s2"
    assert out.iloc[0]["n_objects"] == 2


def test_bgp_construct_rewrite_and_guards(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from text_to_rdf_ray.stages.kgops import bgp_construct

    tri = rd.from_pandas(pd.DataFrame({
        "subj": ["a", "b", "x", "x"],
        "pred": ["knows", "knows", "type", "type"],
        "obj": ["x", "x", "Person", "Person"]}))  # duplicate triple
    out = (bgp_construct(
        tri,
        [("?s", "knows", "?o"), ("?o", "type", "Person")],
        [("?o", "known_by", "?s"), ("?s", "linked", "?o")],
        num_partitions=4).to_pandas()
        .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    got = set(map(tuple, out.itertuples(index=False)))
    # DISTINCT set semantics despite the duplicated type triple
    assert got == {("x", "known_by", "a"), ("x", "known_by", "b"),
                   ("a", "linked", "x"), ("b", "linked", "x")}
    with pytest.raises(ValueError):
        bgp_construct(tri, [("?s", "knows", "?o")],
                      [("?s", "r", "?unbound")])
    with pytest.raises(ValueError):
        bgp_construct(tri, [("?s", "knows", "?o")], [])


def test_property_entailment_manual(ray_session):
    import pyarrow as pa

    from text_to_rdf_ray.stages.kgops import property_entailment

    # chain a->b->c->d (transitive follows), x peer_of y (symmetric),
    # precedes = inverse of the CLOSED follows
    triples = pa.table({
        "subj": pa.array(["a", "b", "c", "x"], pa.string()),
        "pred": pa.array(["follows", "follows", "follows", "peer_of"],
                         pa.string()),
        "obj": pa.array(["b", "c", "d", "y"], pa.string()),
    })
    out = (property_entailment(
        rd.from_arrow(triples), transitive=("follows",),
        symmetric=("peer_of",), inverse=(("follows", "precedes"),))
        .to_pandas())
    got = {(r.subj, r.pred, r.obj): bool(r.entailed)
           for r in out.itertuples()}
    # closure adds a->c, a->d, b->d (entailed); asserted stay False
    assert got[("a", "follows", "b")] is False
    assert got[("a", "follows", "c")] is True
    assert got[("a", "follows", "d")] is True
    assert got[("b", "follows", "d")] is True
    # symmetric
    assert got[("x", "peer_of", "y")] is False
    assert got[("y", "peer_of", "x")] is True
    # inverse mirrors the closure, not just asserted links
    assert got[("d", "precedes", "a")] is True
    assert got[("b", "precedes", "a")] is True
    # 4 asserted + 1 sym + 3 closure + 6 precedes = 14 rows
    assert len(out) == 14

    import pytest
    with pytest.raises(ValueError):
        property_entailment(rd.from_arrow(triples),
                            transitive=("q",),
                            inverse=(("p", "q"),))


def test_property_entailment_unconverged_raises(ray_session):
    """An iteration-budget exit without a fixpoint must raise, never
    return a silently incomplete closure (ADVICE r4)."""
    import pytest

    from text_to_rdf_ray.stages.kgops import property_entailment

    # chain of length 5 needs 3 doubling rounds; max_iters=1 cannot
    subj = [f"n{i}" for i in range(5)]
    obj = [f"n{i + 1}" for i in range(5)]
    t = rd.from_arrow(pa.table({
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(["part_of"] * 5, pa.string()),
        "obj": pa.array(obj, pa.string())}))
    with pytest.raises(RuntimeError, match="max_iters=1"):
        property_entailment(t, transitive=("part_of",),
                            max_iters=1).to_pandas()
    # and with enough rounds the same chain closes fine
    ok = property_entailment(t, transitive=("part_of",),
                             max_iters=4).to_pandas()
    assert len(ok) == 5 + 10  # asserted + C(5,2) entailed pairs
