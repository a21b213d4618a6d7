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
