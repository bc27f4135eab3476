"""Salted bucket pair enumeration: completeness across all three size tiers."""

from itertools import combinations

from spaczz_spark.operators.lsh import pairs_from_buckets


def test_salted_tiers_enumerate_exactly_the_small_and_mid_pairs(spark):
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
            df, bucket_cap=8, n_salt=4, star_cap=40
        ).collect()
    }

    expect = set()
    expect |= {tuple(sorted(p)) for p in combinations(range(100, 104), 2)}
    # mid tier: salted join must still produce ALL pairs
    expect |= {tuple(sorted(p)) for p in combinations(range(200, 230), 2)}
    # huge tier: star edges only (min member -> others)
    expect |= {(300, 300 + i) for i in range(1, 60)}

    assert got == expect


def test_duplicate_bucket_rows_do_not_duplicate_pairs(spark):
    df = spark.createDataFrame(
        [("b", 1), ("b", 2), ("c", 1), ("c", 2)], ["bucket_key", "file_id"]
    )
    out = pairs_from_buckets(df, bucket_cap=8).collect()
    assert [(r["a_id"], r["b_id"]) for r in out] == [(1, 2)]
