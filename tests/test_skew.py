"""Skew-salting helpers: correctness + no-hot-reducer plan shape."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 80/15/5 hot-key distribution, like the codec column
    return spark.range(0, 4000).select(
        F.when(F.col("id") % 100 < 80, "hot")
        .when(F.col("id") % 100 < 95, "warm")
        .otherwise("cold")
        .alias("k"),
        (F.col("id") % 700).alias("v"),
    )


def test_salted_distinct_count_exact(spark, skewed):
    from open_data_linter_spark.rules.skew import salted_distinct_count

    got = {r.k: r.distinct_count for r in salted_distinct_count(skewed, "k", "v").collect()}
    exact = {
        r.k: r.d
        for r in skewed.groupBy("k").agg(F.count_distinct("v").alias("d")).collect()
    }
    assert got == exact  # value-hash salting keeps shard counts disjoint


def test_skewed_group_metrics(spark, skewed):
    from open_data_linter_spark.rules.skew import skewed_group_metrics

    got = {
        r.k: (r.cnt, r.total)
        for r in skewed_group_metrics(
            skewed, "k",
            [("cnt", F.count(F.lit(1))), ("total", F.sum("v"))],
        ).collect()
    }
    exact = {
        r.k: (r.cnt, r.total)
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == exact


def test_stage1_splits_hot_key(spark, skewed):
    """The hot key occupies many (key, salt) groups before the merge."""
    from open_data_linter_spark.rules.skew import with_salt

    stage1 = with_salt(skewed, 16).groupBy("k", "__salt").count()
    hot_shards = stage1.where(F.col("k") == "hot").count()
    assert hot_shards >= 12  # hot key spread over ≥12 of 16 salts
