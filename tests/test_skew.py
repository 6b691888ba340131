"""salted_join: result equality with a plain join on skewed data, and
the widened shuffle key actually reaching the exchange."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from go_integ_spark.functions.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # 10k rows of one hot key + a tail of singletons
    left = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )
    return left, right


def test_salted_join_equals_plain_join(skewed):
    left, right = skewed
    plain = left.join(right, ["k"]).select("k", "payload", "dim")
    salted = salted_join(left, right, ["k"]).select("k", "payload", "dim")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(skewed):
    left, right = skewed
    lonely = left.filter(F.col("k") > 5_000_000)  # no match in right
    assert lonely.count() == 0  # sanity: construct a real unmatched row
    left2 = left.unionByName(
        left.sparkSession.range(1).select(
            F.lit(999_999).alias("k"), F.lit(-1).alias("payload")
        )
    )
    out = salted_join(left2, right, ["k"], how="left")
    row = out.filter(F.col("k") == 999_999).collect()
    assert len(row) == 1 and row[0]["dim"] is None


def test_salt_widens_the_shuffle_key(skewed):
    left, right = skewed
    out = salted_join(left, right, ["k"], num_salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_rejects_right_joins(skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, ["k"], how="right")
