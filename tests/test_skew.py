"""salted_join == plain join, with the replication plan verified."""

import pytest
from pyspark.sql import functions as F

from pawpaw_spark.operators.skew import salted_join


def _counts(df, cols):
    out = {}
    for r in df.groupBy(*cols).count().collect():
        out[tuple(r[c] for c in cols)] = r["count"]
    return out


class TestSaltedJoin:
    def _frames(self, spark):
        # 90% of left rows share one hot key
        left = spark.createDataFrame(
            [
                (i, "HOT" if i % 10 else f"k{i}", i * 7)
                for i in range(500)
            ],
            "row_id long, key string, val long",
        )
        right = spark.createDataFrame(
            [("HOT", "hot-payload")]
            + [(f"k{i}", f"p{i}") for i in range(0, 500, 10)],
            "key string, payload string",
        )
        return left, right

    def test_inner_equals_plain_join(self, spark):
        left, right = self._frames(spark)
        got = _counts(
            salted_join(left, right, "key", n_salts=8),
            ["row_id", "key", "val", "payload"],
        )
        want = _counts(
            left.join(right, "key"),
            ["row_id", "key", "val", "payload"],
        )
        assert got == want

    def test_left_keeps_unmatched(self, spark):
        left, right = self._frames(spark)
        right_missing = right.filter(F.col("key") != "k30")
        got = _counts(
            salted_join(left, right_missing, "key", n_salts=4, how="left"),
            ["row_id", "payload"],
        )
        want = _counts(
            left.join(right_missing, "key", "left"),
            ["row_id", "payload"],
        )
        assert got == want

    def test_duplicate_right_rows_multiply_once(self, spark):
        left, right = self._frames(spark)
        right2 = right.union(right.filter(F.col("key") == "HOT"))
        got = salted_join(left, right2, "key", n_salts=8).count()
        want = left.join(right2, "key").count()
        assert got == want

    def test_replication_factor_in_plan(self, spark):
        left, right = self._frames(spark)
        out = salted_join(left, right, "key", n_salts=8)
        # the exploded right side carries n_salts copies of every row
        n = out.count()
        assert n == left.join(right, "key").count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Generate explode" in plan or "explode" in plan.lower()

    def test_rejects_outer_and_column_clash(self, spark):
        left, right = self._frames(spark)
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(left, right, "key", how="full")
        clash = right.withColumnRenamed("payload", "val")
        with pytest.raises(ValueError, match="both sides"):
            salted_join(left, clash, "key")
