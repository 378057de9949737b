"""Pairwise ER metrics vs hand-computed sets."""

from pawpaw_spark.operators.linking import er_pair_metrics


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


class TestErPairMetrics:
    def test_exact_sets(self, spark):
        gold = [("a", "b"), ("b", "c"), ("d", "e")]
        pred = [("b", "a"), ("c", "d"), ("d", "e"), ("e", "d")]
        # canon pred = {ab, cd, de}; common = {ab, de}
        row = er_pair_metrics(
            _df(spark, pred), _df(spark, gold)
        ).collect()[0]
        assert (row.n_pred, row.n_gold, row.n_common) == (3, 3, 2)
        assert row.precision == round(2 / 3, 6)
        assert row.recall == round(2 / 3, 6)
        assert row.f1 == round(2 * 2 / 6, 6)

    def test_self_pairs_and_duplicates_ignored(self, spark):
        gold = [("a", "b")]
        pred = [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")]
        row = er_pair_metrics(
            _df(spark, pred), _df(spark, gold)
        ).collect()[0]
        assert (row.n_pred, row.n_gold, row.n_common) == (1, 1, 1)
        assert row.f1 == 1.0

    def test_empty_sides(self, spark):
        row = er_pair_metrics(
            _df(spark, []), _df(spark, [("a", "b")])
        ).collect()[0]
        assert (row.precision, row.recall, row.f1) == (0.0, 0.0, 0.0)
