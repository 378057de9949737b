"""Sequence packing for pre-training batch prep.

Documents are packed into fixed-token-budget bins ("context windows")
so training batches waste minimal padding. Exact bin-packing is NP-hard
and any greedy first-fit is inherently sequential; what a 100-TB
pipeline actually runs is *contiguous fill*: fix a deterministic
document order, take the running token total, and cut a new bin
whenever the budget boundary is crossed. That is window-expressible
(one partitioned sort, no iteration), reproducible across engines, and
within one document of greedy fill quality.

Scale: the window partitions by a stream key (language, source, or a
hash bucket), so each partition sorts independently — there is no
global sort, and bins never span partitions (which is what you want:
a resumable job re-packs only the partitions whose input changed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    max_tokens: int,
    order_col: str,
    partition_col: str,
) -> DataFrame:
    """Assign each row a ``bin`` id within its partition.

    Bin id = (running token total BEFORE this row) // max_tokens, over
    rows ordered by ``order_col`` inside ``partition_col`` — i.e. a row
    joins the bin its starting offset falls in; a row longer than the
    residual space straddles into the next boundary (documents are
    split at training time anyway, so straddling is the norm, not an
    error). Deterministic given (order_col, partition_col).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    w = Window.partitionBy(partition_col).orderBy(order_col)
    cum = F.sum(token_col).over(w)
    return df.withColumn(
        "bin", F.floor((cum - F.col(token_col)) / F.lit(max_tokens))
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Split each document into OVERLAPPING token windows ->
    (id, chunk_idx, n_tokens, chunk_text) — the long-document prep for
    context-window training and retrieval chunking: window k covers
    tokens [k*stride, k*stride + width), so consecutive windows share
    ``width - stride`` tokens and no token is dropped (the last window
    is the one that ends at the document end; coverage is total because
    ceil((n - width) / stride) * stride + width >= n).

    Tokens are maximal non-whitespace runs, case and punctuation
    preserved; ``chunk_text`` re-joins them with single spaces
    (whitespace-NORMALIZED chunks — the byte-exact original spans per
    segment are what the Ito kernel provides, this is the lossy-
    whitespace fast path every tokenizer pipeline uses). An empty or
    whitespace-only document yields ONE empty chunk, so every input
    row is accounted for downstream.

    Everything is a projection + one explode: per row, a token-array
    split, an integer chunk count, a ``sequence`` exploded to chunk
    indices, and an array slice per chunk — no shuffle at all; a
    100 TB corpus chunks at scan speed. Chunk counts and slices are
    exact integer arithmetic (no float ceil), bit-identical anywhere.
    """
    if width <= 0 or stride <= 0:
        raise ValueError(
            f"width and stride must be positive, got {width}, {stride}"
        )
    if stride > width:
        raise ValueError(
            f"stride {stride} > width {width} would DROP the tokens "
            "between consecutive windows — refusing silent data loss"
        )
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    # integer ceil((n - width) / stride) + 1, clamped to 1 window when
    # the doc fits (or is empty)
    n_chunks = F.when(n <= width, F.lit(1)).otherwise(
        # floor((n - width + stride - 1) / stride) == ceil((n - width)
        # / stride) for positive ints; +1 for window 0
        F.floor(
            (n - F.lit(width) + F.lit(stride) - F.lit(1)) / F.lit(stride)
        ).cast("long")
        + F.lit(1)
    )
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
    )
    start = F.col("chunk_idx").cast("long") * F.lit(stride)
    return base.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.greatest(
            F.least(F.lit(width).cast("long"), F.col("_n") - start),
            F.lit(0).cast("long"),
        ).alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_toks"), (start + 1).cast("int"), width), " "
        ).alias("chunk_text"),
    )


def pack_stats(
    df: DataFrame,
    token_col: str,
    max_tokens: int,
    order_col: str,
    partition_col: str,
) -> DataFrame:
    """Per-bin packing summary: (partition, bin, n_docs, total_tokens).

    The partial aggregation rides the same partitioning the window
    produced, so the groupBy after the window adds no second sort of
    the full data.
    """
    packed = pack_sequences(df, token_col, max_tokens, order_col, partition_col)
    return packed.groupBy(partition_col, "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("total_tokens"),
    )
