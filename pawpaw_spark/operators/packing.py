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
