"""Exact-substring duplicate detection via winnowing fingerprints.

MinHash/SimHash (:mod:`pawpaw_spark.operators.dedup`) answer "are these
DOCUMENTS near-identical?"; training-data curation also needs the
substring question — "do these documents SHARE a long verbatim passage?"
(boilerplate, license headers, quoted text, cross-site copies). Lee et
al., "Deduplicating Training Data Makes Language Models Better" (ACL
2022) remove exactly these spans with a suffix array — a structure with
no good distributed analogue. The standard distributable equivalent is
WINNOWING (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms
for Document Fingerprinting", SIGMOD 2003, the MOSS algorithm):

* hash every k-gram (character k-gram) of the document;
* slide a window of ``w`` consecutive k-gram hashes; in each window
  select the minimum hash, breaking ties by RIGHTMOST position;
* the fingerprint set is the distinct selected (hash, position) pairs.

Guarantee (SIGMOD 2003, Thm. 2): any shared substring of length at
least ``t = w + k - 1`` produces at least one shared fingerprint HASH in
both documents, regardless of alignment — the property fixed-stride
sampling lacks (the same passage at different offsets samples different
grams). Density is ~2/(w+1), so the join input is ~2/(w+1) of the
positions, not all of them.

Scale notes (100 TB corpus):

* Fingerprinting is ARRAY-NATIVE inside one projection — k-gram
  hashing, window minima, and dedup all happen per row in whole-stage
  codegen. Zero shuffle until the (doc_id, hash) fingerprint table,
  which is ~2/(w+1) the size of a per-position table. An
  explode-then-window formulation would shuffle every char position of
  the corpus; this formulation shuffles only selected fingerprints.
* The pair join is an equi-join on the fingerprint hash with the same
  hot-key guard as n-gram Jaccard: hashes appearing in more than
  ``max_df`` documents (license boilerplate — the classic quadratic
  blowup) are dropped before pairing, with the drop logged in the plan,
  not silently sampled.
* ``hash_fn="md5"`` (default) is bit-portable to the DuckDB contract
  oracle; production corpora can pass ``hash_fn="xxhash64"`` for an
  8-byte fingerprint column (~4x smaller shuffle rows, Spark-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _hash_col(c, hash_fn: str):
    if hash_fn == "md5":
        return F.md5(c)
    if hash_fn == "xxhash64":
        return F.xxhash64(c)
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """Winnowing fingerprint table -> (``id_col``, h, pos).

    ``h`` is the hash of the character k-gram starting at 0-based char
    offset ``pos``. Selection: minimum (h, -pos) per window of ``w``
    consecutive k-gram hashes — the lexicographic struct min makes the
    tie-break (rightmost minimal hash) explicit and engine-portable.
    Documents with fewer than ``w`` k-grams contribute the minimum over
    the grams they have (one truncated window); documents shorter than
    ``k`` contribute nothing.

    Entirely array-native: one projection, no explode of raw positions,
    no shuffle (see module docstring).
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    t = F.col(text_col)
    ng = F.length(t) - F.lit(k) + 1  # k-gram count (may be <= 0)
    grams = F.transform(
        F.sequence(F.lit(0), ng - 1),
        lambda i: F.struct(
            _hash_col(t.substr(i + 1, F.lit(k)), hash_fn).alias("h"),
            (-i).alias("np"),
        ),
    )

    # let-bind the gram array (functions/strings._let trick): lambdas
    # INLINE their argument expression per use site, so referencing
    # `grams` inside the per-window lambda would recompute every md5
    # O(n) times per row — O(n^2) hashing, measured 6.3 s -> sub-second
    # at the sf0.001 contract corpus with the binding
    def winnow(g):
        starts = F.sequence(F.lit(0), F.greatest(F.size(g) - w, F.lit(0)))
        # slice truncates at array end — the short-document semantics
        # documented above
        return F.array_distinct(
            F.transform(starts, lambda p: F.array_min(F.slice(g, p + 1, w)))
        )

    bound = F.element_at(F.transform(F.array(grams), winnow), 1)
    htype = "string" if hash_fn == "md5" else "bigint"
    empty = F.array().cast(f"array<struct<h:{htype},np:int>>")
    fps = F.when(ng >= 1, bound).otherwise(empty)
    return (
        df.select(F.col(id_col), F.explode(fps).alias("fp"))
        .select(
            id_col,
            F.col("fp.h").alias("h"),
            (-F.col("fp.np")).alias("pos"),
        )
    )


def shared_fingerprint_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    max_df: int | None = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """Document pairs sharing verbatim passages -> (doc_a, doc_b,
    n_shared) with doc_a < doc_b; ``n_shared`` counts DISTINCT shared
    fingerprint hashes. Any pair sharing a substring of length >=
    ``w + k - 1`` chars appears (winnowing guarantee); ``n_shared``
    grows with the amount of shared text.

    ``max_df`` drops fingerprints present in more than that many
    documents before pairing (boilerplate guard — identical license
    headers across a million files must not build a 10^12-row pair
    set). ``None`` disables the guard (contract/oracle mode).
    """
    fp = winnow_fingerprints(df, text_col, id_col, k, w, hash_fn)
    docs_h = fp.select(F.col(id_col).alias("d"), "h").distinct()
    if max_df is not None:
        freq = docs_h.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        docs_h = docs_h.join(
            F.broadcast(freq.filter(F.col("df") > max_df).select("h")),
            "h",
            "left_anti",
        )
    a = docs_h.select(F.col("d").alias("doc_a"), "h")
    b = docs_h.select(F.col("d").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    max_df: int | None = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document duplicated char ranges -> (``id_col``, start, stop).

    A fingerprint is DUPLICATED when its hash occurs in >= 2 distinct
    documents. Each duplicated fingerprint at ``pos`` covers chars
    [pos, pos + k); overlapping/adjacent covers merge into maximal
    islands (the spans Lee et al. would cut). Winnowing selects ~2/(w+1)
    of positions, so islands are the fingerprint-anchored approximation
    of the true duplicated region — anchors of a shared passage are
    shared, so every such passage of length >= w + k - 1 yields an
    island in both documents.

    Shape: fingerprint join (equi, hot-key capped like
    :func:`shared_fingerprint_pairs`) -> per-doc sort -> gaps-and-
    islands with a running max — one partitionBy(``id_col``) window,
    the only per-doc state.
    """
    fp = winnow_fingerprints(df, text_col, id_col, k, w, hash_fn)
    per_doc = fp.select(F.col(id_col), "h", "pos").distinct()
    freq = per_doc.select(id_col, "h").distinct().groupBy("h").agg(
        F.count(F.lit(1)).alias("df")
    )
    keep = freq.filter(
        (F.col("df") >= 2)
        & (F.lit(True) if max_df is None else (F.col("df") <= max_df))
    ).select("h")
    dup = per_doc.join(keep, "h").select(
        id_col, "pos", (F.col("pos") + k).alias("end")
    )
    win = W.partitionBy(id_col).orderBy("pos")
    # island break: this cover starts past every previous cover's end
    prev_max = F.max("end").over(
        W.partitionBy(id_col).orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    )
    marked = dup.withColumn(
        "brk", F.when(prev_max.isNull() | (F.col("pos") > prev_max), 1).otherwise(0)
    ).withColumn("island", F.sum("brk").over(win))
    return (
        marked.groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("long").alias("start"),
            F.max("end").cast("long").alias("stop"),
        )
        .select(id_col, "start", "stop")
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut char ranges out of documents -> input columns plus
    ``clean_text`` and ``n_cut`` (ranges removed). The second half of
    Lee et al.'s exact-substring dedup: :func:`duplicated_spans` finds
    the verbatim-duplicated ranges, this surgically removes them while
    keeping the rest of the document.

    ``spans`` is (``id_col``, start, stop) with NON-OVERLAPPING ranges
    per document (duplicated_spans' islands are disjoint by
    construction); [start, stop) clipped to the text. Documents with no
    spans pass through with ``clean_text = text``.

    Shape: spans collapse to one array per doc (a partial-agg groupBy),
    one broadcast-or-shuffle join back to the docs, then the kept-piece
    extraction is pure per-row column math — complement intervals via
    a sorted-array walk, no window, no Python.
    """
    per_doc = (
        spans.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("start"), F.col("stop")))
            ).alias("_cuts")
        )
    )
    t = F.col(text_col)
    n = F.length(t).cast("long")
    cuts = F.col("_cuts")
    # kept piece BEFORE cut i runs from the previous cut's stop (0 for
    # the first) to this cut's start; the tail after the last cut is
    # appended separately. Clipping keeps out-of-range spans harmless.
    clip = lambda x: F.greatest(F.lit(0).cast("long"), F.least(n, x.cast("long")))
    pieces = F.zip_with(
        F.concat(F.array(F.lit(0).cast("long")), F.transform(cuts, lambda c: clip(c["stop"]))),
        F.concat(F.transform(cuts, lambda c: clip(c["start"])), F.array(n)),
        lambda lo, hi: F.when(hi > lo, t.substr(lo + 1, hi - lo)).otherwise(F.lit("")),
    )
    clean = F.concat_ws("", pieces)
    return (
        df.join(per_doc, id_col, "left")
        .withColumn(
            "clean_text", F.when(cuts.isNull(), t).otherwise(clean)
        )
        .withColumn(
            "n_cut",
            F.coalesce(F.size("_cuts"), F.lit(0)).cast("long"),
        )
        .drop("_cuts")
    )


# ---------------------------------------------------------------------------
# incremental (daily-ingest) exact-substring dedup
# ---------------------------------------------------------------------------

_WINNOW_INDEX_PARAMS = ("k", "w")


def winnow_index_write(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus winnowing-fingerprint index: one parquet row
    per (doc, fingerprint) with its position, parameters in a
    ``<path>/params`` sidecar — the exact-substring analog of
    :func:`pawpaw_spark.operators.dedup.minhash_index_write`, with the
    same contract: a delta pass derives its parameters FROM the
    sidecar, and ``mode='append'`` (the daily fold-in) validates the
    call's parameters against it and raises on mismatch — appending
    fingerprints winnowed under different (k, w) would silently break
    the shared-substring guarantee for every cross-era pair.

    The index hash is fixed to md5: the at-rest format must stay
    comparable across engine versions and to external tools, which the
    seedless public digest guarantees and xxhash64's implementation
    detail does not.
    """
    spark = df.sparkSession
    params = dict(zip(_WINNOW_INDEX_PARAMS, (k, w)))
    if mode == "append":
        from pyspark.errors import AnalysisException

        try:
            row = spark.read.parquet(f"{path}/params").first()
            if row is None:
                raise ValueError(
                    f"winnow_index_write(mode='append'): params sidecar at "
                    f"{path}/params exists but holds no row — refusing to "
                    "append against an unvalidatable index"
                )
        except AnalysisException as ex:
            # only a MISSING sidecar is a cold start; any other read
            # failure must surface (see minhash_index_write)
            msg = str(ex)
            if "PATH_NOT_FOUND" not in msg and "does not exist" not in msg:
                raise
            row = None
        if row is not None:
            old = {p: int(row.asDict()[p]) for p in _WINNOW_INDEX_PARAMS}
            if old != params:
                raise ValueError(
                    f"winnow_index_write(mode='append'): parameters {params} "
                    f"do not match the existing index sidecar {old}"
                )
            # pre-sidecar index (rows exist, dfreq absent): backfill the
            # dfreq era from the at-rest rows BEFORE appending, else the
            # appended era alone would undercount history's frequencies
            try:
                spark.read.parquet(f"{path}/dfreq").schema
            except AnalysisException as ex:
                msg = str(ex)
                if "PATH_NOT_FOUND" not in msg and "does not exist" not in msg:
                    raise
                hist = spark.read.parquet(f"{path}/rows")
                (
                    hist.select(F.col(hist.columns[0]).alias("id"), "h")
                    .distinct()
                    .groupBy("h")
                    .agg(F.count(F.lit(1)).cast("long").alias("df"))
                    .write.mode("overwrite")
                    .parquet(f"{path}/dfreq")
                )
    df = df.withColumn(id_col, F.col(id_col).cast("string"))
    fp = winnow_fingerprints(df, text_col, id_col, k, w, hash_fn="md5")
    fp = fp.persist()
    fp.write.mode(mode).parquet(f"{path}/rows")
    # per-h document-frequency sidecar: PARTIAL counts per write era,
    # aggregated by readers (sum is exact because doc ids never repeat
    # across eras — the delta pass raises on id collision). Keeps the
    # delta's max_df guard proportional to the sidecar (pre-aggregated,
    # 2 narrow columns) instead of re-counting every (doc, h, pos) row
    # in the index each micro-batch (round-3 review finding); a
    # mode='overwrite' rebuild compacts it back to one era.
    (
        fp.select(id_col, "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .write.mode(mode)
        .parquet(f"{path}/dfreq")
    )
    fp.unpersist()
    df.sparkSession.createDataFrame([params]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/params")


def winnow_delta_pairs(
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 1000,
    min_shared: int = 1,
) -> DataFrame:
    """Shared-passage pairs INVOLVING AT LEAST ONE NEW DOC -> (a, b,
    n_shared): new-vs-index and new-vs-new, never history-vs-history
    (those were emitted when history was new) — cost scales with
    |delta| x fingerprint density, and historical TEXT is never
    re-read, only its at-rest fingerprints.

    (k, w) come from the index sidecar (not caller-suppliable: a
    mismatch would silently find nothing). The ``max_df`` boilerplate
    guard counts doc frequency over the WHOLE corpus (index + delta),
    matching what a full recompute would see; as with the n-gram/
    minhash caps, a fingerprint pushed over the cap by the delta
    suppresses its pairs from here on, while pre-cap history pairs
    stand as emitted.
    """
    spark = new_docs.sparkSession
    new_docs = new_docs.withColumn(id_col, F.col(id_col).cast("string"))
    spark.read.parquet(f"{index_path}/params").first()  # existence check
    idx = spark.read.parquet(f"{index_path}/rows")
    new_ids = new_docs.select(F.col(id_col).alias("_nid")).distinct()
    if (
        idx.join(new_ids, idx[idx.columns[0]] == F.col("_nid"), "left_semi")
        .limit(1)
        .count()
        > 0
    ):
        raise ValueError("new_docs contains ids already present in the index")
    p = spark.read.parquet(f"{index_path}/params").first().asDict()
    fp_new = (
        winnow_fingerprints(
            new_docs, text_col, id_col, int(p["k"]), int(p["w"]), hash_fn="md5"
        )
        .select(F.col(id_col).alias("id"), "h")
        .distinct()
        .persist()
    )
    fp_old = idx.select(F.col(idx.columns[0]).alias("id"), "h").distinct()
    if max_df is not None:
        # corpus-wide doc frequency = at-rest sidecar (pre-aggregated
        # per-era partials, summed) + the delta's own counts — O(sidecar
        # + delta), NOT a re-count of every index row per call. Indexes
        # written before the sidecar existed fall back to the full
        # recount, same result by construction.
        from pyspark.errors import AnalysisException

        new_cnt = fp_new.groupBy("h").agg(
            F.count(F.lit(1)).cast("long").alias("df")
        )
        try:
            old_cnt = spark.read.parquet(f"{index_path}/dfreq")
        except AnalysisException as ex:
            msg = str(ex)
            if "PATH_NOT_FOUND" not in msg and "does not exist" not in msg:
                raise
            old_cnt = fp_old.groupBy("h").agg(
                F.count(F.lit(1)).cast("long").alias("df")
            )
        dfreq = (
            old_cnt.unionByName(new_cnt)
            .groupBy("h")
            .agg(F.sum("df").alias("df"))
        )
        hot = F.broadcast(dfreq.filter(F.col("df") > max_df).select("h"))
        fp_new_k = fp_new.join(hot, "h", "left_anti")
        fp_old_k = fp_old.join(hot, "h", "left_anti")
    else:
        fp_new_k, fp_old_k = fp_new, fp_old
    no = (
        fp_new_k.select(F.col("id").alias("n"), "h")
        .join(fp_old_k.select(F.col("id").alias("o"), "h"), "h")
        .select(F.least("n", "o").alias("a"), F.greatest("n", "o").alias("b"), "h")
    )
    nn = (
        fp_new_k.select(F.col("id").alias("a"), "h")
        .join(fp_new_k.select(F.col("id").alias("b"), "h"), "h")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "h")
    )
    out = (
        no.unionByName(nn)
        .groupBy("a", "b")
        .agg(F.count_distinct(F.col("h")).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    from pawpaw_spark.operators.dedup import _attach_caches

    return _attach_caches(out, [fp_new])  # see dedup.cached_scope


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    mask_bits: int = 6,
    min_len: int | None = None,
    max_len: int | None = None,
) -> DataFrame:
    """Content-defined chunking -> one row per chunk:
    ``(id, chunk_idx, start, length, digest)``.

    The storage-dedup primitive (Muthitacharoen et al., LBFS SOSP
    2001; the FastCDC family): cut AFTER every position whose ending
    k-gram hashes to 0 mod ``2**mask_bits`` — boundaries depend only
    on LOCAL content, so a shared passage chunks identically in every
    document that contains it REGARDLESS of its offset (the property
    fixed-size blocking lacks), and identical chunks collapse by
    ``digest`` corpus-wide.  Expected chunk length ~``2**mask_bits``
    chars.

    ``min_len``/``max_len`` (both set, or neither) switch on FastCDC-
    style NORMALIZED chunking — the production smoothing, with pinned
    portable semantics: walk the content boundaries left to right
    keeping ``last`` (the previous cut offset, initially 0); before
    considering a boundary at offset ``e``, force a cut every
    ``max_len`` chars of the gap (``(e - last - 1) div max_len``
    forced cuts); then accept ``e`` iff ``e - last >= min_len``; after
    the final boundary, apply the same forcing against the document
    end.  A SEQUENTIAL fold — but per ROW, so it compiles to one
    ``aggregate`` higher-order expression (no Python, no shuffle), and
    the oracle replays it with DuckDB ``list_reduce`` over the same
    struct state.

    Array-native like :func:`winnow_fingerprints`: per row, one pass
    computes the boundary set, cut offsets, and chunk substrings +
    digests inside whole-stage codegen; the only shuffle is whatever
    the CALLER does with the chunk table.  Docs shorter than ``k``
    emit one whole-doc chunk.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 1 <= mask_bits <= 20:
        raise ValueError("mask_bits must be in [1, 20]")
    if (min_len is None) != (max_len is None):
        raise ValueError("set both min_len and max_len, or neither")
    if min_len is not None and not 1 <= min_len <= max_len:
        raise ValueError("need 1 <= min_len <= max_len")
    d = 1 << mask_bits
    t = F.col(text_col)
    n = F.length(t)
    # boundary positions: 0-based END position p of a k-gram (p in
    # [k-1, n-1]); cut AFTER p. The LAST position never cuts (it would
    # emit an empty tail chunk). Spark's sequence(start, stop) steps
    # BACKWARD when stop < start, so docs with n <= k (no complete
    # k-gram before the last position) must short-circuit to the empty
    # boundary set or they'd probe positions past end-of-doc.
    bounds = F.when(
        n - 2 >= F.lit(k - 1),
        F.filter(
            F.sequence(F.lit(k - 1), n - 2),
            lambda p: (
                F.conv(
                    F.substring(
                        F.md5(t.substr(p - (k - 2), F.lit(k))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % d
            )
            == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    if min_len is None:
        cuts = F.transform(bounds, lambda p: (p + 1).cast("long"))
    else:
        ml = F.lit(max_len).cast("long")
        cand = F.transform(bounds, lambda p: (p + 1).cast("long"))
        init = F.struct(
            F.lit(0).cast("long").alias("last"),
            F.array().cast("array<bigint>").alias("cuts"),
        )
        empty = F.array().cast("array<bigint>")

        def forced_cuts(last, upto):
            # one forced cut every max_len chars of the gap (last, upto)
            f = F.floor((upto - last - 1) / max_len).cast("long")
            return F.when(
                f >= 1,
                F.transform(
                    F.sequence(F.lit(1).cast("long"), f),
                    lambda i: last + ml * i,
                ),
            ).otherwise(empty)

        def merge(a, e):
            forced = forced_cuts(a["last"], e)
            nl = a["last"] + ml * F.coalesce(
                F.size(forced).cast("long"), F.lit(0)
            )
            accept = (e - nl) >= min_len
            return F.struct(
                F.when(accept, e).otherwise(nl).alias("last"),
                F.concat(
                    a["cuts"],
                    forced,
                    F.when(accept, F.array(e)).otherwise(empty),
                ).alias("cuts"),
            )

        folded = F.aggregate(cand, init, merge)
        cuts = F.concat(
            folded["cuts"],
            forced_cuts(folded["last"], n.cast("long")),
        )
    starts = F.concat(
        F.array(F.lit(0).cast("int")),
        F.transform(cuts, lambda c: c.cast("int")),
    )
    ends = F.concat(
        F.transform(cuts, lambda c: c.cast("int")),
        F.array(n.cast("int")),
    )
    chunks = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            s.alias("start"), (e - s).alias("length")
        ),
    )
    guarded = F.when(n >= 1, chunks).otherwise(
        F.array().cast("array<struct<start:int,length:int>>")
    )
    ex = df.select(
        F.col(id_col),
        t.alias("__t"),
        F.posexplode(guarded).alias("chunk_idx", "c"),
    )
    return ex.select(
        id_col,
        "chunk_idx",
        F.col("c.start").alias("start"),
        F.col("c.length").alias("length"),
        F.md5(
            F.col("__t").substr(F.col("c.start") + 1, F.col("c.length"))
        ).alias("digest"),
    )


_CDC_INDEX_PARAMS = ("k", "mask_bits")


def cdc_index_write(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    mask_bits: int = 6,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus CDC chunk index: one parquet row per
    (doc, digest, length) under ``<path>/rows``, parameters in a
    ``<path>/params`` sidecar — the chunk-level member of the at-rest
    index family (minhash_index_write, winnow_index_write), with the
    same contract: a delta pass derives (k, mask_bits) FROM the
    sidecar, and ``mode='append'`` validates the call's parameters
    against it (chunks cut under different parameters never align, so
    a mixed index would silently under-report duplication)."""
    spark = df.sparkSession
    params = dict(zip(_CDC_INDEX_PARAMS, (k, mask_bits)))
    if mode == "append":
        from pyspark.errors import AnalysisException

        try:
            row = spark.read.parquet(f"{path}/params").first()
            if row is None:
                raise ValueError(
                    f"cdc_index_write(mode='append'): params sidecar at "
                    f"{path}/params exists but holds no row — refusing "
                    "to append against an unvalidatable index"
                )
        except AnalysisException as ex:
            msg = str(ex)
            if "PATH_NOT_FOUND" not in msg and "does not exist" not in msg:
                raise
            row = None
        if row is not None:
            old = {p: int(row.asDict()[p]) for p in _CDC_INDEX_PARAMS}
            if old != params:
                raise ValueError(
                    f"cdc_index_write(mode='append'): parameters "
                    f"{params} do not match the existing sidecar {old}"
                )
    d = df.withColumn(id_col, F.col(id_col).cast("string"))
    ch = cdc_chunks(d, text_col, id_col, k, mask_bits)
    ch.select(F.col(id_col).alias("id"), "digest", "length").write.mode(
        mode
    ).parquet(f"{path}/rows")
    spark.createDataFrame([params]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/params")


def cdc_delta_dups(
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Day-2 chunk-level dedup: chunks of the NEW docs that already
    exist (in the at-rest index OR >= 2 times within the delta) ->
    ``(id, chunk_idx, digest, length, n_hist, n_new)``.

    Cost ∝ |delta|: history TEXT is never re-read — the index joins
    PRE-AGGREGATED per digest (one row per distinct chunk content, so
    a boilerplate chunk shared by a million historical docs is ONE
    join row, never a fan-out).  A new doc id colliding with a
    historical id raises (half-applied replays must fail loud, the
    minhash_delta doctrine).  A chunk is reported iff its corpus-wide
    copy count is >= 2 — ``n_hist >= 1 or n_new >= 2`` — which equals
    the from-scratch full-corpus answer restricted to new ids (the
    contract oracle recomputes exactly that)."""
    spark = new_docs.sparkSession
    prow = spark.read.parquet(f"{index_path}/params").first()
    k, mask_bits = (int(prow.asDict()[p]) for p in _CDC_INDEX_PARAMS)
    hist = spark.read.parquet(f"{index_path}/rows")
    d = new_docs.withColumn(id_col, F.col(id_col).cast("string"))
    clash = (
        d.select(F.col(id_col).alias("id"))
        .join(hist.select("id").distinct(), "id")
        .limit(1)
        .collect()
    )
    if clash:
        raise ValueError(
            f"cdc_delta_dups: new doc id {clash[0]['id']!r} already "
            "exists in the index (replayed batch?) — refusing to "
            "double-count"
        )
    ch = cdc_chunks(d, text_col, id_col, k, mask_bits)
    hist_per = hist.groupBy("digest").agg(
        F.count(F.lit(1)).cast("long").alias("n_hist")
    )
    new_per = ch.groupBy("digest").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    return (
        ch.join(hist_per, "digest", "left")
        .join(new_per, "digest")
        .withColumn("n_hist", F.coalesce("n_hist", F.lit(0)))
        .filter((F.col("n_hist") >= 1) | (F.col("n_new") >= 2))
        .select(
            F.col(id_col).alias("id"), "chunk_idx", "digest",
            "length", "n_hist", "n_new",
        )
    )
