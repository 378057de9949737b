"""Distributed byte-pair-encoding (BPE) tokenizer training.

Training-data pipelines don't just consume tokenizers — at 100 TB they
TRAIN them, and the classic BPE algorithm (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units")
is exactly the kind of iterative aggregation Spark is built for once
it is phrased over the right table: not the corpus, but the DISTINCT
word-frequency table. The corpus is scanned ONCE (:func:`word_freqs`
— a tokenize/explode/groupBy); every merge iteration then runs over
the words table, which is bounded by vocabulary size (10^7-ish for
web-scale text), not corpus size. That separation is what makes BPE
training feasible at 100 TB: the per-iteration cost is a groupBy on a
table five orders of magnitude smaller than the input.

Per merge iteration:

1. :func:`pair_counts` — adjacent symbol pairs per word, weighted by
   word frequency: a zip of the symbol array with its own tail
   (pure column expressions — ``transform`` over an index sequence),
   exploded and summed. Overlapping pairs count naively
   (``a a a`` -> two ``(a,a)``), matching the reference algorithm.
2. The argmax pair (ties broken lexicographically, so training is
   deterministic across partitioning/retries) comes to the driver —
   a single metadata row.
3. The merge is applied to the symbol arrays by an Arrow-batched
   ``mapInPandas`` kernel (:func:`_merge_batch`): left-to-right,
   non-overlapping, the reference semantics. Python is unavoidable
   here — the rewrite is inherently sequential WITHIN a word — but
   each word is a few dozen symbols and the tables are vocab-sized,
   so the kernel is bandwidth-trivial; rows not containing the pair
   are passed through by a vectorized precheck.

Lineage across iterations is truncated per round (persist swap), the
loop-state discipline every fixpoint operator here follows.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"
WP_PREFIX = "##"


def word_freqs(
    docs: DataFrame,
    text_col: str = "text",
    *,
    pattern: str = "[a-z]+",
    lowercase: bool = True,
) -> DataFrame:
    """One corpus scan -> the (word, freq) table BPE trains on.
    ``pattern`` is the word tokenizer (Java regex for ``regexp_extract_all``);
    the default keeps plain lowercase runs, the classic setup."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (
        docs.select(
            F.explode(F.regexp_extract_all(t, F.lit(f"({pattern})"))).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def to_symbols(words: DataFrame) -> DataFrame:
    """(word, freq) -> (word, freq, syms): the initial symbol array —
    the word's characters plus the end-of-word marker, the standard
    BPE base alphabet."""
    chars = F.split(F.col("word"), "")
    # Spark's split('', '') yields a trailing empty string on some
    # versions; filter defensively, then append the end marker
    chars = F.filter(chars, lambda c: c != F.lit(""))
    return words.select(
        "word", "freq", F.concat(chars, F.array(F.lit(END))).alias("syms")
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol table -> (a, b, n):
    for each word, pairs (syms[i], syms[i+1]) for i in 0..len-2, each
    weighted by the word's corpus frequency. Pure column expressions
    (index-sequence transform + explode), one aggregation shuffle."""
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(syms[i - 1] AS a, syms[i] AS b))"
    )
    return (
        symbols.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def to_symbols_wordpiece(words: DataFrame) -> DataFrame:
    """(word, freq) -> (word, freq, syms) under the WordPiece
    convention (Schuster & Nakajima 2012 / the BERT tokenizer): the
    first character plain, every continuation character prefixed with
    ``##``, no end-of-word marker — ``hug`` -> ``[h, ##u, ##g]``."""
    chars = F.split(F.col("word"), "")
    chars = F.filter(chars, lambda c: c != F.lit(""))
    syms = F.transform(
        chars,
        lambda c, i: F.when(i == 0, c).otherwise(
            F.concat(F.lit(WP_PREFIX), c)
        ),
    )
    return words.select("word", "freq", syms.alias("syms"))


def symbol_counts(symbols: DataFrame) -> DataFrame:
    """Unigram symbol frequencies over the symbol table -> (s, n):
    every occurrence weighted by word frequency. Vocab-table-sized
    input, one aggregation shuffle — the denominator table of the
    WordPiece score."""
    return (
        symbols.select(F.explode("syms").alias("s"), "freq")
        .groupBy("s")
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def wordpiece_pair_scores(symbols: DataFrame) -> DataFrame:
    """Adjacent pairs scored by WordPiece's likelihood gain
    ``count(a,b) / (count(a) * count(b))`` -> (a, b, n, score).

    The two count tables are both vocab-sized; the score join is two
    equi-joins Catalyst broadcasts when the alphabet table is small
    (it always is: the symbol table is bounded by the learned vocab).
    The division is performed as double(n) / (double(na) * double(nb))
    — one IEEE rounding per operation, so the score is bit-identical
    in any engine that replays the same expression (the pure-Python
    mirror and the DuckDB oracle both do)."""
    pc = pair_counts(symbols)
    sc = symbol_counts(symbols)
    na = sc.select(F.col("s").alias("a"), F.col("n").alias("na"))
    nb = sc.select(F.col("s").alias("b"), F.col("n").alias("nb"))
    return (
        pc.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            "n",
            (
                F.col("n").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("score"),
        )
    )


def _wp_merged(a: str, b: str) -> str:
    return a + (b[len(WP_PREFIX):] if b.startswith(WP_PREFIX) else b)


def wordpiece_train(
    words: DataFrame,
    num_merges: int,
    *,
    checkpoint_every: int = 8,
) -> tuple[list, DataFrame]:
    """Learn ``num_merges`` WordPiece merges over a (word, freq) table
    -> ``(vocab_adds, symbols)``: the ordered list of learned tokens
    (each the fusion of the argmax-score pair) and the final symbol
    table. Same loop discipline as :func:`bpe_train` — one vocab-table
    aggregation + a 1-row deterministic driver argmax (highest score,
    then lexicographic (a, b)) + the Arrow-batched merge kernel — but
    the argmax maximizes the likelihood gain ``n/(na*nb)`` instead of
    the raw pair count, and merged continuations keep the ``##``
    prefix (``(##u, ##g) -> ##ug``). Stops early when no pair occurs
    twice."""
    merges: list = []
    cur = to_symbols_wordpiece(words).persist()
    cur.count()
    try:
        for it in range(num_merges):
            top = (
                wordpiece_pair_scores(cur)
                .orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < 2:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append(_wp_merged(a, b))
            nxt = apply_merge(cur, a, b, merged=_wp_merged(a, b))
            if (it + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            cur.unpersist()
            cur = nxt
        return merges, cur
    except Exception:
        cur.unpersist()
        raise


def encode_wordpiece(
    texts: DataFrame,
    vocab: Sequence[str],
    text_col: str = "text",
    *,
    unk: str = "[UNK]",
    pattern: str = "[a-z]+",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize a corpus with a WordPiece vocabulary -> one row per
    input row with ``tokens`` (array<string>). Greedy longest-match-
    first within each word (the BERT inference algorithm): the longest
    vocabulary prefix is taken, the remainder continues with ``##``
    prefixes, and a word with any unmatched position becomes a single
    ``unk`` token. The vocab is a broadcast literal set (tokenizers
    are KBs); per-batch word cache like :func:`encode`."""
    vset = frozenset(vocab)

    def enc_word(word: str) -> list:
        out: list = []
        start, n = 0, len(word)
        while start < n:
            end = n
            cur = None
            while end > start:
                piece = word[start:end]
                if start > 0:
                    piece = WP_PREFIX + piece
                if piece in vset:
                    cur = piece
                    break
                end -= 1
            if cur is None:
                return [unk]
            out.append(cur)
            start = end
        return out

    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    with_words = texts.withColumn(
        "__words", F.regexp_extract_all(t, F.lit(f"({pattern})"))
    )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in texts.schema.fields
    ) + ", tokens array<string>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}

        def enc_cached(w: str) -> list:
            got = cache.get(w)
            if got is None:
                got = cache[w] = enc_word(w)
            return got

        for pdf in batches:
            toks = pdf["__words"].map(
                lambda ws: [t for w in ws for t in enc_cached(w)]
            )
            out = pdf.drop(columns=["__words"])
            out["tokens"] = toks
            yield out

    return with_words.mapInPandas(kernel, schema=out_schema)


def _merge_word(syms: Sequence[str], a: str, b: str, merged: str) -> list:
    out: list = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def apply_merge(
    symbols: DataFrame, a: str, b: str, *, merged: str | None = None
) -> DataFrame:
    """Apply ONE merge (a, b) -> ``merged`` (default ``a+b``) to every
    symbol array: left-to-right, non-overlapping (the reference BPE
    semantics — ``a a a`` with merge (a,a) becomes ``aa a``).
    Arrow-batched; a vectorized precheck passes untouched rows through
    without the per-word Python loop. ``merged`` overrides the fused
    spelling for conventions like WordPiece's ``##``-stripped
    continuation fusion."""
    if merged is None:
        merged = a + b
    fields = symbols.schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            syms = pdf["syms"]
            # precheck: a word can contain the pair only if it contains
            # both symbols — cheap vectorized filter before the loop
            maybe = syms.map(lambda s: a in s and b in s)
            if maybe.any():
                pdf = pdf.copy()
                pdf.loc[maybe, "syms"] = syms[maybe].map(
                    lambda s: _merge_word(list(s), a, b, merged)
                )
            yield pdf

    return symbols.mapInPandas(kernel, schema=fields)


def bpe_train(
    words: DataFrame,
    num_merges: int,
    *,
    checkpoint_every: int = 8,
) -> tuple[list, DataFrame]:
    """Learn ``num_merges`` BPE merges over a (word, freq) table ->
    ``(merges, symbols)``: the ordered merge list (the tokenizer
    artifact) and the final symbol table.

    Each iteration: one vocab-table aggregation (pair_counts), one
    1-row driver argmax (deterministic tie-break: highest count, then
    lexicographic (a, b) — so the learned tokenizer is identical at
    any parallelism), one Arrow-batched merge pass. State is persisted
    per round and the previous round released; every
    ``checkpoint_every`` rounds the lineage is cut with a
    localCheckpoint so plan depth stays bounded over long trainings.
    Stops early when no pair occurs twice (n < 2 never merges in
    reference BPE — a singleton pair gains nothing)."""
    merges: list = []
    cur = to_symbols(words).persist()
    cur.count()
    try:
        for it in range(num_merges):
            top = (
                pair_counts(cur)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < 2:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = apply_merge(cur, a, b)
            if (it + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            cur.unpersist()
            cur = nxt
        return merges, cur
    except Exception:
        cur.unpersist()
        raise


def encode(
    texts: DataFrame,
    merges: Sequence[tuple],
    text_col: str = "text",
    *,
    pattern: str = "[a-z]+",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize a corpus with a learned merge list -> one row per input
    row with ``tokens`` (array<string>). The merge list is a broadcast
    literal (tokenizers are KBs); application is the same Arrow-batched
    kernel as training, applied merge-by-merge in learned order within
    each word — the reference encoder semantics."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def enc_word(word: str) -> list:
        syms = list(word) + [END]
        while len(syms) >= 2:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            a, b = merges[best[0]]
            syms = _merge_word(syms, a, b, a + b)
        return syms

    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    with_words = texts.withColumn(
        "__words", F.regexp_extract_all(t, F.lit(f"({pattern})"))
    )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in texts.schema.fields
    ) + ", tokens array<string>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}

        def enc_cached(w: str) -> list:
            got = cache.get(w)
            if got is None:
                got = cache[w] = enc_word(w)
            return got

        for pdf in batches:
            toks = pdf["__words"].map(
                lambda ws: [t for w in ws for t in enc_cached(w)]
            )
            out = pdf.drop(columns=["__words"])
            out["tokens"] = toks
            yield out

    return with_words.mapInPandas(kernel, schema=out_schema)
