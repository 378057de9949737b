"""Distributed unigram-LM (SentencePiece) tokenizer training.

Kudo 2018 ("Subword Regularization", the SentencePiece unigram model)
is the third classic subword trainer next to BPE and WordPiece, and it
distributes over the SAME separation :mod:`bpe` establishes: the
corpus is scanned ONCE into the vocab-sized (word, freq) table
(:func:`bpe.word_freqs`), and everything after — seed-piece
extraction, EM expectation steps, pruning — is bounded by vocabulary
size, not corpus size. That is what makes 100 TB unigram training
feasible: the per-iteration cost is an Arrow-batched pass + one
aggregation over a table five orders of magnitude smaller than the
input.

The training loop (hard-EM / Viterbi variant, deterministic at any
parallelism):

1. :func:`seed_pieces` — candidate pieces = every substring up to
   ``max_piece_len`` of every distinct word, weighted by word
   frequency (pure column expressions: a nested index-sequence
   transform + flatten + explode, one aggregation shuffle). Seeds are
   the top ``seed_size`` multi-char substrings by Kudo's
   ``freq * len`` score (ties lexicographic) plus ALL single
   characters (so segmentation never fails).
2. E-step (:func:`em_counts`) — per word, the Viterbi-best
   segmentation under current piece log-probs, accumulated
   left-to-right (a fixed float evaluation order, so scores are
   bit-identical in the pure-Python mirror); expected counts = path
   counts × word freq. The piece table ships to executors as ONE
   broadcast (tokenizers are KBs-to-MBs); the kernel is an
   Arrow-batched ``mapInPandas`` with a per-batch word cache.
3. M-step — counts -> log-probs, a vocab-table aggregation.
4. Prune — drop the lowest-expected-count multi-char pieces
   (``prune_ratio`` per round, single chars immortal) until
   ``vocab_size`` remains, re-running EM between rounds — the
   loss-driven shrink loop of the reference, with expected count as
   the (standard simplification of the) loss proxy.

:func:`encode_unigram` applies a trained piece table by the same
Viterbi, so train-time and inference segmentations agree exactly.

Reference parity: diff-tested against a pure-Python mirror
(tests/test_construct_validate.py::TestUnigram) the way bpe_train is
tested against the Sennrich reference; the seed kernel is
value-checked cell-for-cell by the ``unigram_seed`` contract query.
"""

from __future__ import annotations

import math
from typing import Iterator, Mapping, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seed_pieces(
    words: DataFrame,
    *,
    max_piece_len: int = 8,
    seed_size: int = 1000,
) -> DataFrame:
    """(word, freq) -> the seed candidate table (piece, n, score):
    every substring of length 1..``max_piece_len``, each occurrence
    weighted by word frequency (overlapping occurrences count — ``anna``
    contributes ``n`` twice), scored ``n * len(piece)`` (Kudo's
    frequent-substring seeding). Returns all single characters plus
    the top ``seed_size`` multi-char pieces by (score desc, piece asc)
    — the deterministic tie-break that makes seeding identical at any
    parallelism. One aggregation shuffle; the top-k is a
    TakeOrderedAndProject, never a full sort."""
    subs = F.expr(
        f"flatten(transform(sequence(1, length(word)), i -> "
        f"transform(sequence(i, least(length(word), i + {int(max_piece_len) - 1})), "
        f"j -> substring(word, i, j - i + 1))))"
    )
    counts = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("n"))
        .withColumn("score", (F.col("n") * F.length("piece")).cast("long"))
    )
    singles = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("score"), F.asc("piece"))
        .limit(int(seed_size))
    )
    return singles.unionByName(multi)


def _viterbi(word: str, logp: Mapping[str, float], max_len: int) -> list:
    """Best segmentation of ``word`` under piece log-probs: DP left to
    right, candidate last-piece start scanned from the longest piece
    down (ties keep the first maximum found, i.e. the LONGEST last
    piece — a fixed rule the mirror replays). Unreachable positions
    only occur if a character is missing from ``logp``; the caller
    guarantees single-char coverage."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        lo = max(0, i - max_len)
        for j in range(lo, i):  # longest candidate first
            p = logp.get(word[j:i])
            if p is None or best[j] == NEG:
                continue
            s = best[j] + p
            if s > best[i]:
                best[i] = s
                back[i] = j
    if best[n] == NEG:
        raise ValueError(f"word {word!r} not segmentable under the piece set")
    out: list = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def em_counts(
    words: DataFrame,
    logp: Mapping[str, float],
    *,
    max_piece_len: int = 8,
) -> DataFrame:
    """One hard-EM expectation step -> (piece, n): Viterbi-segment
    every word under ``logp`` and sum path counts weighted by word
    frequency. The piece table is broadcast once per executor; the
    kernel caches segmentations per distinct word within a batch."""
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast(dict(logp))
    L = int(max_piece_len)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lp = bc.value
        cache: dict = {}

        def seg(w: str) -> list:
            got = cache.get(w)
            if got is None:
                got = cache[w] = _viterbi(w, lp, L)
            return got

        for pdf in batches:
            agg: dict = {}
            for w, f in zip(pdf["word"], pdf["freq"]):
                for piece in seg(w):
                    agg[piece] = agg.get(piece, 0) + int(f)
            yield pd.DataFrame(
                {"piece": list(agg.keys()), "n": list(agg.values())}
            )

    out = (
        words.mapInPandas(kernel, schema="piece string, n long")
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    out._pawpaw_bc = bc  # handle for the trainer to release post-collect
    return out


def _to_logp(counts: Mapping[str, int]) -> dict:
    total = float(sum(counts.values()))
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def unigram_train(
    words: DataFrame,
    vocab_size: int,
    *,
    seed_size: int = 1000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_ratio: float = 0.2,
) -> dict:
    """Train a unigram-LM piece table over a (word, freq) table ->
    ``{piece: logprob}`` with at most ``vocab_size`` pieces (all
    single characters always kept, so every word stays segmentable).

    Loop: seed -> (EM × ``em_iters`` -> prune ``prune_ratio`` of the
    multi-char pieces with the LOWEST expected counts, ties dropping
    lexicographically-last first) until the vocab fits, then a final
    EM re-estimate. Every driver decision orders by exact integer
    counts with lexicographic tie-breaks, so the trained tokenizer is
    identical at any parallelism/partitioning. The collected tables
    are all vocab-sized (metadata, not data)."""
    # every round re-reads the words table: pin it so the corpus scan
    # behind it runs once, preserving the ONE-scan separation
    words = words.persist()
    seeds = {
        r["piece"]: int(r["n"])
        for r in seed_pieces(
            words, max_piece_len=max_piece_len, seed_size=seed_size
        ).collect()
    }
    cur = _to_logp(seeds)

    def one_em(lp: dict) -> dict:
        df = em_counts(words, lp, max_piece_len=max_piece_len)
        got = {r["piece"]: int(r["n"]) for r in df.collect()}
        df._pawpaw_bc.unpersist()  # E-step broadcast released per round
        # unused pieces keep count 0 (dropped by _to_logp -> pruned)
        return got

    while True:
        counts: dict = {}
        for _ in range(max(1, em_iters)):
            counts = one_em(cur)
            cur = _to_logp(counts)
        multi = sorted(
            (p for p in cur if len(p) > 1),
            key=lambda p: (counts.get(p, 0), tuple(-ord(c) for c in p)),
        )
        n_single = sum(1 for p in cur if len(p) == 1)
        excess = len(cur) - max(int(vocab_size), n_single)
        if excess <= 0:
            break
        drop = set(multi[: max(1, min(excess, int(len(multi) * prune_ratio) or 1))])
        if not drop:
            break
        survivors = {
            p: counts.get(p, 1) for p in cur if p not in drop
        }
        cur = _to_logp(survivors)
    words.unpersist()
    return cur


def encode_unigram(
    texts: DataFrame,
    logp: Mapping[str, float],
    text_col: str = "text",
    *,
    max_piece_len: int = 8,
    pattern: str = "[a-z]+",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize a corpus with a trained piece table -> one row per
    input row with ``tokens`` (array<string>): the same Viterbi as
    training, so inference segmentations equal training segmentations
    exactly. Broadcast piece table; per-batch word cache."""
    spark = texts.sparkSession
    bc = spark.sparkContext.broadcast(dict(logp))
    L = int(max_piece_len)

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
        lp = bc.value
        cache: dict = {}

        def seg(w: str) -> list:
            got = cache.get(w)
            if got is None:
                got = cache[w] = _viterbi(w, lp, L)
            return got

        for pdf in batches:
            toks = pdf["__words"].map(
                lambda ws: [t for w in ws for t in seg(w)]
            )
            out = pdf.drop(columns=["__words"])
            out["tokens"] = toks
            yield out

    return with_words.mapInPandas(kernel, schema=out_schema)
