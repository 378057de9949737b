"""Text analysis for training-data pipelines — all JVM-side column
expressions (no Python in the hot path): language ID, quality scoring,
token counting, fingerprinting.

Each function returns the input DataFrame with added columns, so they
compose into one whole-stage-codegen'd projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, deterministic stopword lists (same lists are inlined into the
# DuckDB oracle SQL — keep in sync with __spark_entry__.py)
STOPWORDS = {
    "en": ["the", "and", "is", "of", "to", "a", "in", "that", "it", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "ein", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "de", "un", "una", "que", "por"],
}

TOKEN_PATTERN = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"  # BPE-ish word/number/punct pieces


def _word_hits(text_col: Column, words: list[str]) -> Column:
    """Count of ``\\b(w1|w2|...)\\b`` matches in lower(text).

    Evaluated as tokenize-once + array membership instead of a regex
    alternation scan: a maximal ``\\w+`` run matches the alternation iff
    it equals one of the words (ASCII ``\\b`` semantics in both Spark and
    the DuckDB/RE2 oracle), so the counts are identical while the text
    is regex-scanned once regardless of lexicon count."""
    return F.size(F.filter(_lower_tokens(text_col), lambda w: w.isin(*words)))


def _lower_tokens(text_col: Column) -> Column:
    """Maximal word-char runs of lower(text) (ASCII \\w, as in \\b)."""
    return F.filter(
        F.split(F.lower(text_col), r"[^0-9a-z_]+"), lambda t: t != F.lit("")
    )


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language heuristic over the fixed lexicons; ties and
    zero-hit rows fall back to 'und' (undetermined).

    Hit counts are materialized once (each regex scan is expensive);
    the arg-max CASE runs over the materialized columns, so the text is
    scanned exactly len(STOPWORDS) times, not O(langs^2)."""
    text = F.col(text_col)
    hit_names = {lang: f"__h_{lang}" for lang in STOPWORDS}
    step = df.withColumn("__toks", _lower_tokens(text)).select(
        "*",
        *[
            F.size(F.filter(F.col("__toks"), lambda w: w.isin(*ws))).alias(hit_names[lang])
            for lang, ws in STOPWORDS.items()
        ],
    )
    best = F.greatest(*[F.col(c) for c in hit_names.values()])
    step = step.withColumn("__best", best)
    # deterministic tie-break: alphabetically-first max-hit lang wins
    # (built in reverse so earlier langs wrap outermost)
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(
            (F.col(hit_names[lang]) == F.col("__best")) & (F.col("__best") > 0), F.lit(lang)
        ).otherwise(pred)
    return step.withColumn(out_col, pred).drop("__best", "__toks", *hit_names.values())


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    text = F.col(text_col)
    ws = F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0)))
    bpe = F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)))
    return df.withColumn("n_ws_tokens", ws).withColumn("n_bpe_tokens", bpe)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / word-length heuristics, folded
    into a [0,1] quality score (weights arbitrary but fixed)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_words = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+"), F.lit(0)))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\sA-Za-z\d]"), F.lit(0)))
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = _word_hits(text, all_stops)
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    mean_word_len = (
        F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / F.greatest(n_words, F.lit(1))
    )
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
        + F.least(stop_ratio * 3, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(F.abs(mean_word_len - 5) / 5, F.lit(1.0))) * 0.2
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("quality", score)
    )


def quality_q4(text_col: str = "text") -> Column:
    """The quality score quantized to 4 decimals via EXACT integer
    arithmetic — algebraically identical to ``with_quality_score`` but
    cross-engine bit-stable. The float form differs between engines in
    the last ulp, which flips ``round(x, 4)`` on .xxxx5 boundaries
    (observed at sf0.1); here every term is a ratio of int64s over the
    common denominator D = 1000*c*w, and the half-up rounding is
    (20000*N + D) div (2*D) — pure integers until one exact division.

    N = 3*c*w*min(words,100)            # 0.3 * min(w/100, 1)
      + 200*w*max(c - 5*punct, 0)       # 0.2 * (1 - min(5p/c, 1))
      + 300*c*min(3*stops, w)           # 0.3 * min(3s/w, 1)
      + 40*c*max(5*w - |alpha - 5*w|,0) # 0.2 * (1 - min(|a/w-5|/5,1))
    with c, w clamped to >= 1 exactly as the float form clamps.

    Intermediates are DECIMAL(38,0), not int64: the dominant term is
    ~2.4e7 * c * w, which wraps int64 once c*w > ~3.8e11 (a multi-MB
    document — routine in a pre-training corpus). Spark strings cap at
    2 GiB so num <= ~1.1e26, well inside 38 digits; the DuckDB oracle
    mirrors with HUGEINT (int128). Still exact integer arithmetic —
    no float enters until the final exact division."""
    t = F.col(text_col)
    c = F.greatest(F.length(t).cast("long"), F.lit(1))
    w_raw = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+"), F.lit(0))).cast("long")
    w = F.greatest(w_raw, F.lit(1))
    p = F.size(F.regexp_extract_all(t, F.lit(r"[^\sA-Za-z\d]"), F.lit(0))).cast("long")
    all_stops = sorted({x for ws in STOPWORDS.values() for x in ws})
    s = _word_hits(t, all_stops).cast("long")
    a = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("long")
    dec = lambda col: col.cast("decimal(38,0)")
    n = (
        F.lit(3) * dec(c) * w * F.least(w_raw, F.lit(100))
        + F.lit(200) * dec(w) * F.greatest(c - 5 * p, F.lit(0))
        + F.lit(300) * dec(c) * F.least(3 * s, w)
        + F.lit(40) * dec(c) * F.greatest(5 * w - F.abs(a - 5 * w), F.lit(0))
    )
    d = F.lit(1000) * dec(c) * w
    num = F.lit(20000) * n + d
    den = F.lit(2) * d
    # (num - num % den) / den: numerator exactly divisible, decimal
    # division of exact multiples is exact (quotient <= 10000)
    return ((num - num % den) / den).cast("long")


def with_fingerprint(
    df: DataFrame, text_col: str = "text", mode: str = "normalized"
) -> DataFrame:
    """Content fingerprint (md5 — stable across engines, so the DuckDB
    oracle can reproduce it).

    * ``mode='normalized'`` — whitespace/case-normalized exact-content
      fingerprint: collapses docs that differ only in spacing/case.
    * ``mode='tokenset'``   — bag-of-words fingerprint: md5 over the
      sorted distinct lowercase tokens; collapses token-reordered and
      token-repeated near-duplicates (the classic shingle-free cheap
      near-dup key). Still one projection, no shuffle.
    """
    if mode == "tokenset":
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
        )
        key = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
        return df.withColumn("fingerprint", F.md5(key))
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(F.trim(normalized)))


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals, used to filter
    degenerate/boilerplate text before pre-training:

    * ``top_bigram_frac`` — occurrences of the most frequent token
      bigram / total bigrams (high = looping text),
    * ``dup_token_frac``  — tokens whose token occurs >= 2 times /
      total tokens (high = low lexical diversity).

    Docs with fewer than 2 tokens emit 0.0 for both (nothing can
    repeat). Ratios rounded to 6 — engine-portable.

    Scale: one explode + two partial-agg groupBys keyed by (doc,
    gram) then doc — no windows, no Python; hot docs stay within
    their reducer because the key includes the doc id (no global hot
    key is possible by construction).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("toks"), bigrams.alias("bigrams")
    )
    tok_stats = (
        base.select("id", F.explode("toks").alias("t"))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_toks"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup_toks"),
        )
    )
    big_stats = (
        base.select("id", F.explode("bigrams").alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram"))
    )
    # anchor on base so zero-token docs still emit a row
    out = (
        base.select("id")
        .join(tok_stats, "id", "left")
        .join(big_stats, "id", "left")
    )
    zero = F.lit(0.0)
    return out.select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("n_toks"), F.lit(0)).cast("long").alias("n_toks"),
        F.round(
            F.when(
                F.col("n_bigrams").isNotNull() & (F.col("n_bigrams") > 0),
                F.col("top_bigram") / F.col("n_bigrams"),
            ).otherwise(zero),
            6,
        ).alias("top_bigram_frac"),
        F.round(
            F.when(F.col("n_toks") > 0, F.col("dup_toks") / F.col("n_toks")).otherwise(
                zero
            ),
            6,
        ).alias("dup_token_frac"),
    )


def corpus_profile(
    df: DataFrame, group_col: str = "lang", chars_col: str = "n_chars"
) -> DataFrame:
    """Per-group corpus statistics: doc count, total chars, and exact
    p25/p50/p75 of document length — the profiling pass that sizes
    downstream sampling/packing decisions.

    Uses EXACT ``percentile`` (R-7 linear interpolation, the same
    definition as DuckDB's ``quantile_cont``) so the numbers are
    engine-reproducible. At 100 TB you'd flip to
    ``approx_percentile(…, accuracy)`` — one pass, bounded memory —
    but a profile that feeds automated mix decisions should start
    exact and relax knowingly, not the reverse.
    """
    c = F.col(chars_col)
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(c).alias("total_chars"),
        F.round(F.percentile(c, F.lit(0.25)), 4).alias("chars_p25"),
        F.round(F.percentile(c, F.lit(0.5)), 4).alias("chars_p50"),
        F.round(F.percentile(c, F.lit(0.75)), 4).alias("chars_p75"),
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 50
) -> DataFrame:
    """Corpus vocabulary: top-k lowercase word tokens by total count,
    with document frequency — the tokenizer-training / corpus-stats
    pass of a pre-training pipeline.

    Output: (token, n_total, n_docs), ordered by n_total desc with
    token asc as the deterministic tiebreak.

    Scale: per-doc counts are pre-aggregated INSIDE the projection
    (aggregate over the token array), so the shuffle carries one row
    per (doc, distinct token), partially combined map-side — a hot
    token ('the') reaches its reducer as one partial sum per map task.
    n_docs is then a plain count, not a count-distinct expand. The
    final ordered limit is a TakeOrdered, not a global sort.
    """
    per_doc = df.select(
        F.col(id_col),
        F.explode(_lower_tokens(F.col(text_col))).alias("token"),
    ).groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("n_in_doc"))
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("n_in_doc").alias("n_total"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy(F.desc("n_total"), F.asc("token"))
        .limit(k)
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    log_idf: bool = False,
) -> DataFrame:
    """Per-document top-k salient terms by tf-idf -> (doc_id, token,
    tf, df, score, rank) — document tagging / keyword fingerprinting
    for a training-data pipeline (what is this doc ABOUT, as opposed
    to :func:`vocab_topk`'s corpus-global vocabulary).

    The default idf is the LINEAR rational (N+1)/(df+1): score =
    tf * (N+1) / (df+1), computed as ONE IEEE-754 double division of
    exact integers — division is correctly rounded, so the score (and
    therefore the ranking) is bit-identical on any engine, which is
    what lets a DuckDB oracle check it value-level. ``log_idf=True``
    switches to the classic smooth ln((N+1)/(df+1)) + 1 for in-engine
    ranking — transcendental, so its last ulp is libm-dependent and it
    is deliberately NOT the cross-engine contract path. Both idfs are
    monotone decreasing in df, so they agree that rarer is saltier;
    rank ties break on token asc, deterministically.

    Scale shape: tf rows are pre-aggregated per (doc, distinct token)
    map-side; the df table is a token-keyed agg joined back on token
    (AQE handles hot-token skew); the top-k is a per-doc window over
    the doc-partitioned tf rows — no global sort, no driver state.
    """
    n = df.count()  # corpus size: one metadata-sized action
    per_doc = df.select(
        F.col(id_col),
        F.explode(_lower_tokens(F.col(text_col))).alias("token"),
    ).groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    joined = per_doc.join(dfreq, "token")
    if log_idf:
        score = F.col("tf") * (
            F.log((F.col("df") + F.lit(1)).cast("double")) * F.lit(-1)
            + F.log(F.lit(float(n + 1)))
            + F.lit(1.0)
        )
    else:
        score = (F.col("tf") * F.lit(n + 1)) / (F.col("df") + F.lit(1))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        joined.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "score", "rank")
    )


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style line/document cleaning heuristics (Raffel et al. 2020,
    public): keep only lines that end in terminal punctuation AND have
    at least ``min_line_words`` words; drop whole documents that contain
    ``lorem ipsum`` or a curly brace, or whose kept lines carry fewer
    than ``min_sentences`` sentences.

    Output per doc: (id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, keep, clean_text) where clean_text is the kept lines
    rejoined — the text a downstream stage would actually train on.

    Scale: one projection over the scan — line split, per-line filters,
    and sentence counting are all array/regex column expressions inside
    whole-stage codegen; no shuffle, no Python, no per-line explode.
    """
    lines = F.split(F.col(text_col), "\n")
    n_words = lambda l: F.size(F.filter(F.split(l, r"\s+"), lambda w: w != F.lit("")))
    keep_line = lambda l: l.rlike(r'[.!?"]\s*$') & (n_words(l) >= min_line_words)
    kept = F.filter(lines, keep_line)
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.split(clean, r"[.!?]")) - 1
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sent.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (n_sent >= min_sentences) & ~has_lorem & ~has_brace
        ).alias("keep"),
        clean.alias("clean_text"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (``#`` and ``...`` occurrences per word), bullet-line and
    ellipsis-line fractions, alphabetic-word fraction, and a required-
    stopword hit count — the standard repetition-independent half of
    the Gopher cleaning stack (the repetition half lives in
    :func:`repetition_scores`).

    Output per doc: the eight measured signals plus ``keep`` (the
    conjunction; NULL-safe — an empty doc fails closed). Every signal
    is defined in engine-portable arithmetic: integer counts from
    split/filter/replace column expressions, ratios as single IEEE
    divisions of those integers, so an external auditor reproduces the
    exact doubles in any engine (the DuckDB contract oracle does).

    Scale: one projection over the scan — all signals are array/regex
    column expressions inside whole-stage codegen; no shuffle, no
    Python, no explode.
    """
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words).cast("long")
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_wl = sum_len / F.nullif(n_words, F.lit(0))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / F.nullif(
        n_words, F.lit(0)
    )
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("long")
    bullet_frac = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*[-*]"))
    ).cast("double") / F.nullif(n_lines, F.lit(0))
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$"))
    ).cast("double") / F.nullif(n_lines, F.lit(0))
    alpha_frac = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("double") / F.nullif(n_words, F.lit(0))
    words_lower = F.transform(words, F.lower)
    stop_hits = None
    for sw in GOPHER_STOPWORDS:
        hit = F.array_contains(words_lower, sw).cast("long")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.cast("double").alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


# --- PII detection / redaction ----------------------------------------------
# The standard pre-training scrub pass (C4/Dolma-style): regex families
# for emails, E.164-ish phone numbers, IPv4 addresses, and 16-digit
# card numbers. Pure JVM column expressions — counting and redaction
# ride the scan inside whole-stage codegen; at 100 TB this is a
# shuffle-free map over the corpus. Patterns use only syntax shared by
# Java regex and RE2 (character classes, bounded repeats, \b), so an
# external auditor can re-run them in any engine.

PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("card", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "[CARD]"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII counts + redacted text -> (id, n_<kind>..., clean).

    Redaction applies the patterns IN ORDER (emails first: their local
    parts may contain digit runs other families would then misread).
    Each family is COUNTED on the text with the previous families
    already redacted — i.e. ``n_<kind>`` is exactly the number of
    ``[KIND]`` tokens this family contributed to ``clean``. Counting on
    the raw text instead would overcount when families overlap (an
    email local-part that also looks like a phone number would report a
    phone that no [PHONE] token corresponds to). Matches are
    leftmost-non-overlapping in every mainstream engine, so the output
    is reproducible outside Spark.
    """
    counts = []
    clean = F.col(text_col)
    for k, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(clean, F.lit(pat)).cast("long").alias(f"n_{k}s"))
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(F.col(id_col), *counts, clean.alias("clean"))


# UTF-8-read-as-Latin-1 mojibake: a multibyte UTF-8 lead byte (C2-DF,
# E0-EF) that survived as a Latin-1 char, followed by a continuation
# byte in the 80-BF range.  The two-char signature (lead + one
# continuation) catches every 2- and 3-byte sequence's head and is
# vanishingly rare in honest Latin-1 text (those leads are accented
# capitals immediately followed by a C1-control or symbol char).
_MOJIBAKE_RE = "[\u00c2-\u00ef][\u0080-\u00bf]"

# RFC 3629 UTF-8 grammar over Latin-1 char values (char == byte value
# for chars <= U+00FF): the pre-decode validity gate
_UTF8_VALID_RE = (
    "^(?:"
    "[\u0000-\u007f]"
    "|[\u00c2-\u00df][\u0080-\u00bf]"
    "|\u00e0[\u00a0-\u00bf][\u0080-\u00bf]"
    "|[\u00e1-\u00ec][\u0080-\u00bf]{2}"
    "|\u00ed[\u0080-\u009f][\u0080-\u00bf]"
    "|[\u00ee-\u00ef][\u0080-\u00bf]{2}"
    "|\u00f0[\u0090-\u00bf][\u0080-\u00bf]{2}"
    "|[\u00f1-\u00f3][\u0080-\u00bf]{3}"
    "|\u00f4[\u0080-\u008f][\u0080-\u00bf]{3}"
    ")*$"
)


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Repair UTF-8-decoded-as-Latin-1 mojibake ("caf\u00c3\u00a9" ->
    "caf\u00e9") -> ``(id, fixed, was_fixed, n_marks)``.

    The transform is the exact inverse of the corruption: re-ENCODE the
    text as ISO-8859-1 (recovering the original UTF-8 byte stream) and
    DECODE it as UTF-8 -- pure JVM column functions, shuffle-free, one
    projection over the scan.  A row is repaired only when ALL of:

    * the mojibake signature matches (a plausible UTF-8 lead-byte char
      followed by a continuation-range char),
    * every char is <= U+00FF (otherwise the Latin-1 re-encode cannot
      reproduce the original bytes -- mixed clean-unicode + mojibake
      rows are left alone rather than corrupted),
    * the char sequence is VALID UTF-8 under the RFC 3629 grammar
      (checked by regex BEFORE decoding -- Spark 4's decode raises on
      malformed streams rather than emitting U+FFFD, and CASE WHEN
      only evaluates the repair branch on rows that pass).

    Windows-1252 mojibake (the a-circumflex + euro + quote cluster for
    a right single quote) involves chars (U+20AC) outside Latin-1 and
    is left unrepaired -- the cp1252 byte map is not among Spark's
    encode charsets; gated rows stay byte-identical.  The signature
    guarantees a multibyte sequence exists, so a valid repair always
    differs from its input.
    """
    c = F.col(text_col)
    repaired = F.decode(F.encode(c, "ISO-8859-1"), "UTF-8")
    safe = (
        c.rlike(_MOJIBAKE_RE)
        & ~c.rlike("[^\u0000-\u00ff]")
        & c.rlike(_UTF8_VALID_RE)
    )
    return df.select(
        F.col(id_col),
        F.when(safe, repaired).otherwise(c).alias("fixed"),
        safe.alias("was_fixed"),
        F.regexp_count(c, F.lit(_MOJIBAKE_RE)).cast("long").alias(
            "n_marks"
        ),
    )


def flesch_reading_ease(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease (206.835 - 1.015 w/s - 84.6 y/w) ->
    ``(id, n_words, n_sentences, n_syllables, flesch)`` — the classic
    readability quality signal, as one shuffle-free codegen'd
    projection.

    Counting rules (pinned so any engine can replay them exactly):
    words = maximal ``[A-Za-z]+`` runs; sentences = maximal ``[.!?]+``
    runs; syllables = maximal ``[aeiouy]+`` vowel groups of the
    lowercased text, plus 1 for every vowel-less word (an "Mr"/"nth"
    floor — every word contributes >= 1).  All three are exact int64;
    w and s clamp to >= 1.  The score is computed as ONE double
    division of two exact int64 polynomials (N = 206835*s*w - 1015*w^2
    - 84600*y*s over D = 1000*s*w), so the only float op is the final
    division + round(4) — bit-identical on any engine with IEEE
    doubles and half-up rounding.
    """
    t = F.col(text_col)
    lower = F.lower(t)
    w_raw = F.regexp_count(t, F.lit("[A-Za-z]+")).cast("long")
    s_raw = F.regexp_count(t, F.lit("[.!?]+")).cast("long")
    groups = F.regexp_count(lower, F.lit("[aeiouy]+")).cast("long")
    silent = F.size(
        F.filter(
            F.split(lower, "[^a-z]+"),
            lambda x: (x != F.lit("")) & ~x.rlike("[aeiouy]"),
        )
    ).cast("long")
    y = groups + silent
    w = F.greatest(w_raw, F.lit(1))
    s = F.greatest(s_raw, F.lit(1))
    num = (
        F.lit(206835) * s * w - F.lit(1015) * w * w - F.lit(84600) * y * s
    )
    den = F.lit(1000) * s * w
    return df.select(
        F.col(id_col),
        w_raw.alias("n_words"),
        s_raw.alias("n_sentences"),
        y.alias("n_syllables"),
        F.round(num.cast("double") / den.cast("double"), 4).alias(
            "flesch"
        ),
    )


# Userinfo (user[:pass]@) is matched non-capturing and STRIPPED — a
# host group stopping at ':' would otherwise parse http://u:p@h/x as
# host='u' with ':p@h/x' folded into the path while still is_valid.
_URL_RE = (
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://(?:[^/?#@]*@)?([^/?#:@]*)(:[0-9]+)?"
    r"([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)

# tracking parameters dropped during canonicalization (the CCNet /
# web-dedup staple set; matched on the exact key or the utm_ prefix)
_TRACKING_KEYS = ("gclid", "fbclid", "msclkid", "ref", "mc_cid", "mc_eid")


def normalize_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonicalize URLs for web-corpus dedup ->
    ``(id, scheme, host, registered_domain, clean_url, is_valid)``.

    Pinned rules (each a pure column expression — one shuffle-free
    projection, and each replayable in any SQL engine):

    * scheme and host lowercased; a leading ``www.`` stripped;
    * explicit ``:80`` / ``:443`` ports dropped (the default-port
      collapse; other ports kept);
    * fragment dropped; trailing ``/`` stripped from non-root paths;
    * query parameters: tracking keys (``utm_*`` prefix + the gclid
      family) dropped, survivors SORTED byte-wise and rejoined — the
      param-order collapse that merges reordered duplicates;
    * ``registered_domain`` = last two host labels (a documented
      heuristic — the full public-suffix list is data, not logic, and
      plugs in by replacing this column);
    * rows that don't parse (``is_valid`` false) pass through with
      ``clean_url`` = the raw input, never nulled.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    rawhost = F.lower(F.regexp_extract(u, _URL_RE, 2))
    port = F.regexp_extract(u, _URL_RE, 3)
    rawpath = F.regexp_extract(u, _URL_RE, 4)
    query = F.regexp_extract(u, _URL_RE, 5)
    host = F.regexp_replace(rawhost, r"^www\.", "")
    keep_port = F.when(
        port.isin(":80", ":443"), F.lit("")
    ).otherwise(port)
    path = F.when(
        (F.length(rawpath) > 1) & rawpath.endswith("/"),
        rawpath.substr(F.lit(1), F.length(rawpath) - 1),
    ).otherwise(rawpath)
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != F.lit(""))
        & ~F.split(kv, "=").getItem(0).startswith("utm_")
        & ~F.split(kv, "=").getItem(0).isin(*_TRACKING_KEYS),
    )
    clean_q = F.array_join(F.sort_array(params), "&")
    labels = F.split(host, r"\.")
    nlab = F.size(labels)
    reg_dom = F.when(
        nlab >= 2,
        F.concat(
            F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)
        ),
    ).otherwise(host)
    ok = u.rlike(_URL_RE) & (F.length(rawhost) > 0)
    clean = F.concat(
        scheme, F.lit("://"), host, keep_port, path,
        F.when(clean_q != "", F.concat(F.lit("?"), clean_q)).otherwise(
            F.lit("")
        ),
    )
    return df.select(
        F.col(id_col),
        F.when(ok, scheme).otherwise(F.lit(None)).alias("scheme"),
        F.when(ok, host).otherwise(F.lit(None)).alias("host"),
        F.when(ok, reg_dom).otherwise(F.lit(None)).alias(
            "registered_domain"
        ),
        F.when(ok, clean).otherwise(u).alias("clean_url"),
        ok.alias("is_valid"),
    )
