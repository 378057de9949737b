#!/usr/bin/env python
"""spark-submit entry: curate a document corpus for LLM training.

  spark-submit --py-files pawpaw_spark.zip jobs/curate_corpus.py \
      --input /data/documents_parquet --output /data/curated

Chains the training-data operators into the standard curation order —
each stage drops rows so later (more expensive) stages see less data:

  1. Gopher quality rules   (text.gopher_filters; cheap column math)
  2. C4 line cleaning       (text.c4_filters; rewrites clean_text)
  3. PII redaction          (text.pii_scrub)
  4. exact dedup            (first arrival per content hash)
  5. MinHash near-dup       (dedup.minhash_pairs; drops the larger
                             doc_id of each near-dup pair)
  6. bigram-LM perplexity   (lm.bigram_lm trained on survivors; drop
                             the worst --ppl-drop fraction)
  7. leakage-safe split     (sampling.leakage_safe_split train/val/test)

Writes <output>/curated (doc_id, text, lang, split, avg_nll) plus
<output>/stats.json with per-stage survivor counts, and prints the
stats JSON line. Every stage is the same operator the contract
value-checks; this job is the production composition. The pipeline
body is the importable :func:`curate` (tested end-to-end in
tests/test_curate_corpus.py the way build_kg is); main() only parses
args and owns the session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def curate(
    spark,
    input_path: str,
    output: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    min_stop_hits: int = 2,
    jaccard: float = 0.8,
    ppl_drop: float = 0.1,
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    skip_c4: bool = False,
    lang_keep: set[str] | None = None,
    dsir_target: str | None = None,
    dsir_keep: int = 0,
) -> dict:
    """Run the full curation composition; returns the per-stage stats
    dict (also written to <output>/stats.json)."""
    from pyspark.sql import functions as F

    t0 = time.time()
    docs = spark.read.parquet(input_path)
    tcol, icol = text_col, id_col
    stats: dict = {"input": docs.count()}

    # 1. Gopher rules — pure column math, evaluated next to the scan
    from pawpaw_spark.operators.text import (
        c4_filters,
        gopher_filters,
        pii_scrub,
    )

    g = gopher_filters(
        docs, text_col=tcol, id_col=icol,
        min_words=min_words, min_stop_hits=min_stop_hits,
    )
    docs = docs.join(
        g.filter(F.col("keep")).select(icol), icol, "semi"
    )
    stats["after_gopher"] = docs.count()

    # 2. C4 line cleaning — replaces text with the kept lines
    if not skip_c4:
        c = c4_filters(docs, text_col=tcol, id_col=icol)
        docs = (
            docs.drop(tcol)
            .join(
                c.filter(F.col("keep")).select(
                    icol, F.col("clean_text").alias(tcol)
                ),
                icol,
            )
        )
        stats["after_c4"] = docs.count()

    # 3. PII redaction — replace text with the redacted form
    red = pii_scrub(docs, text_col=tcol, id_col=icol)
    docs = docs.drop(tcol).join(
        red.select(icol, F.col("clean").alias(tcol)), icol
    )

    # 4. exact dedup — first arrival (min id) per content hash
    h = docs.select(icol, F.sha2(F.col(tcol), 256).alias("__h"))
    first = h.groupBy("__h").agg(F.min(icol).alias(icol))
    docs = docs.join(first.select(icol), icol, "semi")
    stats["after_exact_dedup"] = docs.count()

    # 5. MinHash near-dup — drop the larger id of each verified pair;
    # keep the pair table: it is also the leakage graph for step 7
    from pawpaw_spark.operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        docs.select(F.col(icol).cast("string").alias("doc_id"),
                    F.col(tcol).alias("text")),
        threshold=jaccard,
    ).select("a", "b").persist()
    losers = pairs.select(F.greatest("a", "b").alias("__loser")).distinct()
    docs = docs.join(
        losers,
        docs[icol].cast("string") == losers["__loser"],
        "left_anti",
    )
    stats["after_neardup"] = docs.count()

    # 6. LM perplexity cut — train on survivors, drop the worst tail
    from pawpaw_spark.operators.lm import bigram_lm, perplexity_score

    uni, bi, vocab = bigram_lm(docs, text_col=tcol, id_col=icol)
    scored = perplexity_score(
        docs, uni, bi, vocab, text_col=tcol, id_col=icol
    )
    if ppl_drop > 0:
        cut = scored.approxQuantile("avg_nll", [1.0 - ppl_drop], 0.001)[0]
        keep_ids = scored.filter(F.col("avg_nll") <= cut).select(icol)
    else:
        keep_ids = scored.select(icol)
    docs = docs.join(keep_ids, icol, "semi").join(
        scored.select(icol, "avg_nll"), icol, "left"
    )
    stats["after_perplexity"] = docs.count()

    # the optional stages below scan `docs` several times each (NB
    # train + predict, DSIR raw + target + selection); without a
    # lineage cut every scan replays the whole stage-1..6 pipeline and
    # the job multiplies into minutes.  localCheckpoint here is the
    # local[] stand-in for what production does anyway: write each
    # stage's survivors before fanning out (build_kg's staging
    # discipline).
    if lang_keep or (dsir_target and dsir_keep > 0):
        docs = docs.localCheckpoint()

    # 6b. optional NB language/quality filter (classify.py): trained
    # on the corpus's OWN lang labels (CCNet trains fastText offline;
    # same slot), keep docs whose PREDICTED lang survives
    if lang_keep:
        from pawpaw_spark.operators.classify import nb_predict, nb_train

        counts, priors = nb_train(
            docs.select(F.col("lang").alias("label"), F.col(tcol)),
            text_col=tcol,
            label_col="label",
        )
        pred = nb_predict(docs, counts, priors, text_col=tcol, id_col=icol)
        docs = docs.join(
            pred.filter(
                F.col("pred_label").isin(*sorted(lang_keep))
            ).select(icol),
            icol,
            "semi",
        )
        stats["after_lang_filter"] = docs.count()

    # 6c. optional DSIR importance resample toward a target slice
    # (dsir.py): hashed-ngram likelihood-ratio weights + deterministic
    # Gumbel-top-k — the Xie et al. 2023 data-selection slot
    if dsir_target and dsir_keep > 0:
        from pawpaw_spark.operators.dsir import dsir_weights, gumbel_topk

        target = docs.filter(F.col("lang") == dsir_target)
        if target.isEmpty():
            raise SystemExit(
                f"--dsir-target {dsir_target!r} matches no rows"
            )
        w = dsir_weights(docs, target, text_col=tcol, id_col=icol)
        sel = gumbel_topk(w, dsir_keep, id_col=icol)
        docs = docs.join(sel.select(icol), icol, "semi")
        stats["after_dsir"] = docs.count()

    # 7. leakage-safe split — near-dup components share a split (the
    # step-5 pair graph is exactly the leakage graph: a surviving doc
    # near-dup to a dropped one must not straddle splits with its twin
    # siblings' survivors)
    from pawpaw_spark.operators.sampling import leakage_safe_split

    splits = {
        "train": 1.0 - val_frac - test_frac,
        "val": val_frac,
        "test": test_frac,
    }
    keyed = docs.withColumn("__key", F.col(icol).cast("string"))
    docs = leakage_safe_split(keyed, pairs, splits, key_col="__key").drop(
        "__key"
    )
    pairs.unpersist()
    for s in ("train", "val", "test"):
        stats[f"split_{s}"] = docs.filter(F.col("split") == s).count()

    docs.write.mode("overwrite").partitionBy("split").parquet(
        f"{output}/curated"
    )
    stats["wall_sec"] = round(time.time() - t0, 2)
    os.makedirs(output, exist_ok=True)
    with open(os.path.join(output, "stats.json"), "w") as f:
        json.dump(stats, f)
    return stats


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--min-words", type=int, default=50)
    p.add_argument("--min-stop-hits", type=int, default=2)
    p.add_argument("--jaccard", type=float, default=0.8,
                   help="MinHash near-dup threshold")
    p.add_argument("--ppl-drop", type=float, default=0.1,
                   help="fraction of worst-perplexity docs to drop")
    p.add_argument("--val-frac", type=float, default=0.05)
    p.add_argument("--test-frac", type=float, default=0.05)
    p.add_argument("--skip-c4", action="store_true",
                   help="keep raw text (corpora without sentence lines)")
    p.add_argument("--lang-keep", default=None,
                   help="comma list: train the NB classifier on the "
                        "corpus's own lang labels and keep docs whose "
                        "PREDICTED lang is in the list (CCNet's "
                        "langid-filter slot)")
    p.add_argument("--dsir-target", default=None,
                   help="lang value defining the DSIR target "
                        "distribution (importance-resample toward it)")
    p.add_argument("--dsir-keep", type=int, default=0,
                   help="docs to keep in the DSIR resample (0 = skip)")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pawpaw_spark.session import get_spark

    spark = get_spark(app_name="curate_corpus", master=args.master)
    lang_keep = (
        {s.strip() for s in args.lang_keep.split(",") if s.strip()}
        if args.lang_keep
        else None
    )
    stats = curate(
        spark,
        args.input,
        args.output,
        text_col=args.text_col,
        id_col=args.id_col,
        min_words=args.min_words,
        min_stop_hits=args.min_stop_hits,
        jaccard=args.jaccard,
        ppl_drop=args.ppl_drop,
        val_frac=args.val_frac,
        test_frac=args.test_frac,
        skip_c4=args.skip_c4,
        lang_keep=lang_keep,
        dsir_target=args.dsir_target,
        dsir_keep=args.dsir_keep,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
