"""spark-submit entry point: prepare a training-ready corpus from a raw
documents table — the LLM-data-pipeline twin of jobs/build_kg_job.py.

Usage:
    spark-submit --py-files sparkmedkg.zip jobs/prep_corpus_job.py \
        --docs /path/to/documents.parquet --out /path/to/prepped \
        [--quality-min 0.1] [--pack-block 64]

Stages (each an independently oracle-gated operator):
  1. composed quality gate  trainprep.training_ready — lang filter, quality
     floor, exact-dedup canonical keep, near-dup drop (prefix-filtered
     exact Jaccard, never all-pairs)
  2. chunk-level dedup      webclean.chunk_dedup applied to survivors
     (C4-style duplicate-span removal)
  3. decontamination        corpusops.decontaminate overlaps are REPORTED
     (the eval split here is the synthetic doc_id % mod convention;
     production swaps in its own eval shingle set)
  4. sequence packing       corpusops.pack_sequences over the cleaned text

Writes:
  --out/train.parquet     per-document sequence placement rows
                          (doc_id, n_tokens, start_off, first_seq,
                          last_seq, clean_text) — each cleaned doc with
                          its token offset and the packed-sequence ids
                          it lands in; a loader reconstructs sequence
                          seq_id by concatenating clean_text of docs
                          with first_seq <= seq_id <= last_seq in
                          doc_id order, slicing at the block boundary
  --out/metrics.json      one JSON line of per-stage counts (the lineage
                          record a pipeline run leaves behind)
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="path to documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--quality-min", type=float, default=None)
    ap.add_argument("--pack-block", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sparkmedkg import corpusops, trainprep, webclean
    from sparkmedkg.session import get_spark

    spark = get_spark(app_name="prep-corpus", master=args.master)
    t0 = time.time()
    # the sf_dir contract: operators read {sf_dir}/documents.parquet
    sf_dir = os.path.dirname(os.path.abspath(args.docs))

    n_raw = spark.read.parquet(args.docs).count()

    # 1. composed gate (lang + quality + exact canonical + near-dup drop)
    kw = {}
    if args.quality_min is not None:
        kw["quality_min"] = args.quality_min
    ready = trainprep.training_ready(spark, sf_dir, **kw).select("doc_id")
    ready = ready.persist()
    n_ready = ready.count()

    # 2. C4-style duplicate-span removal, restricted to survivors
    cleaned = (
        webclean.chunk_dedup(spark, sf_dir)
        .join(ready, "doc_id", "left_semi")
        .persist()
    )
    n_cleaned = cleaned.count()

    # 3. decontamination report (docs sharing k-grams with the eval split)
    contaminated = (
        corpusops.decontaminate(spark, sf_dir)
        .join(ready, "doc_id", "left_semi")
        .count()
    )

    # 4. pack the SURVIVORS' cleaned text into fixed-token sequences
    pk = {}
    if args.pack_block is not None:
        pk["block"] = args.pack_block
    packed = corpusops.pack_sequences_df(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), **pk
    ).join(cleaned.select("doc_id", "clean_text"), "doc_id")
    stats = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.max("last_seq") + 1).alias("n_seqs"),
    ).collect()[0]

    packed.write.mode("overwrite").parquet(f"{args.out}/train.parquet")
    ready.unpersist()
    cleaned.unpersist()
    n_seqs = int(stats["n_seqs"] or 0)
    n_tokens = stats["n_tokens"]

    metrics = {
        "docs_raw": n_raw,
        "docs_training_ready": n_ready,
        "docs_after_chunk_dedup": n_cleaned,
        "docs_contaminated": contaminated,
        "train_sequences": n_seqs,
        "train_tokens": int(n_tokens or 0),
        "wall_sec": round(time.time() - t0, 2),
    }
    with open(f"{args.out}/metrics.json", "w") as f:
        f.write(json.dumps(metrics) + "\n")
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
