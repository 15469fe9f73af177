"""The FULL pretraining-data build, documents → training sequences — every
stage a driver-oracled operator, composed the way a production corpus run
composes them:

  1. mojibake repair               (fix_mojibake         — encoding hygiene)
  2. blocklist screen              (blocklist_filter     — C4-style)
  3. Gopher quality rules          (gopher_quality)
  4. near-dup clustering           (dedup_clusters       — MinHash/LSH → star-CC)
  5. benchmark decontamination     (contamination        — n-gram overlap)
  6. source mixture sampling       (corpus_mix           — budget-weighted)
  7. train/valid/test split        (corpus_split         — growth-stable)
  8. sequence packing              (pack_sequences       — ctx-window spans)

Run locally:      python examples/train_corpus.py [--sf-dir /root/testdata/sf0.01]
Run on a cluster: ./examples/submit.sh examples/train_corpus.py --sf-dir ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pregel_rs_spark.operators.dedup import dedup_clusters
from pregel_rs_spark.operators.pipeline import (
    contamination,
    corpus_mix,
    corpus_split,
    pack_sequences,
)
from pregel_rs_spark.operators.text import (
    blocklist_filter,
    fix_mojibake,
    gopher_quality,
)
from pregel_rs_spark.sources.io import get_spark, load_table


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--ctx-len", type=int, default=512)
    ap.add_argument("--token-budget", type=int, default=20_000)
    args = ap.parse_args()

    spark = get_spark("train-corpus-example", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf_dir, "documents")
    n0 = docs.count()

    # 1. encoding hygiene — downstream stages read the repaired text
    docs = (
        fix_mojibake(docs)
        .drop("text")
        .withColumnRenamed("fixed_text", "text")
        .drop("changed", "chars_fixed")
    )

    # 2-3. cheap map-only screens first (cut the corpus before joins)
    blocked = blocklist_filter(docs, ["badword", "spam spam"])
    gopher = gopher_quality(docs)
    keep_ids = (
        blocked.filter(F.col("blocked") == 0)
        .select("doc_id")
        .join(gopher.filter(F.col("keep") == 1).select("doc_id"), "doc_id")
    )
    screened = docs.join(keep_ids, "doc_id")
    n_screened = screened.count()

    # 4. near-dup clustering; keep only survivors
    # exact-Jaccard verification kills LSH false-positive chaining (the
    # tiny synth vocabulary makes every doc a candidate of every other)
    clusters = dedup_clusters(screened, k=5, num_hashes=8, bands=4,
                              max_bucket=50, verify_threshold=0.4)
    survivors = screened.join(
        clusters.filter(F.col("survivor") == 1).select("doc_id"),
        "doc_id",
    )
    n_dedup = survivors.count()

    # 5. decontamination vs a toy "benchmark" (here: 5 held-out docs)
    bench = docs.orderBy("doc_id").limit(5).select("doc_id", "text")
    contam = contamination(survivors, bench, n=5)
    clean = survivors.join(
        contam.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    n_clean = clean.count()

    # 6. source mixture to the token budget
    mixed = corpus_mix(
        clean,
        weights={"src0": 3.0, "src1": 1.0, "src2": 1.0},
        token_budget=args.token_budget,
    )
    sampled = clean.join(
        mixed.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    )
    n_mix = sampled.count()

    # 7-8. split, then pack the train split into ctx-window sequences
    split = corpus_split(sampled)
    train = sampled.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    packed = pack_sequences(train, ctx_len=args.ctx_len, n_shards=8)
    n_seqs = (
        packed.agg(
            F.count_distinct(F.col("shard"), F.col("seq_first")).alias("s")
        ).first()["s"]
    )

    print(
        f"documents {n0} -> screened {n_screened} -> dedup {n_dedup} "
        f"-> decontaminated {n_clean} -> mixed {n_mix} "
        f"-> train sequences ~{n_seqs} (ctx {args.ctx_len})"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
