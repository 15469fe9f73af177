"""Training-corpus assembly end-to-end: documents → Gopher-rule quality
screen → near-dup clustering (MinHash/LSH → star connected components) →
per-document verdicts (dedup survivorship, token bounds, quality floor) →
surviving corpus written out.

This is the LLM-data-pipeline composition at example scale; every stage is
the same operator the driver contract verifies against exact SQL oracles.

Run locally:      python examples/corpus_dedup.py [--sf-dir /root/testdata/sf0.01]
Run on a cluster: ./examples/submit.sh examples/corpus_dedup.py --sf-dir ...
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pregel_rs_spark.operators.dedup import dedup_clusters
from pregel_rs_spark.operators.pipeline import corpus_filter
from pregel_rs_spark.operators.text import (
    gopher_quality,
    quality_scores,
    token_counts,
)
from pregel_rs_spark.sources.io import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(tempfile.mkdtemp(), "corpus")

    spark = get_spark("corpus-dedup", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))

    # 0. Gopher-rule screen: repetition/format heuristics, one map-only
    #    scan (at 100 TB this is the cheapest stage — run it first so every
    #    later pairwise stage sees a smaller corpus)
    gq = gopher_quality(docs)
    n_gopher = gq.filter("keep = 1").count()
    print(f"gopher keep: {n_gopher}/{docs.count()}")
    docs = docs.join(gq.filter("keep = 1").select("doc_id"), "doc_id", "left_semi")

    # 1. near-dup clusters: banded LSH candidates -> EXACT-JACCARD
    #    verification (>= 0.4) -> star-CC -> survivors.  Verification
    #    matters: unverified LSH false positives chain under the
    #    transitive closure and fuse most of a homogeneous corpus into
    #    one giant cluster.
    clusters = dedup_clusters(docs, k=5, num_hashes=8, bands=4,
                              max_bucket=50, verify_threshold=0.4)
    n_clusters = clusters.filter("survivor = 1").count()
    print(f"screened documents: {docs.count()}  near-dup clusters: {n_clusters}")

    # 2. per-document verdicts (first failing rule wins, auditable)
    verdicts = corpus_filter(docs, min_tokens=20, min_score=0.6)
    verdicts.groupBy("verdict").count().orderBy("verdict").show()

    # 3. the surviving corpus: near-dup survivors ∩ verdict keepers,
    #    with analysis columns attached for downstream samplers
    kept = (
        docs.join(clusters.filter("survivor = 1").select("doc_id"), "doc_id", "left_semi")
        .join(verdicts.filter("keep = 1").select("doc_id"), "doc_id", "left_semi")
        .join(token_counts(docs).select("doc_id", "ws_tokens"), "doc_id")
        .join(quality_scores(docs).select("doc_id", "score"), "doc_id")
    )
    kept.write.mode("overwrite").parquet(out)
    print(f"kept {spark.read.parquet(out).count()} documents -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
