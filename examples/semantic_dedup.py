"""Semantic deduplication (the SemDeDup shape — Abbas et al. 2023, public
technique): k-means cluster the embedding corpus, then find cosine
near-duplicates ONLY within clusters — the pairwise work is bounded by the
largest cluster, never corpus × corpus.

This composes two driver-verified operators end-to-end:

  1. ``kmeans_assign``       — deterministic Lloyd clustering (broadcast
                               assignment, scaled-integer centroid sums);
  2. ``embedding_cosine_dups`` blocked by the CLUSTER id — the block cap
                               (``max_block``) keeps a degenerate cluster
                               from re-introducing the O(n²) blow-up.

At 100 TB, step 1's assignment is the write-time pass that also feeds the
IVF ANN index (same (cell_id, cent) contract), so semantic dedup rides an
index the corpus needs anyway.

Run locally:      python examples/semantic_dedup.py [--sf-dir /root/testdata/sf0.01]
Run on a cluster: ./examples/submit.sh examples/semantic_dedup.py --sf-dir ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pregel_rs_spark.operators.dedup import embedding_cosine_dups
from pregel_rs_spark.operators.similarity import kmeans_assign
from pregel_rs_spark.sources.io import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--clusters", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.3)
    args = ap.parse_args()

    spark = get_spark("semantic-dedup", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))

    # 1. deterministic k-means assignment (2 Lloyd iterations)
    assign = kmeans_assign(emb, n_clusters=args.clusters, iters=2)
    sizes = assign.groupBy("cluster_id").count().orderBy("cluster_id")
    print("cluster sizes:")
    sizes.show()

    # 2. cosine near-dups WITHIN clusters only
    blocked = emb.join(assign.select("vec_id", "cluster_id"), "vec_id")
    dups = embedding_cosine_dups(
        blocked, threshold=args.threshold, block_col="cluster_id"
    )
    n_pairs = dups.count()
    survivors = emb.count() - dups.select("vec_b").distinct().count()
    print(f"near-dup pairs (cosine >= {args.threshold}): {n_pairs}")
    print(f"semantic survivors: {survivors}/{emb.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
