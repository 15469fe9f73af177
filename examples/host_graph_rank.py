"""Host-graph analytics: pages → domain (host) edge rollup → weighted-ish
PageRank over hosts + per-host corpus stats + anchor-text rollup.

The host graph is the standard web-scale reduction (~3 orders of magnitude
fewer vertices than the page graph): rank hosts first, then allocate crawl /
training-data budget per host.  Everything below is pure Catalyst except the
two pandas-UDF extraction boundaries.

Run locally:      python examples/host_graph_rank.py [--pages 20000]
Run on a cluster: ./examples/submit.sh examples/host_graph_rank.py --pages 10000000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pregel_rs_spark import GraphFrame
from pregel_rs_spark.algorithms import pagerank
from pregel_rs_spark.functions.extract import (
    anchor_text_rollup,
    domain_edges,
    domain_stats,
)
from pregel_rs_spark.sources.io import get_spark
from pregel_rs_spark.sources.synth import synth_pages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark("host-graph-rank", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    pages = synth_pages(spark, args.pages, seed=42).cache()

    # host-level link graph; weight = distinct page links between hosts
    hedges = domain_edges(pages).cache()
    n_hosts = (
        hedges.select("subject").union(hedges.select("object")).distinct().count()
    )
    print(f"host graph: {hedges.count()} host-pairs over {n_hosts} hosts")

    # PageRank over the host graph (unweighted BSP run on the rolled-up
    # edges; hosts with heavy mutual linkage dominate)
    g = GraphFrame.from_edges(hedges.select("subject", "object"))
    ranks = pagerank(g, tol=1e-9, max_iterations=50)

    names = hedges.select(
        F.col("subject").alias("vertex_id"), F.col("src_domain").alias("host")
    ).distinct()
    top = (
        ranks.join(names, "vertex_id", "left")
        .orderBy(F.desc("rank"))
        .select("host", F.round("rank", 6).alias("rank"))
        .limit(10)
    )
    print("top hosts by rank:")
    for r in top.collect():
        print(f"  {r.host}  {r.rank}")

    print("per-host corpus stats (5):")
    for r in domain_stats(pages).orderBy(F.desc("n_pages")).limit(5).collect():
        print(f"  {r.domain}: pages={r.n_pages} chars={r.total_chars} "
              f"langs={r.n_langs}")

    print("most common anchor texts (5):")
    for r in (
        anchor_text_rollup(pages)
        .groupBy("anchor").agg(F.sum("n").alias("n"))
        .orderBy(F.desc("n")).limit(5).collect()
    ):
        print(f"  {r.anchor!r}: {r.n}")

    spark.stop()


if __name__ == "__main__":
    main()
