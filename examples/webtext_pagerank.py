"""End-to-end flagship: Common-Crawl-style pages → byte-exact text + link
extraction (vectorized pandas UDFs) → xxhash64 edge table → PageRank to
convergence with checkpoint/resume — the north-star pipeline at example scale.

Run locally:      python examples/webtext_pagerank.py [--pages 50000]
Run on a cluster: ./examples/submit.sh examples/webtext_pagerank.py --pages 10000000
                  (swap --checkpoint-root for an Iceberg catalog + warehouse
                  path on a real deployment; the TableStore API is identical)
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pregel_rs_spark import GraphFrame
from pregel_rs_spark.algorithms import pagerank
from pregel_rs_spark.functions.extract import pages_to_edges, pages_to_vertices
from pregel_rs_spark.plans.checkpoint import CheckpointStore
from pregel_rs_spark.sources.io import get_spark
from pregel_rs_spark.sources.synth import synth_pages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=50_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument(
        "--checkpoint-root",
        default=os.path.join(tempfile.gettempdir(), "webtext_pagerank_ckpt"),
    )
    args = ap.parse_args()

    spark = get_spark("example-webtext-pagerank")
    spark.sparkContext.setLogLevel("ERROR")

    pages = synth_pages(spark, args.pages, seed=args.seed)
    edges = pages_to_edges(pages).select("subject", "object").distinct()
    graph = GraphFrame.from_edges(edges)

    store = CheckpointStore(
        spark, args.checkpoint_root, config_token=f"pagerank-{args.pages}-{args.seed}"
    )
    ranks = pagerank(
        graph, tol=args.tol, max_iterations=60,
        checkpoint_store=store, checkpoint_every=5,
    )

    # attach urls back for the top-10 report
    urls = pages_to_vertices(pages).select("vertex_id", "url")
    top = (
        ranks.join(urls, "vertex_id")
        .orderBy(F.desc("rank"))
        .select("url", F.round("rank", 8).alias("rank"))
        .limit(10)
    )
    top.show(truncate=False)
    for m in ranks.pregel_metrics[-3:]:
        print(f"superstep {m.superstep}: delta={m.delta:.2e} "
              f"messages={m.messages} wall={m.wall_seconds:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
