"""PageRank as a Pregel builder config — parity with the reference example
(/root/reference/examples/pagerank.rs:22-43), expressed Spark-first.

Run locally:      python examples/pagerank.py
Run on a cluster: ./examples/submit.sh examples/pagerank.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pregel_rs_spark import GraphFrame, MessageReceiver, PregelBuilder, msg, subject
from pregel_rs_spark.sources.io import get_spark


def main() -> None:
    spark = get_spark("example-pagerank")
    spark.sparkContext.setLogLevel("ERROR")

    # The reference example's 4-edge graph (pagerank.rs:15-19).
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3)], "subject long, object long"
    )
    graph = GraphFrame.from_edges(edges)
    vertices = graph.out_degrees_full()
    g = GraphFrame(vertices, edges, closed=True)

    damping = 0.85
    n = vertices.count()

    # Builder config mirrors pagerank.rs:25-41 (single send to Object — per
    # SURVEY §5.3 Q1 the reference's chained second send is inert; ours
    # would union both, so the parity config uses one).
    result = (
        PregelBuilder(g)
        .max_iterations(4)
        .with_vertex_column("rank")
        .initial_message(F.lit(1.0 / n))
        .send_messages(MessageReceiver.OBJECT, subject("rank") / subject("out_degree"))
        .aggregate_messages(F.sum(msg()))
        .v_prog(F.coalesce(msg(), F.lit(0.0)) * damping + (1.0 - damping) / n)
        .build()
        .run()
    )
    result.orderBy("vertex_id").show()
    spark.stop()


if __name__ == "__main__":
    main()
