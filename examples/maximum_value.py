"""Max-value propagation as a Pregel builder config — parity with the
reference example (/root/reference/examples/maximum_value.rs:19-43).

Run locally:      python examples/maximum_value.py
Run on a cluster: ./examples/submit.sh examples/maximum_value.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pregel_rs_spark import GraphFrame
from pregel_rs_spark.algorithms import max_value
from pregel_rs_spark.sources.io import get_spark


def main() -> None:
    spark = get_spark("example-max-value")
    spark.sparkContext.setLogLevel("ERROR")

    # The reference example's fixture (maximum_value.rs:10-17): 4 vertices
    # with values [3, 6, 2, 1], 6 edges.
    vertices = spark.createDataFrame(
        [(0, 3), (1, 6), (2, 2), (3, 1)], "vertex_id long, value long"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 3), (2, 1), (2, 3), (3, 2)],
        "subject long, object long",
    )
    g = GraphFrame(vertices, edges)

    result = max_value(g, value_column="value", max_iterations=10)
    result.orderBy("vertex_id").show()  # max_value == 6 for every vertex
    spark.stop()


if __name__ == "__main__":
    main()
