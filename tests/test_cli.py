"""python -m pregel_rs_spark CLI: end-to-end on a micro graph."""

import os

from pregel_rs_spark.__main__ import main


def test_cli_pagerank_roundtrip(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "subject long, object long"
    )
    epath = os.path.join(tmp_path, "edges")
    opath = os.path.join(tmp_path, "ranks")
    edges.write.parquet(epath)
    rc = main([
        "pagerank", "--edges", epath, "--out", opath,
        "--max-iter", "5", "--cores", "4",
    ])
    assert rc == 0
    out = spark.read.parquet(opath)
    assert out.count() == 4
    assert {"vertex_id", "rank"} <= set(out.columns)


def test_cli_histogram_and_reciprocity(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "subject long, object long"
    )
    epath = os.path.join(tmp_path, "e2")
    edges.write.parquet(epath)
    for algo, ncols in (("histogram", 4), ("reciprocity", 3)):
        opath = os.path.join(tmp_path, f"out_{algo}")
        assert main([algo, "--edges", epath, "--out", opath,
                     "--cores", "4"]) == 0
        df = spark.read.parquet(opath)
        assert len(df.columns) == ncols and df.count() >= 1
