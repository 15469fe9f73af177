"""Fixtures F1/F2 — GraphFrame parity with graph_frame.rs tests
(ring degrees graph_frame.rs:232-289, missing-column errors :291-336)."""

import pytest
from pyspark.sql import functions as F

from pregel_rs_spark import GraphFrame, MissingColumnError

pytestmark = pytest.mark.smoke


def ring_edges(spark):
    rows = [(i, i % 10 + 1) for i in range(1, 11)]
    return spark.createDataFrame(rows, "subject long, object long")


def test_from_edges(spark):
    g = GraphFrame.from_edges(ring_edges(spark))
    assert g.vertices.count() == 10
    assert g.edges.count() == 10
    ids = sorted(r.vertex_id for r in g.vertices.collect())
    assert ids == list(range(1, 11))


def test_out_degree(spark):
    g = GraphFrame.from_edges(ring_edges(spark))
    od = g.out_degrees()
    assert od.count() == 10
    assert od.agg(F.sum("out_degree")).collect()[0][0] == 10
    assert od.columns == ["vertex_id", "out_degree"]


def test_in_degree(spark):
    g = GraphFrame.from_edges(ring_edges(spark))
    ind = g.in_degrees()
    assert ind.count() == 10
    assert ind.agg(F.sum("in_degree")).collect()[0][0] == 10
    # reference quirk: key column keeps the name `object` (graph_frame.rs:206-214)
    assert ind.columns == ["object", "in_degree"]


def test_degrees_full_keep_zero(spark):
    # v3 has no out-edges, v1 no in-edges
    e = spark.createDataFrame([(1, 2), (2, 3)], "subject long, object long")
    g = GraphFrame.from_edges(e)
    od = {r.vertex_id: r.out_degree for r in g.out_degrees_full().collect()}
    assert od == {1: 1, 2: 1, 3: 0}
    ind = {r.vertex_id: r.in_degree for r in g.in_degrees_full().collect()}
    assert ind == {1: 0, 2: 1, 3: 1}


def test_missing_vertex_id(spark):
    v = spark.createDataFrame([(1,)], "not_id long")
    e = ring_edges(spark)
    with pytest.raises(MissingColumnError, match="Missing column vertex_id in vertices"):
        GraphFrame(v, e)


def test_missing_subject(spark):
    v = spark.createDataFrame([(1,)], "vertex_id long")
    e = spark.createDataFrame([(1, 2)], "src long, object long")
    with pytest.raises(MissingColumnError, match="Missing column subject in edges"):
        GraphFrame(v, e)


def test_missing_object(spark):
    v = spark.createDataFrame([(1,)], "vertex_id long")
    e = spark.createDataFrame([(1, 2)], "subject long, dst long")
    with pytest.raises(MissingColumnError, match="Missing column object in edges"):
        GraphFrame(v, e)
