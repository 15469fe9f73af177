"""GraphFrame — the relational graph data model.

Parity with /root/reference/src/graph_frame.rs: a graph is two DataFrames,
``vertices`` (required column ``vertex_id``) and ``edges`` (required columns
``subject`` and ``object``); arbitrary extra property columns are allowed on
both.  There is no adjacency structure — the graph is purely relational and
every graph operation is a DataFrame plan optimized by Catalyst.

Scale notes (100 TB / 10^12-doc design point):
  * ``from_edges`` is `select → unionAll → distinct` — one shuffle on the id,
    partial-aggregated map-side by Spark automatically.
  * degrees are single hash aggregations with map-side partial combine; no
    join unless the zero-degree-preserving variant is requested.
  * ids should be 64-bit (``F.xxhash64(url)`` upstream) so shuffles move
    fixed-width keys, never strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pregel_rs_spark.columns import OBJECT, SUBJECT, VERTEX_ID


class MissingColumnError(ValueError):
    """A required graph column is absent.

    Message strings mirror the reference exactly
    (graph_frame.rs:90-100, asserted at graph_frame.rs:291-336).
    """

    @classmethod
    def vertex_id(cls) -> "MissingColumnError":
        return cls(f"Missing column {VERTEX_ID} in vertices")

    @classmethod
    def subject(cls) -> "MissingColumnError":
        return cls(f"Missing column {SUBJECT} in edges")

    @classmethod
    def object_(cls) -> "MissingColumnError":
        return cls(f"Missing column {OBJECT} in edges")


class GraphFrame:
    """A graph as two DataFrames (graph_frame.rs:16-22, 127-139)."""

    def __init__(
        self, vertices: DataFrame, edges: DataFrame, *, closed: bool = False
    ) -> None:
        if VERTEX_ID not in vertices.columns:
            raise MissingColumnError.vertex_id()
        if SUBJECT not in edges.columns:
            raise MissingColumnError.subject()
        if OBJECT not in edges.columns:
            raise MissingColumnError.object_()
        self.vertices = vertices
        self.edges = edges
        # closed-world: every edge endpoint is guaranteed present in
        # ``vertices`` (true by construction for from_edges) — lets the
        # Pregel engine drop vertex-side triplet joins whose only remaining
        # purpose would be endpoint filtering.
        self.closed = closed

    # -- constructors ---------------------------------------------------------

    @classmethod
    def from_edges(cls, edges: DataFrame) -> "GraphFrame":
        """Derive the vertex set as distinct(src ∪ dst)
        (graph_frame.rs:155-172)."""
        vertices = (
            edges.select(F.col(SUBJECT).alias(VERTEX_ID))
            .unionAll(edges.select(F.col(OBJECT).alias(VERTEX_ID)))
            .distinct()
        )
        return cls(vertices, edges, closed=True)

    # -- degrees --------------------------------------------------------------

    def out_degrees(self) -> DataFrame:
        """Per-source edge counts as ``(vertex_id, out_degree)``.

        Reference parity (graph_frame.rs:185-193) including its quirk:
        vertices with zero out-edges are ABSENT (no join back to vertices).
        Use :meth:`out_degrees_full` when dangling vertices matter.
        """
        return self.edges.groupBy(F.col(SUBJECT).alias(VERTEX_ID)).agg(
            F.count(OBJECT).alias("out_degree")
        )

    def in_degrees(self) -> DataFrame:
        """Per-destination edge counts as ``(object, in_degree)``.

        Reference parity (graph_frame.rs:206-214) including its quirk: the
        group key keeps the name ``object`` (not renamed to ``vertex_id``).
        """
        return self.edges.groupBy(F.col(OBJECT)).agg(
            F.count(SUBJECT).alias("in_degree")
        )

    def out_degrees_full(self) -> DataFrame:
        """All vertex columns + ``out_degree`` with zero-degree vertices kept
        (our extension; needed for dangling-mass handling — SURVEY §1.4)."""
        counts = self.out_degrees()
        return self.vertices.join(counts, VERTEX_ID, "left").withColumn(
            "out_degree", F.coalesce(F.col("out_degree"), F.lit(0))
        )

    def in_degrees_full(self) -> DataFrame:
        """All vertex columns + ``in_degree`` with zero-degree vertices kept."""
        counts = self.in_degrees().withColumnRenamed(OBJECT, VERTEX_ID)
        return self.vertices.join(counts, VERTEX_ID, "left").withColumn(
            "in_degree", F.coalesce(F.col("in_degree"), F.lit(0))
        )
