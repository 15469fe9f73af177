"""Bucketed edge/vertex storage: write-once co-location for the link graph.

At 100 TB the edge table is the fact table every job touches, and almost
every operator keys it the same way (``subject``): degree aggregation,
the Pregel triplet join, triangle orientation, domain rollups.  A plain
parquet scan makes each of those jobs pay a full-table Exchange to get
hash clustering on the key; ``repartition().persist()`` amortizes it only
WITHIN one job.  Spark's native bucketing moves that shuffle to write
time: ``bucketBy(n, key)`` fixes file-to-bucket assignment by
``hash(key) % n``, the catalog remembers it, and any later scan exposes
``HashPartitioning(key, n)`` to the planner — so a ``groupBy(key)`` or a
join against an identically-bucketed table plans with ZERO Exchange, in
every job, forever, including the fresh process a checkpoint resume
starts in (tests/test_bucketed.py pins both plan shapes).

This is deliberately the reference's missing storage layer re-thought for
Spark (weso/pregel-rs holds edges in a transient in-memory Polars frame —
src/graph_frame.rs:17-21 — so it has no cross-job layout to exploit; the
Iceberg story in sources/io.py is the cluster-catalog variant of the same
idea).  Bucket count rule of thumb at scale: total edge bytes / ~256 MB,
rounded to a power of two — 100 TB → ~2^18 buckets; local tests use 8.

Bucketed tables need a table catalog (bucket metadata lives there, not in
the files).  The session's in-memory catalog works for single-process
runs; on a cluster you'd back it with the metastore / Iceberg catalog.
``path=`` makes the table EXTERNAL so the data outlives ``DROP TABLE``
and lands somewhere a test can clean up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..columns import OBJECT, SUBJECT


def write_bucketed(
    df: DataFrame,
    name: str,
    buckets: int,
    key: str = SUBJECT,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a parquet table bucketed (and by default sorted)
    by ``key``.

    ``sort=True`` additionally sorts within each bucket file, which lets a
    sort-merge join over two co-bucketed tables skip its Sort nodes when
    Spark reads one file per bucket (``spark.sql.legacy.bucketedTableScan``
    aside, the Exchange elimination alone is the scale win — the sort is
    opportunistic).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Scan a bucketed table THROUGH THE CATALOG (``spark.table``) — a
    direct ``spark.read.parquet(path)`` on the same files would lose the
    bucket spec and re-shuffle downstream."""
    return spark.table(name)


def write_bucketed_edges(
    edges: DataFrame,
    name: str,
    buckets: int,
    path: str | None = None,
) -> None:
    """Edge-table convenience: bucket by ``subject`` (the key of the
    send-messages join and of out-degree aggregation).  Jobs that key by
    ``object`` (in-degrees) still shuffle — if a workload is
    in-degree-heavy, write a second table bucketed by ``object``; at
    web scale two layouts of the edge list is the standard trade
    (storage is cheap, the per-job 100 TB shuffle is not)."""
    if SUBJECT not in edges.columns or OBJECT not in edges.columns:
        raise ValueError(
            f"edge table must have ({SUBJECT}, {OBJECT}) columns; "
            f"got {edges.columns}"
        )
    write_bucketed(edges, name, buckets, key=SUBJECT, path=path)


def write_bucketed_edges_by_object(
    edges: DataFrame,
    name: str,
    buckets: int,
    path: str | None = None,
) -> None:
    """The second standard layout: bucketed by ``object`` — makes
    in-degree aggregation and any object-keyed join Exchange-free (the
    dual of :func:`write_bucketed_edges`; "two layouts of the edge list"
    is the web-scale trade the subject-bucketed docstring describes —
    storage is cheap, the per-job 100 TB shuffle is not).  Plan shape
    pinned in tests/test_bucketed.py."""
    if SUBJECT not in edges.columns or OBJECT not in edges.columns:
        raise ValueError(
            f"edge table must have ({SUBJECT}, {OBJECT}) columns; "
            f"got {edges.columns}"
        )
    write_bucketed(edges, name, buckets, key=OBJECT, path=path)
