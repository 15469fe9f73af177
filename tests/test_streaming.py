"""Streaming ingestion: file-source pages stream → incremental edge
extraction → append sink; equivalence with the batch path per url."""

import os

import pytest
from pyspark.sql import functions as F

from pregel_rs_spark.functions.extract import pages_to_edges
from pregel_rs_spark.sources.synth import synth_pages
from pregel_rs_spark.streaming import (
    dedup_pages_stream,
    run_edges_stream,
    stream_pages,
    stream_pages_to_edges,
)


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """Two micro-batch files of deterministic pages staged into a dir."""
    root = tmp_path_factory.mktemp("stream")
    src = os.path.join(str(root), "pages")
    pages = synth_pages(spark, 300, seed=7, partitions=2)
    pages.filter(F.xxhash64("url") % 2 == 0).write.parquet(
        os.path.join(src, "batch0")
    )
    pages.filter(F.xxhash64("url") % 2 != 0).write.parquet(
        os.path.join(src, "batch1")
    )
    return str(root), src, pages


def test_stream_matches_batch_extraction(spark, staged):
    root, src, pages = staged
    out = os.path.join(root, "edges_out")
    ckpt = os.path.join(root, "ckpt")

    stream = stream_pages(spark, src + "/*", max_files_per_trigger=1)
    edges = stream_pages_to_edges(stream)
    q = run_edges_stream(edges, out, ckpt, available_now=True)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out)
        .select("subject", "object", "src_url", "dst_url")
        .distinct()
    )
    want = (
        pages_to_edges(pages, closed_world=False)
        .select("subject", "object", "src_url", "dst_url")
        .distinct()
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_dedup_recrawls(spark, tmp_path_factory):
    """A re-crawl of the SAME url at a LATER warc_ts must be dropped — the
    dedup key is the url alone (keying on (url, warc_ts) would be a no-op
    for re-crawls, which by definition have new timestamps)."""
    root = str(tmp_path_factory.mktemp("stream_dedup"))
    src = os.path.join(root, "pages")
    out = os.path.join(root, "dedup_out")
    ckpt = os.path.join(root, "dedup_ckpt")

    pages = synth_pages(spark, 300, seed=7, partitions=2)
    pages.write.parquet(os.path.join(src, "batch0"))
    # re-crawl: 150 of the same urls, 1 minute later (inside the watermark)
    recrawl = pages.filter(F.xxhash64("url") % 2 == 0).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 MINUTE")
    )
    n_recrawl = recrawl.count()
    assert n_recrawl > 0
    recrawl.write.parquet(os.path.join(src, "batch1"))

    stream = stream_pages(spark, src + "/*")
    deduped = dedup_pages_stream(stream, watermark="10 minutes")
    q = (
        deduped.select("url", "warc_ts")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # every url exactly once: the 150 within-watermark re-crawls are dropped
    assert got.count() == 300
    assert got.select("url").distinct().count() == 300
