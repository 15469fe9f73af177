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


def test_stream_sessionize_matches_batch(spark, tmp_path_factory):
    """Custom stateful operator (applyInPandasWithState): the emitted
    closed sessions equal the batch session_bounds rollup on the same
    events once the watermark has passed every session's gap."""
    import datetime as dt
    import time

    from pregel_rs_spark.operators.events import session_bounds
    from pregel_rs_spark.streaming import sessionize_stream

    root = tmp_path_factory.mktemp("sess")
    src = os.path.join(str(root), "events")
    SCHEMA = "user_id long, ts timestamp, value double"
    base = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(uid, minutes, val):
        return (uid, base + dt.timedelta(minutes=minutes), float(val))

    # 1.0000005 sits ON the 1e-6 HALF_UP boundary (Spark F.round →
    # 1.000001; Python round() banker's → 1.0) and NaN poisons F.sum —
    # both previously broke the documented stream/batch parity contract
    b0 = [ev(1, 0, 1), ev(1, 10, 2), ev(2, 5, 1.0000005),
          ev(2, 6, float("nan"))]
    # all ts >= batch0's max so nothing is late vs the 1-minute watermark;
    # user1 minute 60 and user2 minute 40 both exceed the 30-minute gap
    b1 = [ev(2, 40, 3), ev(1, 60, 5), ev(1, 65, 1)]
    sent0 = [ev(999, 60 * 24, 0)]       # advances the watermark ~1 day
    sent1 = [ev(999, 60 * 24 + 1, 0)]   # next trigger fires the timeouts
    for i, rows in enumerate((b0, b1, sent0, sent1)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, f"batch{i}")
        )
        time.sleep(0.05)  # distinct mtimes -> stable file order

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ck")
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         r.total_value)
        for r in spark.read.parquet(out).filter("user_id != 999").collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         r.total_value)
        for r in session_bounds(
            spark.createDataFrame(b0 + b1, SCHEMA), gap_minutes=30
        ).collect()
    }
    assert got == want
    assert len(want) == 4  # two sessions per user


def test_stream_content_dedup_matches_batch_hash_set(spark, tmp_path_factory):
    """Exact-content dedup on a stream: the set of distinct content hashes
    kept must equal the batch dedup_exact hash set (the representative row
    may differ — stream keeps first-arriving, batch keeps min doc_id)."""
    import datetime

    from pregel_rs_spark.streaming import dedup_content_stream

    root = tmp_path_factory.mktemp("cdedup")
    src = os.path.join(str(root), "docs")
    t0 = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        (i, f"u{i}", t0 + datetime.timedelta(minutes=i), txt)
        for i, txt in enumerate(
            ["alpha text", "beta text", "alpha text", "gamma text",
             "beta text", "alpha text"]
        )
    ]
    schema = "doc_id long, url string, warc_ts timestamp, text string"
    df = spark.createDataFrame(rows[:3], schema)
    df.write.parquet(os.path.join(src, "b0"))
    spark.createDataFrame(rows[3:], schema).write.parquet(
        os.path.join(src, "b1")
    )

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    out = os.path.join(str(root), "out")
    q = (
        dedup_content_stream(stream, watermark="10 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(str(root), "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    batch = spark.createDataFrame(rows, schema)
    got_hashes = {r[0] for r in got.select(F.md5("text")).collect()}
    want_hashes = {r[0] for r in batch.select(F.md5("text")).distinct().collect()}
    assert got.count() == 3                 # one per distinct content
    assert got_hashes == want_hashes


def test_stream_degrees_match_batch(spark, staged):
    """Update-mode streaming degree counts: after availableNow drains the
    source, the state-store counts equal the batch degree aggregation."""
    from pregel_rs_spark.streaming import degree_stream

    root, src, pages = staged
    stream = stream_pages(spark, src + "/*", max_files_per_trigger=1)
    edges = stream_pages_to_edges(stream)
    deg = degree_stream(edges, direction="out")
    q = (
        deg.writeStream.format("memory")
        .queryName("deg_stream")
        .option("checkpointLocation", os.path.join(root, "deg_ckpt"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.vertex_id: r.degree
        for r in spark.sql("SELECT * FROM deg_stream").collect()
    }
    from pregel_rs_spark.functions.extract import pages_to_edges

    want = {
        r.vertex_id: r.degree
        for r in pages_to_edges(pages, closed_world=False)
        .groupBy(F.col("subject").alias("vertex_id"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .collect()
    }
    assert got == want
    import pytest as _pytest

    with _pytest.raises(ValueError):
        degree_stream(edges, direction="sideways")


def test_stream_robots_admission_matches_batch(spark, staged):
    """admit_pages_stream ≡ batch robots_verdicts(allowed) on the same
    pages — urls, audit columns, and rejections all agree."""
    from pregel_rs_spark.functions.robots import robots_verdicts
    from pregel_rs_spark.sources.synth import synth_robots
    from pregel_rs_spark.streaming.ingest import admit_pages_stream

    root, src, pages = staged
    out = os.path.join(root, "admitted_out")
    ckpt = os.path.join(root, "admit_ckpt")
    robots = synth_robots(spark, 300, seed=7)

    stream = stream_pages(spark, src + "/*", max_files_per_trigger=1)
    admitted = admit_pages_stream(stream, robots)
    q = (
        admitted.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out).select("url", "rule", "rule_path")
    v = robots_verdicts(pages.select("url"), robots)
    want = v.filter(F.col("allowed")).select("url", "rule", "rule_path")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # at least one page must actually be rejected for the test to bite
    assert v.filter(~F.col("allowed")).count() > 0


def test_admit_pages_stream_max_hosts_cap(spark, staged):
    """VERDICT r4 item 1: the robots side is collected + broadcast by
    contract; an oversized robots set must fail with an actionable error
    at plan-build time (before any stream starts), not OOM the driver.
    And the cap must not disturb an in-contract run: the same plan with
    an adequate cap still builds."""
    import pytest

    from pregel_rs_spark.streaming.ingest import admit_pages_stream

    root, src, pages = staged
    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow: /private"),
            ("b.example", "User-agent: *\nAllow: /"),
            ("c.example", "User-agent: *\nDisallow:"),
        ],
        "host string, content string",
    )
    stream = stream_pages(spark, src + "/*", max_files_per_trigger=1)
    with pytest.raises(ValueError, match=r"max_hosts=2\b.*shard"):
        admit_pages_stream(stream, robots, max_hosts=2)
    # in-contract: plan builds fine (not started — build is where the
    # collect happens, so this exercises the capped path)
    admitted = admit_pages_stream(stream, robots, max_hosts=3)
    assert "rule_path" in admitted.columns


def test_stream_compaction_matches_batch_snapshot(spark, tmp_path_factory):
    """compact_pages_stream folds micro-batches into the latest-snapshot
    view; the final table equals latest_snapshot over ALL pages (stream ≡
    batch — the merge is associative), including a later recrawl batch
    overriding an earlier crawl."""
    from pregel_rs_spark.functions.extract import latest_snapshot
    from pregel_rs_spark.sources.io import TableStore
    from pregel_rs_spark.sources.synth import synth_pages
    from pregel_rs_spark.streaming.ingest import compact_pages_stream

    root = tmp_path_factory.mktemp("compact")
    src = os.path.join(str(root), "pages")
    base = synth_pages(spark, 200, seed=11, partitions=2)
    recrawl = (
        synth_pages(spark, 200, seed=12, partitions=2)
        .filter(F.xxhash64("url") % 3 == 0)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 DAY"))
    )
    base.write.parquet(os.path.join(src, "b0"))
    recrawl.write.parquet(os.path.join(src, "b1"))

    store = TableStore(spark, os.path.join(str(root), "store"))
    stream = stream_pages(spark, src + "/*", max_files_per_trigger=1)
    q = (
        compact_pages_stream(stream, store)
        .option("checkpointLocation", os.path.join(str(root), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = store.read("latest_pages")
    want = latest_snapshot(base.unionByName(recrawl))
    assert got.count() == want.count() == 200
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the recrawled third must carry the NEW content hashes
    rec = {r.url: r.content_md5 for r in latest_snapshot(recrawl).collect()}
    final = {r.url: r.content_md5 for r in got.collect()}
    assert rec and all(final[u] == h for u, h in rec.items())


def test_stream_lsh_dedup_grows_standing_index(spark, tmp_path_factory):
    """lsh_dedup_stream screens each micro-batch against the standing
    index and folds admitted bands in: verdicts equal a manual
    sequential replay of incremental_dedup over the same batch order,
    and a batch-2 duplicate of an admitted batch-1 doc is rejected."""
    from pregel_rs_spark.operators.dedup import (
        incremental_dedup,
        lsh_band_index,
    )
    from pregel_rs_spark.sources.io import TableStore
    from pregel_rs_spark.streaming.ingest import lsh_dedup_stream

    root = tmp_path_factory.mktemp("lshdedup")
    src = os.path.join(str(root), "docs")
    t_a = "the quick brown fox jumps over the lazy dog " * 4
    t_b = "spark shuffles partition data across the cluster nodes " * 4
    t_c = "an entirely distinct third document about web crawling " * 4
    b0 = spark.createDataFrame(
        [(1, t_a), (2, t_b)], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(11, t_a), (12, t_c)], "doc_id long, text string"
    )
    b0.repartition(1).write.parquet(os.path.join(src, "b0"))
    b1.repartition(1).write.parquet(os.path.join(src, "b1"))

    store = TableStore(spark, os.path.join(str(root), "store"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        lsh_dedup_stream(stream, store, k=5, num_hashes=4, bands=2)
        .option("checkpointLocation", os.path.join(str(root), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    verdicts = store.read("dedup_verdicts").collect()
    got = {r.doc_id: (r.old_candidates, r.new_candidates, r.admit, r.batch_id)
           for r in verdicts}
    assert set(got) == {1, 2, 11, 12}
    # replay sequentially in the ACTUAL batch order the stream used
    batches = {}
    for r in verdicts:
        batches.setdefault(r.batch_id, set()).add(r.doc_id)
    order = sorted(batches)
    all_docs = b0.unionByName(b1)
    standing = None
    for bid in order:
        batch = all_docs.filter(
            F.col("doc_id").isin([int(d) for d in batches[bid]])
        )
        if standing is None:
            standing = lsh_band_index(
                batch, k=5, num_hashes=4, bands=2
            ).filter(F.lit(False))
        exp = {
            r.doc_id: (r.old_candidates, r.new_candidates, r.admit)
            for r in incremental_dedup(
                batch, standing, k=5, num_hashes=4, bands=2
            ).collect()
        }
        for d, v in exp.items():
            assert got[d][:3] == v, (d, got[d], v)
        admitted = [d for d, v in exp.items() if v[2]]
        standing = standing.unionByName(
            lsh_band_index(batch, k=5, num_hashes=4, bands=2).join(
                spark.createDataFrame(
                    [(int(d),) for d in admitted], "doc_id long"
                ),
                "doc_id",
                "left_semi",
            )
        )
    # the duplicate of an admitted doc must be rejected cross-batch
    dup_id = 11 if got[11][3] > got[1][3] else 1
    assert not got[dup_id][2]
    # unique-content docs admitted
    assert got[2][2] and got[12][2]
    # index contains only admitted docs' bands
    idx_docs = {r.doc_id for r in store.read("lsh_index").collect()}
    assert idx_docs == {d for d, v in got.items() if v[2]}


def test_stream_windowed_counts_parity_and_late_drop(spark, tmp_path_factory):
    """Watermarked tumbling-window counts, availableNow over three
    micro-batch files: (a) append-mode output equals the batch windowed
    rollup of the ON-TIME events whose windows the watermark closed;
    (b) a late event for a window the watermark ALREADY EVICTED is
    dropped (numRowsDroppedByWatermark = 1) and never mutates the
    emitted window — the append-mode contract.  (Late rows whose window
    is still open are aggregated normally; eviction, not arrival order,
    finalizes a window.)"""
    import datetime as dt
    import time as _time

    from pregel_rs_spark.streaming import windowed_counts_stream

    root = tmp_path_factory.mktemp("winstream")
    src = os.path.join(str(root), "events")
    out = os.path.join(str(root), "out")
    ckpt = os.path.join(str(root), "ckpt")

    def ev(h, m, et):
        return (dt.datetime(2026, 1, 1, h, m), et)

    schema = "ts timestamp, event_type string"
    batches = [
        # hour-0/1 events + a 10:00 sentinel -> watermark 08:00 after t0
        [ev(0, 10, "a"), ev(0, 40, "b"), ev(1, 10, "a"), ev(10, 0, "c")],
        # 12:00 sentinel: trigger runs AT 08:00, evicting/EMITTING the
        # hour-0 and hour-1 windows; watermark 10:00 after it
        [ev(12, 0, "c")],
        # 00:50 targets the already-emitted hour-0 window -> DROPPED;
        # 13:00 advances the watermark to 11:00, evicting hour 10
        [ev(0, 50, "a"), ev(13, 0, "c")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, f"batch{i}")
        )
        _time.sleep(1.1)  # distinct mtimes -> stable file order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        windowed_counts_stream(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1  # exactly the 00:50 late row
    got = {
        (r.window_start.hour, r.event_type): r.n
        for r in spark.read.parquet(out).collect()
    }
    # hour-0 count for "a" is 1 — the dropped late row never re-opened
    # the emitted window; hours 12/13 still open (no eviction yet)
    assert got == {(0, "a"): 1, (0, "b"): 1, (1, "a"): 1, (10, "c"): 1}
    # parity: the same expression over the on-time closed-window subset
    batch = spark.createDataFrame(batches[0], schema).filter(
        F.col("ts") < "2026-01-01 11:00:00"
    )
    got_batch = {
        (r.window_start.hour, r.event_type): r.n
        for r in windowed_counts_stream(batch).collect()
    }
    assert got_batch == got


def test_stream_stream_attribution_join_matches_batch(spark, tmp_path_factory):
    """Watermarked stream-stream interval join: clicks attribute to the
    same user's view within 30 minutes AFTER it; availableNow output
    equals the identical batch join (inner joins emit on match; the
    watermark only bounds state)."""
    import datetime as dt

    from pregel_rs_spark.streaming import attribution_join_stream

    root = tmp_path_factory.mktemp("attr")
    vsrc = os.path.join(str(root), "views")
    csrc = os.path.join(str(root), "clicks")

    def ev(uid, h, m):
        return (uid, dt.datetime(2026, 1, 1, h, m))

    schema = "user_id long, ts timestamp"
    views = [ev(1, 0, 0), ev(1, 2, 0), ev(2, 0, 30)]
    clicks = [ev(1, 0, 10), ev(1, 0, 40), ev(2, 0, 45), ev(1, 2, 20)]
    spark.createDataFrame(views, schema).coalesce(1).write.parquet(
        os.path.join(vsrc, "b0")
    )
    spark.createDataFrame(clicks, schema).coalesce(1).write.parquet(
        os.path.join(csrc, "b0")
    )

    vs = spark.readStream.schema(schema).parquet(vsrc + "/*")
    cs = spark.readStream.schema(schema).parquet(csrc + "/*")
    out = os.path.join(str(root), "out")
    q = (
        attribution_join_stream(vs, cs, attribution_window="30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(str(root), "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.ts.hour * 60 + r.ts.minute,
         r.click_ts.hour * 60 + r.click_ts.minute)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 0, 10), (2, 30, 45), (1, 120, 140)}
    # batch parity: identical expression over batch frames
    want = {
        (r.user_id, r.ts.hour * 60 + r.ts.minute,
         r.click_ts.hour * 60 + r.click_ts.minute)
        for r in attribution_join_stream(
            spark.createDataFrame(views, schema),
            spark.createDataFrame(clicks, schema),
            attribution_window="30 minutes",
        ).collect()
    }
    assert got == want
