"""Streaming ingestion: crawled pages arrive continuously → edge table grows
incrementally → graph algorithms run on the accumulated snapshot.

The reference has no streaming surface (SURVEY §2.3); this layer is the
Spark-native growth path for the same data model: Structured Streaming over
the pages schema, the SAME stateless pandas-UDF extractors as the batch path
(`functions/extract.py` — stateless projections are streaming-safe
unchanged, so the byte-identity invariant carries over per micro-batch), a
watermark + `dropDuplicates` stage for re-crawled urls, and an append sink.

Scale notes:
  * extraction is per-batch embarrassingly parallel — no shuffle before the
    sink; the only stateful operator is url dedup, whose state is bounded by
    the watermark horizon.
  * the sink is the same TableStore contract as batch (Iceberg `writeTo` on
    a real deployment, parquet-dir append here); PageRank & friends then run
    on snapshots — BSP iteration itself stays batch (the superstep barrier
    is the engine's windowing).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pregel_rs_spark.columns import OBJECT, SUBJECT
from pregel_rs_spark.functions.extract import extract_links_udf, url_id
from pregel_rs_spark.sources.synth import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of pages parquet (schema per BASELINE input_hint).

    On a real crawl this is a Kafka/Kinesis source with the same schema; the
    downstream plan is identical.
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def dedup_pages_stream(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop re-crawls of the same url within the watermark horizon.

    The dedup key is the **url alone** — a re-crawl of the same url carries
    a different ``warc_ts``, so keying on (url, warc_ts) would never drop
    anything.  ``dropDuplicatesWithinWatermark`` keeps per-url state only
    for the watermark horizon (state is evicted once the event-time
    watermark passes the first-seen timestamp + delay), so state size is
    bounded by (distinct urls seen within horizon), not the whole crawl.
    """
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def dedup_content_stream(
    docs: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact CONTENT dedup on a document stream: key = ``md5(text)``
    within the watermark horizon — mirrors the batch ``dedup_exact`` /
    ``dedup_exact_survivors`` pair for continuous ingestion (two crawls of
    different urls carrying identical extracted text keep one copy).

    Semantics vs batch: batch keeps the MIN doc_id per content hash; the
    stream keeps the FIRST-ARRIVING row per hash inside the horizon — the
    set of distinct contents kept is identical (parity-tested on the hash
    set), the chosen representative may differ.  State is one 32-byte key
    per distinct content within the horizon, evicted by the watermark —
    bounded by the horizon's distinct-content volume, never the crawl
    history.
    """
    return (
        docs.withWatermark(ts_col, watermark)
        .withColumn("__content_hash__", F.md5(F.col(text_col)))
        .dropDuplicatesWithinWatermark(["__content_hash__"])
        .drop("__content_hash__")
    )


def stream_pages_to_edges(pages: DataFrame) -> DataFrame:
    """Incremental link extraction — identical expression tree to the batch
    ``pages_to_edges`` minus the closed-world semi-join (unbounded corpus
    membership is not decidable mid-stream; run the semi-join at snapshot
    time instead).  Returns ``(subject, object, src_url, dst_url, warc_ts)``.
    """
    links = pages.select(
        F.col("url").alias("src_url"),
        F.col("warc_ts"),
        F.explode(extract_links_udf(F.col("html"), F.col("url"))).alias("dst_url"),
    ).filter(F.col("dst_url") != F.col("src_url"))
    return links.select(
        url_id(F.col("src_url")).alias("subject"),
        url_id(F.col("dst_url")).alias("object"),
        "src_url",
        "dst_url",
        "warc_ts",
    )


def degree_stream(edges: DataFrame, direction: str = "out") -> DataFrame:
    """Continuously-maintained degree counts over the incremental edge
    stream — the graph-health dashboard companion to
    :func:`stream_pages_to_edges` (hub emergence, crawl-frontier growth,
    degree-skew alerts without re-scanning the accumulated snapshot).

    A plain streaming ``groupBy(key).count()`` — Spark maintains the
    per-key running count in the state store (one stateful shuffle;
    state is one long per distinct vertex, the same O(V) the batch
    aggregation would materialize).  Emit with ``outputMode("update")``
    (or ``"complete"`` for small dashboards); counts after processing all
    input equal the batch degree aggregation exactly (parity-tested).
    """
    if direction == "out":
        key = SUBJECT
    elif direction == "in":
        key = OBJECT
    else:
        raise ValueError(f"direction must be 'out' or 'in', got {direction!r}")
    return edges.groupBy(F.col(key).alias("vertex_id")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def run_edges_stream(
    edges: DataFrame,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Append the incremental edge stream to a parquet table (Iceberg
    ``toTable`` on a real deployment) and return the started query.

    ``available_now=True`` processes everything currently in the source and
    stops — the testing/backfill trigger; pass False for a continuous
    micro-batch run.
    """
    writer = (
        edges.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()



def admit_pages_stream(
    pages: DataFrame, robots: DataFrame, max_hosts: int = 1_000_000
) -> DataFrame:
    """Robots admission on the page stream — RFC 9309 verdicts applied as
    pages arrive, so disallowed fetches never reach the corpus sink.

    Stream-legal shape: the batch :func:`~pregel_rs_spark.functions.
    robots.robots_verdicts` picks its winner with a groupBy, which a
    stream would reject as an unwatermarked aggregation — so here the
    static robots side is parsed ONCE with the pure-Python mirror parser
    and shipped as a task broadcast; per page the verdict is a stateless
    Arrow-batched pandas UDF over (host, path), both extracted by
    Catalyst.  Parser parity Catalyst↔Python is pinned in
    tests/test_robots.py; stream↔batch verdict parity in
    tests/test_streaming.py.  Returns admitted page rows plus the
    winning (rule, rule_path) audit columns.

    The robots side is collected + broadcast by contract — the same
    assumption the batch path's broadcast makes, but the stream path
    holds the dict for the run's lifetime, so the cap is enforced here:
    ``max_hosts`` (default 10^6 hosts, roughly single-digit GB of parsed
    rules) bounds the driver collect with an actionable error instead of
    a driver OOM.  A 10^8-host web-scale robots set should be sharded
    per host-partition (one ``admit_pages_stream`` query per shard with
    the page stream filtered to matching hosts), or admitted in batch
    via ``robots_filter``'s pure-Catalyst broadcast join.
    """
    from pyspark.sql.functions import pandas_udf as _pandas_udf
    from pyspark.sql.types import (
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    from pregel_rs_spark.functions.extract import url_domain
    from pregel_rs_spark.functions.robots import (
        parse_robots_py,
        robots_allowed_py,
    )

    # ONE bounded action enforces the cap AND fetches the rows: a separate
    # count() would run the robots plan twice, and a source growing between
    # the count and an unguarded collect could still blow the driver —
    # limit(max_hosts + 1) can never bring back more than the cap + 1.
    rows = robots.select("host", "content").limit(max_hosts + 1).collect()
    if len(rows) > max_hosts:
        raise ValueError(
            f"admit_pages_stream collects the robots side to the driver "
            f"(> max_hosts={max_hosts} hosts); shard the robots "
            "set per host-partition (one stream per shard), raise "
            "max_hosts if the driver can hold it, or use the batch "
            "robots_filter path's broadcast join"
        )
    rules_by_host = {
        r["host"]: parse_robots_py(r["content"]) for r in rows
    }
    bc = pages.sparkSession.sparkContext.broadcast(rules_by_host)

    @_pandas_udf(
        StructType(
            [
                StructField("allowed", BooleanType()),
                StructField("rule", StringType()),
                StructField("rule_path", StringType()),
            ]
        )
    )
    def _verdict(host: pd.Series, path: pd.Series) -> pd.DataFrame:
        rules = bc.value
        rows = [
            robots_allowed_py(p, rules.get(h, []))
            for h, p in zip(host, path)
        ]
        return pd.DataFrame(
            rows, columns=["allowed", "rule", "rule_path"]
        )

    path = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)$", 1
            ),
            F.lit(""),
        ),
        F.lit("/"),
    )
    with_v = pages.withColumn(
        "__v", _verdict(url_domain(F.col("url")), path)
    )
    return with_v.filter(F.col("__v.allowed")).select(
        *pages.columns,
        F.col("__v.rule").alias("rule"),
        F.col("__v.rule_path").alias("rule_path"),
    )


def compact_pages_stream(pages: DataFrame, store, table: str = "latest_pages"):
    """Streaming crawl-snapshot compaction: maintain the
    :func:`~pregel_rs_spark.functions.extract.latest_snapshot` view as a
    ``TableStore`` table, folding each micro-batch in with
    ``merge_snapshots`` (associative winner pick, so arrival order across
    batches cannot change the result — stream ≡ batch by construction,
    pinned in tests/test_streaming.py).

    ``foreachBatch`` is the right sink shape: the merge needs a
    read-modify-write of the maintained table, which Structured
    Streaming's native sinks can't express; TableStore's
    write-tmp-then-rename keeps each commit atomic (Iceberg
    ``createOrReplace`` on a real deployment).  Per batch the work is
    O(|batch| + |distinct urls|) — the raw history is never re-read.

    Returns the started-ready ``DataStreamWriter`` (caller picks trigger
    and checkpoint location).
    """
    from pregel_rs_spark.functions.extract import latest_snapshot, merge_snapshots

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        snap = latest_snapshot(batch_df)
        if store.exists(table):
            snap = merge_snapshots(store.read(table), snap)
        store.write(table, snap)

    return pages.writeStream.foreachBatch(_merge)


def lsh_dedup_stream(
    docs: DataFrame,
    store,
    index_table: str = "lsh_index",
    verdict_table: str = "dedup_verdicts",
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 50,
    text_col: str = "text",
):
    """Streaming NEAR-dup admission — the continuous-ingestion form of
    :func:`~pregel_rs_spark.operators.dedup.incremental_dedup`: each
    micro-batch is banded once, screened against the STANDING LSH index
    (everything admitted so far), its verdicts appended to
    ``verdict_table``, and the ADMITTED docs' bands folded into
    ``index_table`` — so batch N+1 near-dedups against every document
    admitted in batches 1..N, not just its own horizon (the
    complementary exact path, :func:`dedup_content_stream`, keeps only
    watermark-bounded state; the LSH index is the durable artifact and
    lives in the table store, not in stream state).

    ``foreachBatch`` is the right sink shape (the
    :func:`compact_pages_stream` convention): the screen needs a
    read-modify-write of the maintained index, and TableStore's
    write-tmp-then-rename keeps each commit atomic (Iceberg MERGE on a
    real deployment).  Per batch the work is one band build over the
    batch + two capped bucket joins — the corpus text is never re-read,
    and the index is re-capped per bucket after each merge (doc_id ASC,
    the :func:`lsh_band_index` determinism rule) so a boilerplate bucket
    cannot grow without bound across batches.

    Rejected docs are near-dup CANDIDATES (band collision); pipe them
    through exact-Jaccard verification where the false-positive cost
    matters, exactly as in the batch path.

    Returns the ready ``DataStreamWriter`` (caller picks trigger and
    checkpoint location).
    """
    from pyspark.sql.window import Window

    from pregel_rs_spark.operators.dedup import (
        incremental_dedup,
        lsh_band_index,
    )

    def _screen(batch_df: DataFrame, batch_id: int) -> None:
        new_idx = lsh_band_index(
            batch_df, k, num_hashes, bands, max_bucket, text_col
        )
        # self-contained per batch: the index frame must not depend on
        # the stream source once the batch returns
        new_idx = new_idx.localCheckpoint(eager=True)
        if store.exists(index_table):
            standing = store.read(index_table)
        else:
            standing = new_idx.filter(F.lit(False))
        # materialize THIS batch's verdicts before the append-write: the
        # write replaces the verdict files, so any lazy plan still
        # reading them (the union below) must be fully evaluated first
        batch_verdicts = incremental_dedup(
            batch_df, standing, k, num_hashes, bands, max_bucket,
            text_col, new_index=new_idx,
        ).withColumn("batch_id", F.lit(batch_id)).localCheckpoint(eager=True)
        appended = batch_verdicts
        if store.exists(verdict_table):
            appended = store.read(verdict_table).unionByName(batch_verdicts)
        store.write(verdict_table, appended)
        admitted = batch_verdicts.filter(F.col("admit")).select("doc_id")
        grown = standing.unionByName(
            new_idx.join(admitted, "doc_id", "left_semi")
        )
        w = Window.partitionBy("band", "bucket").orderBy("doc_id")
        grown = (
            grown.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_bucket)
            .select("doc_id", "band", "bucket")
        )
        store.write(index_table, grown)

    return docs.writeStream.foreachBatch(_screen)


def windowed_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window rollup — the canonical Structured
    Streaming windowed aggregation (readStream → withWatermark →
    groupBy(window) → agg): event counts per (window, key), with the
    watermark bounding BOTH state (closed windows are evicted, so state
    is O(active windows), not O(stream)) and late data (events older
    than the watermark are dropped, never retro-mutating a finalized
    window in append mode).

    The identical expression runs on a BATCH DataFrame (``F.window`` is
    an ordinary grouping function), which is the parity contract the
    tests pin: stream(availableNow) ≡ batch on on-time data, and late
    rows beyond the watermark are exactly the diff.

    At 100 TB/day the shuffle is (window, key)-hash-partitioned with
    map-side partial counts — the same one-shuffle shape as the batch
    ``hourly_type_counts`` rollup.  Returns ``(window_start, window_end,
    <key_col>, n)``.
    """
    from pyspark.sql import functions as F

    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def attribution_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join — view→click attribution,
    the canonical two-stream correlation (Spark's event-time interval
    join): a click attributes to a view by the same user when it lands
    within ``attribution_window`` AFTER the view.

    Both sides carry watermarks and the join condition bounds event time
    on BOTH ends, so the state store holds only rows inside
    watermark + window — O(in-flight events), not O(stream); without the
    time bound Spark would (rightly) refuse to plan the join with
    unbounded state.  The identical expression runs on batch frames —
    the parity contract the tests pin.

    ``views``/``clicks``: ``(user_id, ts, …)``; view columns keep their
    names, click timestamp comes back as ``click_ts``.  At 100 TB/day
    the shuffle is user-hash-partitioned on both sides — the same
    key-co-location discipline as every stateful operator here.
    Returns ``(user_id, ts, click_ts)`` (one row per attributed pair).
    """
    from pyspark.sql import functions as F

    v = views.select("user_id", "ts")
    c = clicks.select(
        F.col("user_id").alias("__cu"), F.col("ts").alias("click_ts")
    )
    if views.isStreaming:
        v = v.withWatermark("ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    return v.join(
        c,
        (F.col("user_id") == F.col("__cu"))
        & (F.col("click_ts") >= F.col("ts"))
        & (
            F.col("click_ts")
            <= F.col("ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
    ).select("user_id", "ts", "click_ts")
