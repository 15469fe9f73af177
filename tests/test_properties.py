"""Property-based invariants (hypothesis): random small inputs, exact
invariants that must hold for EVERY input — complementing the fixed
fixtures with adversarial data shapes (empty strings, duplicate rows,
boundary rates).  Example counts are kept small because each example is a
Spark round-trip; the properties are chosen so violations reproduce
deterministically (hypothesis shrinks to a minimal counterexample).
"""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_texts = st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=12), min_size=1, max_size=12
)


@given(texts=_texts, r=st.floats(0.05, 0.95))
@SET
def test_corpus_sample_subset_property(spark, texts, r):
    """For ANY corpus and rates r < r2, the kept set at r is a subset of
    the kept set at r2, and sampling is deterministic (same input → same
    output)."""
    from pregel_rs_spark.operators.pipeline import corpus_sample

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    lo = {x.doc_id for x in corpus_sample(docs, {"en": r}).collect()}
    hi = {
        x.doc_id
        for x in corpus_sample(docs, {"en": min(r + 0.3, 1.0)}).collect()
    }
    again = {x.doc_id for x in corpus_sample(docs, {"en": r}).collect()}
    assert lo <= hi
    assert lo == again


@given(texts=_texts)
@SET
def test_dedup_exact_partition_property(spark, texts):
    """dedup_exact groups are a PARTITION of the corpus: group sizes sum
    to the doc count, keep_id is the min doc_id of its group, and there is
    exactly one group per distinct text."""
    from pregel_rs_spark.operators.dedup import dedup_exact

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    groups = dedup_exact(docs).collect()
    assert sum(g.dup_count for g in groups) == len(texts)
    assert len(groups) == len(set(texts))
    by_text = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    want_keeps = {min(v) for v in by_text.values()}
    assert {g.keep_id for g in groups} == want_keeps


@given(
    offsets=st.lists(st.integers(0, 200), min_size=1, max_size=20),
    gap=st.integers(1, 60),
)
@SET
def test_sessionize_gap_property(spark, offsets, gap):
    """sessionize: session_seq is 1 at a user's first event, non-decreasing
    in (ts, event_id) order, and increments EXACTLY when the gap to the
    previous event exceeds the threshold."""
    from pregel_rs_spark.operators.events import sessionize

    t0 = datetime.datetime(2025, 1, 1)
    rows = [
        (i, 7, t0 + datetime.timedelta(minutes=m), "c", "{}", 1.0)
        for i, m in enumerate(offsets)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, "
        "props string, value double",
    )
    got = sessionize(events, gap_minutes=gap).collect()
    order = sorted(
        range(len(rows)), key=lambda i: (rows[i][2], rows[i][0])
    )
    seq_by_event = {r.event_id: r.session_seq for r in got}
    expect, prev_ts = 0, None
    for i in order:
        ts = rows[i][2]
        if prev_ts is None or (ts - prev_ts).total_seconds() > gap * 60:
            expect += 1
        prev_ts = ts
        assert seq_by_event[rows[i][0]] == expect


@given(texts=_texts, ctx=st.integers(2, 9))
@SET
def test_pack_sequences_span_property(spark, texts, ctx):
    """For ANY corpus and ctx length: within every shard the spans are
    contiguous and disjoint starting at 0, tok_end - tok_start equals the
    doc's token count, and every touched sequence index is consistent
    with the span arithmetic."""
    from pregel_rs_spark.operators.pipeline import pack_sequences

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = pack_sequences(docs, ctx_len=ctx, n_shards=3).collect()
    assert len(rows) == len(texts)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.tok_start)
        cum = 0
        for r in shard_rows:
            assert r.tok_start == cum
            assert r.tok_end - r.tok_start == r.n_tokens
            if r.n_tokens > 0:
                assert r.seq_first == r.tok_start // ctx
                assert r.seq_last == (r.tok_end - 1) // ctx
            else:
                assert r.seq_first is None and r.seq_last is None
            cum = r.tok_end


@given(texts=_texts, k=st.integers(1, 4))
@SET
def test_group_sample_size_and_stability_property(spark, texts, k):
    """For ANY corpus: every group yields min(k, |group|) rows, ranks are
    1..n, and the sample is deterministic."""
    from pregel_rs_spark.operators.pipeline import group_sample

    docs = spark.createDataFrame(
        [(i, t, "g%d" % (len(t) % 2)) for i, t in enumerate(texts)],
        "doc_id long, text string, grp string",
    )
    out = group_sample(docs, ["grp"], k=k).collect()
    sizes = {}
    for r in out:
        sizes.setdefault(r.grp, []).append(r.sample_rank)
    totals = {}
    for i, t in enumerate(texts):
        g = "g%d" % (len(t) % 2)
        totals[g] = totals.get(g, 0) + 1
    for g, ranks in sizes.items():
        assert sorted(ranks) == list(range(1, min(k, totals[g]) + 1))
    again = group_sample(docs, ["grp"], k=k).collect()
    assert {(r.doc_id, r.sample_rank) for r in again} == {
        (r.doc_id, r.sample_rank) for r in out
    }
