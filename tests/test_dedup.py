

def test_ngram_containment_doc_inside_doc(spark):
    """A document pasted inside a larger one: containment finds it at a
    high threshold where symmetric Jaccard (diluted by the size ratio)
    does not; guard path (max_df) preserves exactness here."""
    from pregel_rs_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "quick brown fox jumps"
    big = (
        "the very long wrapper page header text comes first here and then "
        + small
        + " and then a very long trailing footer section closes the page"
    )
    docs = spark.createDataFrame(
        [(1, big, "en"), (2, small, "en"), (3, "unrelated text body", "en")],
        "doc_id long, text string, lang string",
    )
    rows = ngram_containment_pairs(docs, k=5, threshold=0.9).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(1, 2)]
    r = rows[0]
    assert r.cont_b_in_a == 1.0  # every shingle of the small doc is in big
    assert r.cont_a_in_b < 0.25
    # symmetric Jaccard misses it at the same threshold
    assert ngram_jaccard_pairs(docs, k=5, threshold=0.9).collect() == []
    # df-guarded run returns the identical pair set on this fixture
    guarded = ngram_containment_pairs(docs, k=5, threshold=0.9, max_df=2)
    assert [(r.doc_a, r.doc_b) for r in guarded.collect()] == [(1, 2)]


def test_dedup_chunks_matches_python_oracle(spark):
    """Chunk-level removal vs an exact pure-Python replica: global
    first-occurrence keep (lexicographic (doc_id, chunk_idx)), in-doc
    repeats removed, trailing short chunk, all-removed doc -> empty
    string, NULL text -> NULL row, chunk validation."""
    from pregel_rs_spark.operators.dedup import dedup_chunks

    rows = [
        (1, "a b c d e f"),          # chunks(3): "a b c", "d e f"
        (2, "a b c x y z a b c"),    # "a b c" dup of doc1; in-doc repeat
        (3, "d e f"),                # whole doc removed -> ""
        (4, "q r"),                  # short: single 2-token chunk
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_dedup, r.n_chunks, r.kept_chunks)
        for r in dedup_chunks(docs, chunk=3).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}

    # pure-Python replay
    pieces, first = {}, {}
    for d, t in rows:
        if t is None:
            continue
        toks = t.split()
        cs = [" ".join(toks[i:i + 3]) for i in range(0, len(toks), 3)]
        pieces[d] = cs
        for i, c in enumerate(cs):
            first.setdefault(c, (d, i))
    for d, t in rows:
        if t is None:
            assert got[d] == (None, None, None)
            continue
        kept = [
            c for i, c in enumerate(pieces[d]) if first[c] == (d, i)
        ]
        assert got[d] == (" ".join(kept), len(pieces[d]), len(kept)), d

    assert got[3] == ("", 1, 0)
    assert got[2][0] == "x y z"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="chunk"):
        dedup_chunks(docs, chunk=0)


def test_incremental_dedup_screens_snapshot_against_index(spark):
    """Dedup-at-ingest: a new doc whose text duplicates a corpus doc
    collides through the standing LSH index and is rejected; a unique
    new doc is admitted; within the batch first-occurrence wins; blank
    docs are admitted with zero candidates (verdict total over batch)."""
    from pregel_rs_spark.operators.dedup import (
        incremental_dedup,
        lsh_band_index,
    )

    corpus_text = "the quick brown fox jumps over the lazy dog " * 4
    other_text = "completely different content about spark shuffles " * 4
    old = spark.createDataFrame(
        [(10, corpus_text), (12, "some unrelated corpus document " * 5)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (21, corpus_text),      # dup of corpus doc 10 -> reject
            (23, other_text),       # unique vs corpus, first in batch
            (25, other_text),       # in-batch dup of 23 -> reject
            (27, "   "),            # blank: no shingles, admitted
        ],
        "doc_id long, text string",
    )
    idx = lsh_band_index(old, k=5, num_hashes=4, bands=2)
    out = {
        r.doc_id: (r.old_candidates, r.new_candidates, r.admit)
        for r in incremental_dedup(
            new, idx, k=5, num_hashes=4, bands=2
        ).collect()
    }
    assert set(out) == {21, 23, 25, 27}
    assert out[21][0] >= 1 and not out[21][2]
    assert out[23] == (0, 0, True)
    assert out[25][1] >= 1 and not out[25][2]
    assert out[27] == (0, 0, True)


def test_semdedup_drops_within_cluster_near_dups(spark):
    """SemDeDup verdict semantics: of two near-identical vectors landing
    in the same cluster, only the lower vec_id survives; dissimilar
    vectors keep; one verdict row per input vector."""
    from pregel_rs_spark.operators.dedup import semdedup

    # vec 1 and 2 nearly identical; 3 and 4 orthogonal-ish to them
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r.vec_id: (r.cluster_id, r.keep)
        for r in semdedup(
            emb, n_clusters=2, iters=1, threshold=0.95
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # 1 and 2 cosine ~0.99995 -> same cluster (any seeding), 2 dropped
    assert out[1][0] == out[2][0]
    assert out[1][1] is True and out[2][1] is False
    assert out[3][1] is True and out[4][1] is True


def test_minhash_similar_ranks_near_dup_first(spark):
    """The retrieval estimator puts an exact duplicate (all signature
    components agree, est_jaccard 1.0) above unrelated docs, excludes
    self, and respects top_k."""
    from pyspark.sql import functions as F

    from pregel_rs_spark.operators.dedup import minhash_similar

    t_dup = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, t_dup),
        (20, t_dup),
        (21, "completely different text about query engines " * 3),
        (22, "yet another unrelated document on crawl frontiers " * 3),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.query_id, r.rank): (r.doc_id, r.est_jaccard, r.matches)
           for r in minhash_similar(
               docs, docs.filter(F.col("doc_id") == 1),
               top_k=2, num_hashes=4,
           ).collect()}
    assert out[(1, 1)][0] == 20 and out[(1, 1)][1] == 1.0
    assert out[(1, 1)][2] == 4
    # self never appears
    assert all(d != 1 for d, _, _ in out.values())
    assert len(out) <= 2


def test_bloom_screen_no_false_negatives(spark):
    """Every inserted key probes maybe_seen=True (no false negatives —
    the Bloom guarantee); a disjoint probe set at this fill level
    (3 keys in 2^20 bits) comes back all-False; word values stay
    positive (32-bit words, no sign-bit trap)."""
    from pyspark.sql import functions as F

    from pregel_rs_spark.operators.dedup import bloom_build, bloom_screen

    keys = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], "content_key string"
    )
    bloom = bloom_build(keys, "content_key")
    assert all(r.word > 0 for r in bloom.collect())
    seen = {r.content_key: r.maybe_seen
            for r in bloom_screen(keys, "content_key", bloom).collect()}
    assert seen == {"alpha": True, "beta": True, "gamma": True}
    probe = spark.createDataFrame(
        [(f"other-{i}",) for i in range(50)], "content_key string"
    )
    out = bloom_screen(probe, "content_key", bloom).collect()
    assert len(out) == 50 and not any(r.maybe_seen for r in out)
    import pytest as _p
    with _p.raises(ValueError, match="m_bits"):
        bloom_build(keys, "content_key", m_bits=8)
