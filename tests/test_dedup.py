

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
