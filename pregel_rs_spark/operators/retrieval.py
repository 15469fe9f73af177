"""Sparse-retrieval operators over ``documents(doc_id, text, …)``:
inverted-index construction and BM25 top-k scoring.

The training-data use cases are targeted retrieval over a trillion-token
corpus: pulling documents that match a benchmark's query terms (the
retrieval side of decontamination), quality-auditing what a search query
would surface, and building the posting lists a downstream sparse index
(Lucene/Anserini-shape) consumes.  BM25 is the classic Robertson/
Spärck Jones probabilistic ranking function (TREC-3, 1994) in its
standard Lucene parameterization.

All pure Catalyst expressions (split/explode/agg — whole-stage codegen,
no UDFs), so the identical formula is expressible in ANSI SQL for the
DuckDB oracle.  Tokenization is the whitespace tokenizer shared with
:func:`pregel_rs_spark.operators.text.token_counts`.

NULL contract (matches operators/text.py): a NULL or all-whitespace
``text`` yields no postings and length 0 — such documents can never be
retrieved, and they still count toward N and avgdl only when they have
at least the empty length row (we keep them in the length table with
``dl = 0`` so corpus statistics stay auditable).

No reference counterpart — extension beyond pregel-rs (the reference,
src/graph_frame.rs / src/pregel.rs, ships no text surface at all).

Scale shape at 100 TB:
  * posting construction is one explode + one (term, doc_id) hash
    aggregation — the shuffle key is the natural index key, and the
    result is exactly the layout a bucketed/partitioned-by-term sink
    wants;
  * BM25 filters the token stream to the query's terms BEFORE any
    shuffle (a handful of literals — predicate-pushdown friendly), so
    the per-query work is O(matching postings), never O(corpus);
  * document length is computed map-only (``size(split(...))``, no
    explode, no shuffle);
  * corpus constants (N, avgdl) are two O(1) scalars; per-term df is
    one tiny aggregation over the filtered postings; the final top-k is
    a TakeOrdered (per-partition heap + driver merge of k rows), never
    a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ws_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term) pairs under the whitespace tokenizer; NULL/blank
    text produces no rows (F.split never yields empty tokens here
    because the input is trimmed and split on runs of whitespace)."""
    t = F.trim(F.col(text_col))
    return (
        docs.filter(t.isNotNull() & (F.length(t) > 0))
        .select("doc_id", F.explode(F.split(t, r"\s+")).alias("term"))
    )


def doc_lengths(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dl) whitespace-token document lengths, map-only (no
    explode/shuffle); NULL and blank text get ``dl = 0``."""
    t = F.trim(F.col(text_col))
    return docs.select(
        "doc_id",
        F.when(t.isNull() | (F.length(t) == 0), F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
        .alias("dl"),
    )


def inverted_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Posting lists ``(term, doc_id, tf)`` — the sparse-index build.

    One explode + one hash aggregation keyed on (term, doc_id).  Writing
    this frame partitioned/bucketed by ``term`` gives the layout a
    sharded sparse index serves from; the tf column is exact (BIGINT).
    """
    return (
        _ws_tokens(docs, text_col)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25
    (Robertson et al., TREC-3; Lucene parameterization):

        idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
        score(d, q) = Σ_{t∈q} idf(t) · tf(t,d)·(k1+1)
                              / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))

    N counts all documents (including empty/NULL-text ones, which hold a
    ``dl = 0`` row), avgdl averages over the same population — the
    corpus constants are properties of the corpus, not of the query.
    Duplicate query terms are deduplicated (bag → set, standard BM25).

    Deterministic: ties broken by ascending ``doc_id``.  Returns
    ``(doc_id, score, n_terms_matched)`` with score rounded to 6 dp,
    ordered by (score desc, doc_id).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = sorted(set(query_terms))

    lengths = doc_lengths(docs, text_col)
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs = stats["n"]
    avgdl = float(stats["avgdl"] or 0.0) or 1.0  # all-empty corpus guard

    postings = (
        _ws_tokens(docs, text_col)
        .filter(F.col("term").isin(terms))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        postings.join(F.broadcast(df_t), "term")
        .join(lengths, "doc_id")
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
                )
            ).alias("part"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.round(F.sum("part"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
