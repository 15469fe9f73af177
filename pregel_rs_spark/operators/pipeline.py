"""Training-corpus assembly: the filter/selection composition an LLM data
pipeline runs after the per-document analyses — exact-dedup survivorship,
token-length bounds, and a quality floor, each with an explicit per-document
verdict so filtering is auditable (what was dropped, and why).

Pure Catalyst composition of the text/dedup operators (no UDFs); every
branch of the decision is expressible in ANSI SQL, so the full pipeline has
an exact DuckDB oracle.

Scale shape (100 TB): three independent per-document passes (token counts,
quality score, md5 group for dedup) that each reduce to one hash
shuffle/join keyed by doc_id — no pairwise work, no skew (doc_id is unique),
AQE-coalesced.  The verdict column means the expensive decision runs ONCE
and downstream consumers filter by a cheap equality instead of recomputing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_exact
from .text import quality_scores, token_counts


def corpus_filter(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_score: float = 0.55,
    text_col: str = "text",
) -> DataFrame:
    """Per-document keep/drop verdict for training-corpus assembly.

    Decision order (first failing rule wins — fixed so the oracle can
    mirror it): ``dup`` (not the min-doc_id exact-dedup survivor) →
    ``short`` / ``long`` (whitespace-token bounds) → ``low_quality``
    (composite score < min_score, on the 6-dp-rounded score so the
    comparison is engine-portable) → ``keep``.

    Returns ``(doc_id, verdict, keep)`` for every input document;
    ``keep`` is 0/1.
    """
    toks = token_counts(docs, text_col).select("doc_id", "ws_tokens")
    qual = quality_scores(docs, text_col).select("doc_id", "score")
    keepers = dedup_exact(docs, text_col).select(
        F.col("keep_id").alias("doc_id"), F.lit(1).alias("__survivor__")
    )
    joined = (
        docs.select("doc_id")
        .join(toks, "doc_id")
        .join(qual, "doc_id")
        .join(keepers, "doc_id", "left")
    )
    verdict = (
        F.when(F.col("__survivor__").isNull(), F.lit("dup"))
        .when(F.col("ws_tokens") < min_tokens, F.lit("short"))
        .when(F.col("ws_tokens") > max_tokens, F.lit("long"))
        .when(F.col("score") < min_score, F.lit("low_quality"))
        .otherwise(F.lit("keep"))
    )
    return joined.select(
        "doc_id",
        verdict.alias("verdict"),
        (verdict == "keep").cast("long").alias("keep"),
    )


def corpus_select(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_score: float = 0.55,
    text_col: str = "text",
) -> DataFrame:
    """The surviving corpus itself: input columns of every kept document
    (left-semi join against :func:`corpus_filter` — no column duplication,
    doc payloads never shuffle through the decision)."""
    kept = corpus_filter(docs, min_tokens, max_tokens, min_score, text_col)
    return docs.join(
        kept.filter(F.col("keep") == 1).select("doc_id"), "doc_id", "left_semi"
    )
