"""Reusable cardinality-sketch operators — the HyperBall HLL machinery
(algorithms.py) lifted out of the graph loop so any pipeline rollup can use
it: approximate distinct counts per group at 100 TB without the
``countDistinct`` shuffle of raw values.

Production path hashes with ``xxhash64``; ``portable=True`` swaps in the
Lehmer multiply-mod chain (every intermediate < 2**47) so a SQL oracle
replays the ENTIRE estimator bit-for-bit — the same integer-exact
register/estimate discipline ``hyperball`` pins (algorithms.py
``_hyperball_hash`` / ``_hll_estimates``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from pregel_rs_spark.algorithms import _HLL_BITS, _hyperball_hash


def _string_fold(col):
    """String → long < 2**48 via 12 md5 nibbles (portable strpos
    arithmetic — replayable in ANSI SQL, no conv())."""
    h = F.md5(col)
    nib = lambda i: (
        F.position(F.substring(h, i, 1), F.lit("0123456789abcdef")) - 1
    ).cast("long")  # long BEFORE the scale multiply — 15·2^28 overflows int32
    out = None
    for i in range(1, 13):
        term = nib(i) * F.lit(1 << (4 * (12 - i)))
        out = term if out is None else out + term
    return out.cast("long")


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    log2m: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Per-group approximate distinct count (HyperLogLog; Flajolet et al.
    2007) — ``SELECT keys, approx_count_distinct(col)`` re-expressed with
    the engine's own integer-exact register discipline so the result is
    (a) bit-deterministic under any partitioning and (b) exactly
    SQL-replayable with ``portable=True``.

    Why not ``F.approx_count_distinct``: its HLL++ implementation is a
    JVM black box — fine in production (and this operator is NOT a
    replacement there), but unverifiable against an independent oracle
    and version-pinned.  This operator is the auditable twin: same
    O(groups·m) state bound, one hash aggregate over (group, reg) rows
    with map-side max-combine (a hot group's rows spread over m register
    keys — the skew defense), then one group rollup.

    ``col`` may be numeric (hashed directly) or string (folded through
    12 md5 nibbles first).  Returns group_cols + ``distinct_est``
    (DOUBLE, rounded to 4 — the linear-counting small-range correction
    included, exactly as ``_hll_estimates``).
    """
    if not 4 <= log2m <= 8:
        raise ValueError(
            f"log2m must be in [4,8] (scaled-int estimator bound), got {log2m}"
        )
    m = 1 << log2m
    w_bits = _HLL_BITS - log2m
    is_str = isinstance(df.schema[col].dataType, StringType)
    long_in = _string_fold(F.col(col)) if is_str else F.col(col).cast("long")
    h = _hyperball_hash(long_in, portable)
    w = F.shiftrightunsigned(h, log2m)
    regs = (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(m - 1)).cast("long").alias("reg"),
            F.when(w == 0, F.lit(w_bits + 1))
            .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))
            .cast("long")
            .alias("val"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("val").alias("val"))
    )
    return _estimate_from_regs(regs, group_cols, log2m)


def _estimate_from_regs(regs, group_cols, log2m):
    """Registers ``(group_cols..., reg, val)`` → per-group ``distinct_est``
    — the scaled-int estimator shared by :func:`approx_distinct` and
    :func:`approx_distinct_rollup` (identical arithmetic to
    ``_hll_estimates``)."""
    m = 1 << log2m
    w_bits = _HLL_BITS - log2m
    scale = w_bits + 1
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(
        log2m, 0.7213 / (1 + 1.079 / m)
    )
    per_g = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({scale} - val AS INT))"
            )
        ).alias("__ss"),
    )
    s = F.col("__ss") / F.lit(float(1 << scale)) + (
        F.lit(float(m)) - F.col("__n")
    )
    raw = F.lit(alpha * m * m) / s
    zeros = F.lit(float(m)) - F.col("__n")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return per_g.select(
        *group_cols, F.round(est, 4).alias("distinct_est")
    )


def approx_distinct_rollup(
    df: DataFrame,
    group_col: str,
    col: str,
    log2m: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Hierarchical distinct-count rollup from ONE register build — the
    MERGEABILITY that makes HLL the sketch for layered rollups (page →
    host → domain → global) at 100 TB: per-group registers are built
    once, per-group estimates read them directly, and the GLOBAL
    estimate merges them with a register-wise MAX — no second scan of
    the data, and the merged estimate is exactly what a single global
    sketch would have produced (max is associative/idempotent — the HLL
    union law).

    Scale shape: the one (group, reg) hash agg :func:`approx_distinct`
    does, plus an O(groups·m)→O(m) register MAX and two tiny estimator
    aggs.  Returns ``(scope, distinct_est)`` — one row per group (scope
    = the group value as a string) plus the ``'__all__'`` merged row.
    A group value equal to the sentinel ``'__all__'`` raises at
    execution time (plan-embedded guard) rather than silently producing
    two indistinguishable rows.
    """
    if not 4 <= log2m <= 8:
        raise ValueError(
            f"log2m must be in [4,8] (scaled-int estimator bound), got {log2m}"
        )
    m = 1 << log2m
    w_bits = _HLL_BITS - log2m
    is_str = isinstance(df.schema[col].dataType, StringType)
    long_in = _string_fold(F.col(col)) if is_str else F.col(col).cast("long")
    h = _hyperball_hash(long_in, portable)
    w = F.shiftrightunsigned(h, log2m)
    # the merged row is reported under the sentinel scope '__all__'; a
    # group VALUE equal to the sentinel would be indistinguishable from
    # it, so fail loudly instead (plan-embedded guard — no extra job,
    # the branch rides the existing scan)
    scope_checked = F.when(
        F.col(group_col).cast("string") == "__all__",
        F.raise_error(
            "approx_distinct_rollup: group value '__all__' collides with "
            "the merged-row sentinel scope"
        ),
    ).otherwise(F.col(group_col).cast("string"))
    regs = (
        df.select(
            scope_checked.alias("scope"),
            h.bitwiseAND(F.lit(m - 1)).cast("long").alias("reg"),
            F.when(w == 0, F.lit(w_bits + 1))
            .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))
            .cast("long")
            .alias("val"),
        )
        .groupBy("scope", "reg")
        .agg(F.max("val").alias("val"))
    )
    merged = (
        regs.groupBy("reg")
        .agg(F.max("val").alias("val"))
        .select(F.lit("__all__").alias("scope"), "reg", "val")
    )
    per = _estimate_from_regs(regs, ["scope"], log2m)
    allr = _estimate_from_regs(merged, ["scope"], log2m)
    return per.unionByName(allr)


def _hex16(h):
    """First 4 hex nibbles of a md5 string → 0..65535 (portable strpos
    arithmetic, same convention as :func:`_string_fold`)."""
    nib = lambda i: (
        F.position(F.substring(h, i, 1), F.lit("0123456789abcdef")) - 1
    ).cast("long")
    return nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)


def count_min_sketch(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Count-min sketch of corpus term frequencies (Cormode & Muthukrishnan
    2005, public literature): ``depth`` independent hash rows of ``width``
    buckets; row_i[bucket_i(t)] += count(t) for every whitespace token t.
    Estimates never UNDER-count (min over rows ≥ true count) — the
    mergeable O(depth·width) summary that answers "how frequent is term
    t?" at 100 TB without re-scanning or materializing the full
    distinct-term table downstream.

    Hashes are ``md5(row || '|' || token)`` first-16-bits mod width —
    portable strpos arithmetic, bit-identical in any SQL engine (the
    :func:`simhash <pregel_rs_spark.operators.dedup.simhash>` convention).

    Scale shape: one combiner-friendly token groupBy (the only data-sized
    shuffle), then a depth-way explode of the TERM table (not the token
    stream) into a (row, bucket) agg of depth·width cells.  Sketches from
    corpus shards merge by cell-wise addition.

    Returns ``(row, bucket, cnt)`` — only NON-EMPTY cells are
    materialized (sparse form; at most depth·width rows); an absent
    (row, bucket) cell means 0, and probes must COALESCE accordingly
    (:func:`cms_heavy_hitters` does).
    """
    if depth < 1 or width < 2 or width > 65536:
        raise ValueError(f"need depth >= 1, 2 <= width <= 65536, got {depth}x{width}")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    terms = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    cells = terms.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        "tok",
        "cnt",
    ).select(
        "row",
        (
            _hex16(F.md5(F.concat_ws("|", F.col("row").cast("string"), F.col("tok"))))
            % width
        ).alias("bucket"),
        "cnt",
    )
    return cells.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_heavy_hitters(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    top_k: int = 20,
    text_col: str = "text",
    candidates: "DataFrame | None" = None,
) -> DataFrame:
    """Heavy hitters by count-min estimate: every candidate term is scored
    est(t) = min_i sketch[i][bucket_i(t)] and the ``top_k`` by
    (est DESC, term ASC) are returned WITH their exact counts, so the
    sketch's no-under-count contract (est ≥ exact, always) is auditable
    row by row.  Candidates default to the corpus's own distinct terms;
    pass ``candidates`` (a ``(term)`` DataFrame) to probe an EXTERNAL
    list instead — at 100 TB the sketch (≤ depth·width longs, sparse) is
    the only state, broadcast to the probe side, and a candidate hashing
    to an absent cell correctly estimates 0 (left join + COALESCE, not an
    inner join that would drop the row from the min and inflate it).

    Returns ``(term, est, exact, rank)``, rank 1..top_k (``exact`` = 0
    for external candidates absent from the corpus).
    """
    sketch = count_min_sketch(docs, depth=depth, width=width, text_col=text_col)
    toks = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    corpus_exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    if candidates is None:
        exact = corpus_exact
    else:
        # mirror the corpus tokenizer's admission rule: NULL/empty
        # candidates would survive distinct(), then concat_ws would drop
        # the NULL from the probe hash and the bucket would degenerate to
        # hash(row) alone — a meaningless estimate on a phantom term
        exact = (
            candidates.select(F.col("term").cast("string").alias("term"))
            .filter(F.col("term").isNotNull() & (F.col("term") != ""))
            .distinct()
            .join(corpus_exact, "term", "left")
            .select(
                "term", F.coalesce(F.col("exact"), F.lit(0)).alias("exact")
            )
        )
    probes = exact.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        "term",
        "exact",
    ).select(
        "row",
        (
            _hex16(F.md5(F.concat_ws("|", F.col("row").cast("string"), F.col("term"))))
            % width
        ).alias("bucket"),
        "term",
        "exact",
    )
    # LEFT join + COALESCE 0: the sketch is sparse (only non-empty cells
    # materialized), so an external candidate hashing to an absent
    # (row, bucket) cell must contribute 0 to the min — an inner join
    # would silently DROP that row from the min and inflate the
    # estimate.  (Corpus-internal candidates always hit cells they
    # themselves incremented, so for them the two joins agree.)
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"),
            F.first("exact").alias("exact"),
        )
    )
    from pyspark.sql import Window

    # TakeOrdered top-k (per-partition heads + driver merge of k rows) —
    # NOT a global row_number window, whose single-task sort over every
    # distinct term would be the scale bottleneck; the rank window runs
    # on the k survivors only.
    top = est.orderBy(F.col("est").desc(), F.col("term").asc()).limit(top_k)
    w = Window.orderBy(F.col("est").desc(), F.col("term").asc())
    return top.select(
        "term", "est", "exact", F.row_number().over(w).alias("rank")
    )
