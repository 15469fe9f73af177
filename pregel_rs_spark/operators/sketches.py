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
