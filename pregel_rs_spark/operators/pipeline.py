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


def corpus_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling — the training-mix operator: keep
    each document with its stratum's rate (e.g. ``{"en": 0.5, "de": 1.0}``),
    decided by a hash of the document key, NOT an RNG.

    Properties a 100 TB pipeline needs and ``DataFrame.sample`` lacks:

    * **Reproducible & engine-portable** — the decision is a LEXICOGRAPHIC
      compare of the first 8 hex chars of ``md5(key)`` against the rate's
      8-hex-digit threshold ``floor(rate·2^32)`` (fixed-width lowercase hex
      order == numeric order): pure string ops, bit-identical in Spark,
      DuckDB, and Python, so reruns, backfills, and audits select the
      identical rows (no seed/partitioning dependence, no float hash math).
    * **Map-only** — one codegen'd filter, no shuffle, no state; the rate
      table enters as a folded CASE expression (strata counts are small).
    * **Monotone in rate** — raising a stratum's rate only ADDS documents
      (the kept set at 0.3 is a subset of the kept set at 0.5), so mix
      re-weighting between training runs never churns previously selected
      data — the property that keeps dataset diffs reviewable.

    Returns the sampled rows of ``docs`` unchanged.
    """
    frac_hex = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)

    def keep_for(r: float):
        if r <= 0.0:
            return F.lit(False)
        if r >= 1.0:
            return F.lit(True)
        return frac_hex < F.lit(sample_threshold_hex(r))

    keep = None
    for stratum, r in sorted(rates.items()):
        cond = F.col(stratum_col) == stratum
        keep = (
            F.when(cond, keep_for(r)) if keep is None
            else keep.when(cond, keep_for(r))
        )
    keep = (
        keep.otherwise(keep_for(default_rate))
        if keep is not None else keep_for(default_rate)
    )
    return docs.filter(keep)


def ngram_set(docs: DataFrame, n: int = 5, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Distinct lowercase word ``n``-grams per document — pure Catalyst
    array ops (split → filter → slice window), no UDF, no shuffle until the
    caller aggregates.  Tokenization matches :func:`...text.top_terms`
    (``[^a-z0-9]+`` split) so every text operator shares one token law.

    Returns ``(id_col, gram)``, one row per DISTINCT gram per doc.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    # the >= n guard matters: Spark's sequence(1, stop) counts DOWN when
    # stop < 1, so a short doc would otherwise produce slice(start=0) errors
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col), F.explode(grams).alias("gram")).distinct()
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_shared: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection: training documents sharing ≥
    ``min_shared`` distinct word ``n``-grams with any benchmark/eval
    document (the standard pre-training decontamination screen — n-gram
    overlap against held-out eval sets, as popularized by the GPT-3/PaLM
    data papers' 8-13-gram checks; public methodology).

    Scale shape (100 TB corpus, small benchmark): the benchmark side is
    thousands of documents, so its exploded gram set broadcast-joins
    against the corpus grams — a map-side hash join over one linear pass
    of the training text; only MATCHING (train, bench) gram hits reach the
    one hash aggregation, whose input is bounded by true overlap, not
    corpus size.  No pairwise doc×doc work anywhere.

    Returns ``(doc_id, bench_id, shared)`` — one row per contaminated
    (train, bench) pair, ``shared`` = count of distinct shared n-grams.
    Training docs that ARE the benchmark doc (same id) are excluded.
    """
    corpus_grams = ngram_set(docs, n, text_col)
    bench_grams = ngram_set(benchmark, n, text_col).select(
        F.col("doc_id").alias("bench_id"), "gram"
    )
    hits = corpus_grams.join(
        F.broadcast(bench_grams), "gram"
    ).filter(F.col("doc_id") != F.col("bench_id"))
    return (
        hits.groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def sample_threshold_hex(rate: float) -> str:
    """8-hex-digit threshold for :func:`corpus_sample`: keep iff the first
    8 hex chars of md5(key) are lexicographically < this (fixed-width
    lowercase hex compares like the integer floor(rate·2^32))."""
    return format(min(max(int(rate * 4294967296.0), 0), 0xFFFFFFFF), "08x")


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-(lang, source) corpus observability rollup — the summary table
    every curation pipeline publishes next to its output (doc counts,
    volume, token mass, quality-relevant aggregates) so a 100 TB run's
    composition drift is visible without scanning the corpus.

    One hash aggregation over (lang, source) — map-side partial combine
    collapses each partition to ≤ |langs × sources| rows before the
    shuffle, so the exchange is O(groups), not O(docs).

    Returns ``(lang, source, n_docs, total_chars, mean_chars,
    total_ws_tokens, distinct_contents)`` — ``distinct_contents`` counts
    exact-distinct documents (md5) per group, the dedup-pressure signal;
    mean rounded 6 dp for oracle parity.
    """
    t = F.col(text_col)
    ws_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    return (
        docs.select(
            "lang",
            "source",
            F.length(t).alias("__chars__"),
            ws_tokens.alias("__toks__"),
            F.md5(t).alias("__h__"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__chars__").cast("long").alias("total_chars"),
            F.round(F.sum("__chars__") / F.count(F.lit(1)), 6).alias(
                "mean_chars"
            ),
            F.sum("__toks__").cast("long").alias("total_ws_tokens"),
            F.countDistinct("__h__").alias("distinct_contents"),
        )
    )


def corpus_mix(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic data-mixture sampling — the source-weighting stage
    of a training-corpus build (the Pile, LLaMA, GPT-3 style mixtures):
    given target mixture ``weights`` per source and a total
    ``token_budget``, sample each source at the rate that makes its
    expected token contribution ``budget · w_s / Σw``,

        rate_s = (budget · w_s / Σw) / tokens_s

    where ``tokens_s`` is the source's whitespace-token total (same
    tokenization as ``token_counts``).  The per-document decision reuses
    :func:`corpus_sample`'s md5-threshold idiom, but with the threshold
    computed IN the engine (``hex(floor(rate · 2³²))``, fixed-width
    lowercase compare) because here the rate is data-dependent — it
    falls out of a groupBy, not a literal — yet must stay bit-identical
    across engines, reruns, and partitionings.

    Properties: map-only after one tiny per-source aggregate (broadcast
    back — |sources| rows); monotone in budget per source; a source with
    rate ≥ 1 keeps everything it has (single-epoch mixture — upsampling
    repeats are a trainer concern, not a corpus-build concern, and are
    recorded by ``mix_rate_ppm > 1e6`` in the audit columns).  Sources
    absent from ``weights`` get weight 0 (``keep = 0``).  NULL text
    yields a NULL verdict (module NULL contract) and contributes nothing
    to ``tokens_s``.

    Returns docs' key/source plus audit columns ``(n_tokens,
    mix_rate_ppm, keep)``; filter ``keep = 1`` for the sampled corpus.
    ``mix_rate_ppm`` is ``floor(rate · 10⁶)`` as a BIGINT — an exact
    integer (unlike ``round(rate, 6)``, whose HALF_UP-on-decimal rule
    differs between engines) so the audit column itself is
    oracle-comparable.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    if not weights:
        raise ValueError("weights must name >=1 source")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")
    t = F.col(text_col)
    tok = docs.select(
        F.col(key_col),
        F.col(source_col),
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .cast("long")
        .alias("n_tokens"),
    )
    # per-source target tokens as ONE python-side literal per source, so
    # the engine does a single division — IEEE-identical everywhere
    target = None
    for s, w in sorted(weights.items()):
        numer = F.lit(float(token_budget) * (float(w) / wsum))
        target = (
            F.when(F.col(source_col) == s, numer)
            if target is None
            else target.when(F.col(source_col) == s, numer)
        )
    target = target.otherwise(F.lit(0.0))
    totals = tok.groupBy(source_col).agg(
        F.sum("n_tokens").alias("src_tokens")
    ).withColumn(
        "mix_rate",
        F.when(
            F.coalesce(F.col("src_tokens"), F.lit(0)) > 0,
            target / F.col("src_tokens"),
        ).otherwise(F.lit(0.0)),
    ).select(source_col, "mix_rate")
    frac_hex = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    thr_hex = F.lpad(
        F.lower(F.hex(F.floor(F.col("mix_rate") * F.lit(4294967296.0)))),
        8, "0",
    )
    return tok.join(F.broadcast(totals), source_col).select(
        key_col,
        source_col,
        "n_tokens",
        F.floor(F.col("mix_rate") * F.lit(1000000.0))
        .cast("long")
        .alias("mix_rate_ppm"),
        F.when(F.col("n_tokens").isNull(), F.lit(None).cast("int"))
        .when(F.col("mix_rate") >= 1.0, F.lit(1))
        .when(frac_hex < thr_hex, F.lit(1))
        .otherwise(F.lit(0))
        .alias("keep"),
    )


def corpus_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment — the hold-out stage of a
    training-corpus build.  Each document lands in exactly one split,
    decided by where the first 8 hex chars of ``md5(salt || ':' || key)``
    fall among cumulative 8-hex thresholds (:func:`sample_threshold_hex`
    idiom — fixed-width lowercase hex compares like ``floor(f·2³²)``).

    Properties a 100 TB pipeline needs and ``DataFrame.randomSplit``
    lacks:

    * **Growth-stable** — a document's split depends only on its own key,
      so appending a new crawl snapshot NEVER moves an old document
      between train and test (randomSplit reassigns everything on every
      run — silent eval contamination).
    * **Exclusive & exhaustive by construction** — threshold intervals
      partition [0, 2³²); no doc is lost or double-assigned regardless of
      partitioning.
    * **Salted** — a different ``salt`` draws an independent split family
      (for k-fold-style re-draws) without touching the data; the salt is
      hashed WITH the key, so split correlation across salts is that of
      md5, not of key ranges.
    * **Map-only** — one codegen'd CASE over a hash already computed;
      no shuffle, no RNG, no state.

    ``fractions`` (default ``{"train": .98, "valid": .01, "test": .01}``)
    must sum to 1 ± 1e-9; assignment order is lexicographic by split name
    so the mapping is reproducible from the dict alone.  Returns ``docs``
    plus a ``split`` column.
    """
    if fractions is None:
        fractions = {"train": 0.98, "valid": 0.01, "test": 0.01}
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative and non-empty")
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must sum to 1, got {sum(fractions.values())}"
        )
    names = sorted(fractions)
    frac_hex = F.substring(
        F.md5(
            F.concat(
                F.lit(salt), F.lit(":"), F.col(key_col).cast("string")
            )
        ),
        1, 8,
    )
    expr, cum = None, 0.0
    for name in names[:-1]:
        cum += fractions[name]
        thr = F.lit(sample_threshold_hex(cum))
        expr = (
            F.when(frac_hex < thr, F.lit(name))
            if expr is None
            else expr.when(frac_hex < thr, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    # NULL key -> NULL split (module NULL contract), never a silent
    # fall-through to the last bucket
    expr = F.when(F.col(key_col).isNull(), F.lit(None).cast("string")).otherwise(expr)
    return docs.withColumn("split", expr)


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    n_shards: int = 64,
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the last stage of a pretraining
    corpus build (public technique: GPT-2/3, T5 and LLaMA-style pipelines
    concatenate documents back to back and slice the stream into
    fixed-``ctx_len`` training sequences; a document may span a sequence
    boundary).  This operator assigns every document its place in that
    stream without materializing the stream itself: per document it emits
    the half-open token span ``[tok_start, tok_end)`` it occupies and the
    first/last sequence indices it touches, so the trainer-side reader can
    slice any sequence by filtering ``seq_first <= s <= seq_last``.

    A single global concatenation order would be one total sort — the
    classic non-scalable shape.  Instead the corpus is split into
    ``n_shards`` independent streams by a salted md5 of the document key
    (four-nibble value mod n_shards — the :func:`corpus_split` hex idiom,
    byte-replayable in ANSI SQL), and each shard is packed independently:
    order within a shard is (md5, key) — deterministic, growth-stable for
    the docs already in a shard, and engine-independent.  ``(shard,
    seq_first)`` is globally unique per sequence.  Scale rule: a shard is
    one window-sort task, so pick ``n_shards ≈ corpus_tokens /
    tokens_per_task`` (e.g. 2^14 shards for 10^12 tokens keeps each sort
    ~60M tokens); shard count scales with data, not with cluster size.

    Tokenization is the corpus-wide whitespace rule (``token_counts``
    parity: empty/blank text ⇒ 0 tokens).  Zero-token documents occupy an
    empty span (``tok_start = tok_end``) and touch no sequence
    (``seq_first/seq_last`` NULL).  NULL text propagates NULL pack columns
    (module NULL contract) and contributes nothing to any stream.

    Returns (key, shard, n_tokens, tok_start, tok_end, seq_first,
    seq_last) — all BIGINT, integer-exact on every engine.
    """
    from pyspark.sql import Window

    if ctx_len <= 0:
        raise ValueError(f"ctx_len must be positive, got {ctx_len}")
    if not 1 <= n_shards <= 65536:
        raise ValueError(
            f"n_shards must be in [1, 65536] (four md5 nibbles), got {n_shards}"
        )
    t = F.col(text_col)
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    nib = lambda i: (
        F.position(F.substring(F.col("__h"), i, 1), F.lit("0123456789abcdef"))
        - 1
    ).cast("long")
    tok = docs.select(
        F.col(key_col),
        h.alias("__h"),
        F.when(t.isNull(), F.lit(None).cast("long"))
        .when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .cast("long")
        .alias("n_tokens"),
    ).withColumn(
        "shard",
        (
            (nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)) % n_shards
        ).cast("long"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = tok.filter(F.col("n_tokens").isNotNull()).withColumn(
        "tok_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    out = packed.select(
        key_col,
        "shard",
        "n_tokens",
        "tok_start",
        (F.col("tok_start") + F.col("n_tokens")).alias("tok_end"),
        F.when(
            F.col("n_tokens") > 0, F.expr(f"tok_start DIV {ctx_len}")
        ).alias("seq_first"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(f"(tok_start + n_tokens - 1) DIV {ctx_len}"),
        ).alias("seq_last"),
    )
    nulls = tok.filter(F.col("n_tokens").isNull()).select(
        key_col,
        "shard",
        *[
            F.lit(None).cast("long").alias(c)
            for c in ("n_tokens", "tok_start", "tok_end", "seq_first", "seq_last")
        ],
    )
    return out.unionByName(nulls)


def group_sample(
    docs: DataFrame,
    group_cols: list[str],
    k: int,
    key_col: str = "doc_id",
    salt: str = "gsample",
) -> DataFrame:
    """Deterministic fixed-``k`` sample per group — the distributed
    reservoir every corpus-inspection loop needs (k examples per
    (lang, source) for eval sheets, per-cluster exemplars, per-host spot
    checks) without ``ORDER BY rand() LIMIT`` nondeterminism.

    Rank = ``row_number`` over (group, ORDER BY md5(salt:key), key) — the
    md5 order is a uniform permutation independent of the data's physical
    order, so the sample is unbiased, reproducible across engines/reruns
    (the :func:`corpus_sample` hash idiom), and STABLE per key: a doc's
    rank within its group only moves when earlier-hash docs enter the
    group.  One window shuffle keyed by group; skew bound = largest
    group, and since only rank ≤ k survives, a 100 TB deployment prunes
    with the same window it pays for.  NULL keys rank last
    deterministically.  Returns the sampled rows + ``sample_rank``
    (1-based).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(h.asc_nulls_last(), key_col)
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 256,
    alpha: float = 1.0,
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling weights (DSIR — Xie et
    al., NeurIPS 2023; public literature): score every raw document by
    how target-like its hashed bag-of-words distribution is, the
    importance-weighting stage that precedes resampling a pretraining
    corpus toward a trusted seed set (the published pipeline's hashed
    n-gram variant).

    Bucket unigram distributions are estimated for the ``target`` seed
    set and the full ``docs`` corpus over the SAME hashing-trick feature
    space (:func:`~pregel_rs_spark.operators.text.hash_features`), with
    add-``alpha`` (Laplace) smoothing over the ``n_buckets`` vocabulary:

        p̂(b) = (count(b) + alpha) / (total + alpha · n_buckets)

    and each document's weight is its hashed-feature log-likelihood
    ratio  Σ_b cnt_doc(b) · ( ln p̂_target(b) − ln p̂_raw(b) ), rounded
    6 dp (engine-portable; the float-sum convention of
    ``link_prediction.adamic_adar``).  Positive = more target-like than
    the corpus average; resample ∝ exp(weight) downstream
    (:func:`corpus_sample` / :func:`corpus_select` compose).

    Scale shape: the only corpus-sized shuffle is hash_features'
    (doc_id, bucket) aggregate (map-side combined); both bucket
    distributions are ≤ ``n_buckets`` rows (broadcast), the totals are
    single-row crossJoins, and the per-doc weight is one broadcast join
    + one hash agg keyed by doc_id.  Nothing pairwise, nothing
    collected — 10^12 docs cost one explode-agg pass.  Docs with
    NULL/blank text (no features) return weight 0.0 via the left join,
    keeping the output total over the corpus (``corpus_filter``
    auditability convention).

    Returns ``(doc_id, dsir_weight)``.
    """
    from pyspark.sql.functions import broadcast

    from .text import hash_features

    if not 0.0 < alpha:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    feats = hash_features(docs, n_buckets=n_buckets, text_col=text_col)
    tfeats = hash_features(target, n_buckets=n_buckets, text_col=text_col)
    raw_b = feats.groupBy("bucket").agg(F.sum("cnt").alias("c_r"))
    tgt_b = tfeats.groupBy("bucket").agg(F.sum("cnt").alias("c_t"))
    totals = (
        raw_b.agg(F.coalesce(F.sum("c_r"), F.lit(0)).alias("t_r"))
        .crossJoin(tgt_b.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("t_t")))
    )
    am = float(alpha) * n_buckets
    llr = (
        raw_b.join(tgt_b, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("c_r"), F.lit(0)).alias("c_r"),
            F.coalesce(F.col("c_t"), F.lit(0)).alias("c_t"),
        )
        .crossJoin(broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("c_t") + F.lit(float(alpha)))
                      / (F.col("t_t") + F.lit(am)))
                - F.log((F.col("c_r") + F.lit(float(alpha)))
                        / (F.col("t_r") + F.lit(am)))
            ).alias("llr"),
        )
    )
    per_doc = (
        feats.join(broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("llr")).alias("__w"))
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce(F.col("__w"), F.lit(0.0)), 6).alias(
                "dsir_weight"
            ),
        )
    )


def corpus_sample_weighted(
    docs: DataFrame,
    weight_col: str,
    n: int,
    group_col: str | None = None,
    seed: int = 42,
    key_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — the quality-weighted
    counterpart to :func:`corpus_sample` (algorithm A-ES, Efraimidis &
    Spirakis, IPL 2006 — public literature): each row draws a
    deterministic uniform u from ``md5(seed|key)`` and is ranked by
    ``ln(u) / w`` (monotone in the A-ES key ``u^(1/w)``); the ``n``
    largest per group win.  Inclusion probability rises with ``w`` —
    sampling a pretraining corpus ∝ quality score, PageRank, or length
    without replacement and without an RNG (reruns and audits select
    identical rows on any engine).

    u is the dyadic rational ``(v + 0.5) / 16^6`` from the first 6 md5
    nibbles — exact in IEEE-754, never 0 or 1, so ``ln`` is finite.
    Rows with NULL or non-positive weight are EXCLUDED (a zero-weight
    row can never win A-ES; the caller owns fixing negative weights) —
    the returned frame is the sample, not a verdict table.  Ranking
    ties (astronomically unlikely: u collides only on md5-prefix
    collision) break by key ASC.

    Scale shape: one map-only key computation + one per-group window
    top-n — the same single-shuffle shape as ``group_sample``; with
    ``group_col=None`` the window is global (one partition: fine for
    the driver-gate sizes; at corpus scale ALWAYS pass a group).

    Returns the winning rows: ``(group?, key, weight, es_key, rank)``
    with ``es_key`` rounded 6 dp for auditability (ranking uses the
    unrounded value).
    """
    from pyspark.sql.window import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(key_col).cast("string")))
    nib = lambda i: F.position(
        F.substring(h, i, 1), F.lit("0123456789abcdef")
    ) - 1
    v = (
        nib(1) * 1048576 + nib(2) * 65536 + nib(3) * 4096
        + nib(4) * 256 + nib(5) * 16 + nib(6)
    )
    u = (v.cast("double") + 0.5) / float(16 ** 6)
    w = F.col(weight_col).cast("double")
    es = F.log(u) / w
    grouped = [group_col] if group_col else []
    win = Window.partitionBy(*grouped).orderBy(
        F.desc("__es"), F.asc(key_col)
    )
    return (
        docs.filter(w.isNotNull() & (w > 0))
        .select(
            *grouped,
            key_col,
            w.alias("weight"),
            es.alias("__es"),
        )
        .withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= n)
        .select(
            *grouped,
            key_col,
            "weight",
            F.round("__es", 6).alias("es_key"),
            "rank",
        )
    )


def group_quantiles(
    docs: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    percents: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """EXACT nearest-rank quantiles per group — the corpus length/size
    profile (p50/p90/p99 document length per source) with none of
    ``approx_percentile``'s version-pinned sketch opacity: quantile p =
    the smallest value whose cumulative count reaches ceil(p·n/100),
    computed with pure integer arithmetic (ceil(a/b) = (a+b−1) DIV b), so
    any engine replays it bit-for-bit.

    Scale shape: one (group, value) hash agg first — the cumulative
    window then runs over DISTINCT values per group (bounded by value
    cardinality, not corpus rows; for document lengths that is ≤ max
    length), so the per-group sort never sees raw rows.  One final
    group agg of conditional mins.  NULL values are excluded (SQL
    aggregate convention).  Returns ``(<group>, n, p<p> ...)``.
    """
    if not percents or any(not 1 <= p <= 100 for p in percents):
        raise ValueError(f"percents must be in [1,100], got {percents}")
    from pyspark.sql import Window as W

    counts = (
        docs.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = W.partitionBy(group_col).orderBy(value_col)
    cum = counts.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(W.partitionBy(group_col))
    )
    aggs = [F.max("__n").cast("long").alias("n")]
    for p in percents:
        rank = F.expr(f"CAST((__n * {int(p)} + 99) DIV 100 AS BIGINT)")
        aggs.append(
            F.min(
                F.when(F.col("__cum") >= rank, F.col(value_col))
            ).alias(f"p{int(p)}")
        )
    return cum.groupBy(group_col).agg(*aggs)
