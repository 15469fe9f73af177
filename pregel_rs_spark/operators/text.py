"""Text-analysis operators over ``documents(doc_id, text, lang, …)``.

All pure Catalyst expressions (regexp/len/split — whole-stage codegen, no
UDFs), designed so the identical formula is expressible in ANSI SQL for the
DuckDB oracle.  Each function returns a DataFrame keyed by ``doc_id``.

NULL contract: a NULL ``text`` propagates to NULL outputs (SQL-standard
three-valued logic, identical in the oracle engine) — boolean verdicts
like ``gopher_quality.keep`` are then NULL, which every downstream
``filter("keep = 1")`` treats as not-kept.  Callers wanting
empty-string semantics coalesce upstream; silently conflating missing
and empty documents here would corrupt corpus accounting.  Pinned in
``test_null_text_propagates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword anchors for the n-gram/stopword heuristic;
# deliberately small + fixed so the SQL oracle can inline them
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "dans"],
    "es": ["el", "la", "los", "que", "es", "en"],
}

_WORD_RE = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_count(text_col, words: list[str]):
    """Count occurrences of any marker word (word-bounded, lowercase)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(pat), F.lit(0)))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword-ish tokens (letters / digits /
    single punctuation — the classic pre-tokenizer regex).
    Returns ``(doc_id, ws_tokens, bpe_tokens)``."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(_WORD_RE), F.lit(0))).alias("bpe_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:

      alpha_ratio     — alphabetic chars / chars
      punct_ratio     — punctuation chars / chars
      stopword_ratio  — english stopword hits / whitespace tokens
      mean_word_len   — chars / tokens

      score = 0.5*alpha_ratio + 0.3*min(stopword_ratio*5, 1)
              + 0.2*(1 - min(punct_ratio*4, 1))

    Returns ``(doc_id, n_chars, alpha_ratio, punct_ratio, stopword_ratio,
    mean_word_len, score)`` — ratios rounded to 6 dp for oracle parity.
    """
    t = F.col(text_col)
    n = F.length(t)
    toks = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    stop = _marker_count(t, LANG_MARKERS["en"])
    nz = F.greatest(n, F.lit(1))
    tz = F.greatest(toks, F.lit(1))
    alpha_ratio = alpha / nz
    punct_ratio = punct / nz
    stop_ratio = stop / tz
    score = (
        alpha_ratio * 0.5
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio * 4, F.lit(1.0))) * 0.2
    )
    return docs.select(
        "doc_id",
        n.alias("n_chars"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(n / tz, 6).alias("mean_word_len"),
        F.round(score, 6).alias("score"),
    )


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document-quality rules (Rae et al. 2021, "Scaling
    Language Models: … Gopher" §A1.1 — public heuristics, adopted by
    MassiveText/RefinedWeb/Dolma):

      n_words             — whitespace tokens
      frac_alpha_words    — tokens containing ≥1 ASCII letter / n_words
      symbol_word_ratio   — ('#' | '...' | '…') occurrences / n_words
      bullet_line_frac    — nonempty lines starting with a bullet (-, *, •)
      ellipsis_line_frac  — nonempty lines ending with '...' / '…'
      dup_line_frac       — 1 − distinct nonempty lines / nonempty lines
      keep                — 1 iff 50 ≤ n_words ≤ 100000,
                            frac_alpha_words ≥ 0.80,
                            symbol_word_ratio ≤ 0.1,
                            bullet_line_frac ≤ 0.9,
                            ellipsis_line_frac ≤ 0.3,
                            dup_line_frac ≤ 0.3

    Everything is computed with array higher-order functions over the
    in-row line/token splits — a map-only, shuffle-free, whole-stage-codegen
    plan (no explode, so a 100 TB corpus pass is one scan).  Ratios rounded
    to 6 dp for oracle parity.  Returns ``(doc_id, n_words,
    frac_alpha_words, symbol_word_ratio, bullet_line_frac,
    ellipsis_line_frac, dup_line_frac, keep)``.
    """
    t = F.col(text_col)
    toks = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))
    n_words = F.size(toks)
    wz = F.greatest(n_words, F.lit(1))
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    symbols = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), F.lit(0)))
    lines = F.filter(
        F.split(t, r"\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_lines = F.size(lines)
    lz = F.greatest(n_lines, F.lit(1))
    bullet = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
    ellipsis = F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$")))
    dup = (n_lines - F.size(F.array_distinct(lines))) / lz
    frac_alpha = alpha_words / wz
    sym_ratio = symbols / wz
    bullet_frac = bullet / lz
    ell_frac = ellipsis / lz
    keep = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (frac_alpha >= 0.80)
        & (sym_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ell_frac <= 0.3)
        & (dup <= 0.3)
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(frac_alpha, 6).alias("frac_alpha_words"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ell_frac, 6).alias("ellipsis_line_frac"),
        F.round(dup, 6).alias("dup_line_frac"),
        keep.cast("long").alias("keep"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-anchor language ID over {en, de, fr, es}.

    Deterministic tie-break: en ≥ de ≥ fr ≥ es (fixed priority order).
    Returns ``(doc_id, lang_pred)``.
    """
    t = F.col(text_col)
    c = {lang: _marker_count(t, words) for lang, words in LANG_MARKERS.items()}
    pred = (
        F.when((c["en"] >= c["de"]) & (c["en"] >= c["fr"]) & (c["en"] >= c["es"]), "en")
        .when((c["de"] >= c["fr"]) & (c["de"] >= c["es"]), "de")
        .when(c["fr"] >= c["es"], "fr")
        .otherwise("es")
    )
    return docs.select("doc_id", pred.alias("lang_pred"))


def repetition_ratios(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-2-gram repetition — the signature Gopher repetition signal at
    word granularity (Rae et al. 2021 §A1.1 "fraction of characters in
    duplicate n-grams"; public heuristic):

      n_2grams        — word 2-grams (n_words − 1, 0 for short docs)
      dup_2gram_frac  — 1 − distinct 2-grams / 2-grams
      top_2gram_share — occurrences of the most frequent 2-gram / 2-grams
                        (ties don't matter: the share is the same)

    Unlike :func:`gopher_quality`'s in-row array rules, the top-gram
    share needs a per-(doc, gram) count — one explode + one hash
    aggregation keyed by (doc_id, gram), then a per-doc max; at corpus
    scale that shuffle is keyed by doc_id-dominated composite keys, so
    it partitions evenly (no hot keys — a gram is only hot WITHIN its
    document).  Ratios rounded 6 dp.  Returns
    ``(doc_id, n_2grams, dup_2gram_frac, top_2gram_share)``.
    """
    t = F.col(text_col)
    toks = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))
    grams = F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )
    base = docs.select("doc_id", grams.alias("grams"))
    counts = (
        base.select("doc_id", F.explode_outer("grams").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("gram").isNotNull(), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_2grams"),
            F.count(F.when(F.col("gram").isNotNull(), 1)).alias("n_distinct"),
            F.max(F.when(F.col("gram").isNotNull(), F.col("c")).otherwise(0))
            .alias("top_c"),
        )
    )
    z = F.greatest(F.col("n_2grams"), F.lit(1))
    return counts.select(
        "doc_id",
        "n_2grams",
        F.round((F.col("n_2grams") - F.col("n_distinct")) / z, 6).alias(
            "dup_2gram_frac"
        ),
        F.round(F.col("top_c") / z, 6).alias("top_2gram_share"),
    )


PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IP = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction — the C4/Dolma-style privacy pass over web text
    (public pipeline step): emails, IPv4 addresses, and phone-shaped digit
    runs are replaced by ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` tokens, in
    that order (each pass runs on the previous pass's output, so a digit
    run inside an already-redacted token is never double-matched).

    Pure ``regexp_replace`` / ``regexp_extract_all`` — whole-stage
    codegen, map-only, one scan; the patterns avoid engine-specific
    syntax so Spark (Java regex) and the SQL oracle (RE2) match exactly.
    Counts are per-pattern over the ORIGINAL text.

    Returns ``(doc_id, text_scrubbed, n_emails, n_ips, n_phones)``.
    """
    t = F.col(text_col)

    def n(pat):
        return F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long")

    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IP, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        scrubbed.alias("text_scrubbed"),
        n(PII_EMAIL).alias("n_emails"),
        n(PII_IP).alias("n_ips"),
        n(PII_PHONE).alias("n_phones"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the canonicalized text (lowercase,
    non-alphanumerics → space, whitespace collapsed, trimmed) — robust to
    punctuation/casing/whitespace edits.  Returns ``(doc_id, fingerprint)``."""
    t = F.col(text_col)
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(t), r"[^a-z0-9]+", " "), r"\s+", " "
        )
    )
    return docs.select("doc_id", F.md5(canon).alias("fingerprint"))


def boilerplate_removal(
    docs: DataFrame,
    min_doc_frac: float = 0.5,
    delimiter: str = " ",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-frequency segment dedup — the C4 / CCNet / RefinedWeb web-text
    cleaning step (public technique: C4 dropped repeated three-sentence
    spans, CCNet deduplicated paragraphs by corpus hash, RefinedWeb removed
    exact duplicate lines): split each document into segments on
    ``delimiter`` (lines for real web text; the driver row uses word
    granularity so the synthetic word-soup corpus exercises real removal),
    drop every segment whose document frequency ≥ ``min_doc_frac`` × the
    corpus document count, and reassemble the survivors in original order.

    Scale shape (100 TB-safe): one explode, a distinct + hash agg on the
    segment string for document frequency (hash the segment to a 64-bit key
    first if segments are long), an anti-join against the boilerplate set,
    and one re-agg by doc_id.  The boilerplate set is small *by
    construction*: a segment needs df ≥ f·N docs, so there are at most
    S̄/f of them (S̄ = mean segments per document) — a corpus-size-
    independent bound, broadcastable at any scale.  No pairwise work
    anywhere.

    Returns ``(doc_id, n_segments, n_removed, text_clean)`` — ``text_clean``
    is ``''`` when every segment was boilerplate.
    """
    segs = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), delimiter)).alias("pos", "seg"),
    )
    freq = (
        segs.select("doc_id", "seg")
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        freq.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") >= F.col("n_docs") * F.lit(min_doc_frac))
        .select("seg")
    )
    kept = segs.join(boiler, "seg", "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            delimiter,
        ).alias("text_clean"),
    )
    totals = segs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_segments"))
    return (
        totals.join(clean, "doc_id", "left")
        .select(
            "doc_id",
            "n_segments",
            (F.col("n_segments") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def top_terms(
    docs: DataFrame, top_k: int = 3, min_len: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-document distinctive terms: lowercase word tokens (length ≥
    ``min_len``), ranked by (term frequency DESC, document frequency ASC,
    term ASC) and cut to ``top_k`` — the tf-idf ordering with an
    integer-only sort key, so the ranking is bit-exact across engines (a
    float tf·idf would rank on ln(), whose last ulp differs between libms).

    Scale shape: explode → two hash aggregations (term-per-doc, then
    doc-freq per term) + one window per doc — all shuffle on doc_id/term,
    no skew beyond natural stopword terms, which ``min_len`` and df-ASC
    already push down the ranking.

    Returns ``(doc_id, term, tf, df, rank)``.
    """
    from pyspark.sql.window import Window

    terms = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+")
            ).alias("term"),
        )
        .filter(F.length("term") >= min_len)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        terms.join(df_, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "term", "tf", "df", F.col("rank").cast("long").alias("rank"))
    )


def ngram_lm_scores(
    docs: DataFrame, k_smooth: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """In-corpus bigram language-model scoring — the CCNet-style
    perplexity quality filter (public technique: CCNet ranks Common-Crawl
    paragraphs by LM perplexity; GPT-2/3-era pipelines filter on it), with
    the LM trained on the corpus ITSELF so the operator is closed over its
    input (no external model): add-k-smoothed bigram probabilities

        p(w | w_prev) = (c(w_prev, w) + k) / (c(w_prev) + k·V)

    where counts come from every non-NULL document and V is the distinct
    whitespace-token vocabulary.  Per document: ``cross_entropy`` =
    -mean(log2 p) over its (n_tokens - 1) bigram slots and ``ppl`` =
    2^cross_entropy.  LOW perplexity ⇒ repetitive/templated text, HIGH ⇒
    out-of-distribution noise — both tails are the filter targets.

    Scale shape (100 TB-safe): bigrams are built IN-ROW (``zip_with`` over
    two array slices — no positional self-join), the two count tables are
    single hash aggregations whose size is vocabulary-bounded (≪ corpus;
    token Zipf makes the bigram table sparse), the probability lookup is
    two equi-joins of the exploded bigram stream against those tables, and
    the final per-doc agg is one more hash shuffle.  V rides in as a
    broadcast 1-row frame.  No pairwise work, no driver loops.

    Documents with NULL text or < 2 tokens have no bigram slot and are
    absent from the result (the LM neither trains on nor scores them).
    Tokenization is lowercase + split on ``\\s+`` after trim — chosen to be
    byte-replayable in ANSI SQL for the oracle.
    """
    if k_smooth <= 0:
        raise ValueError(f"k_smooth must be > 0, got {k_smooth}")
    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    with_arr = docs.filter(F.col(text_col).isNotNull()).select(
        "doc_id", arr.alias("__toks")
    )
    bigrams = with_arr.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.expr("slice(__toks, 1, size(__toks) - 1)"),
                F.expr("slice(__toks, 2, size(__toks) - 1)"),
                lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))

    c_bg = bigrams.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    c_ctx = bigrams.groupBy("prev").agg(F.count(F.lit(1)).alias("c_ctx"))
    vocab = (
        with_arr.select(F.explode("__toks").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )

    p = (F.col("c_bg") + F.lit(k_smooth)) / (
        F.col("c_ctx") + F.lit(k_smooth) * F.col("v")
    )
    scored = (
        bigrams.join(c_bg, ["prev", "cur"])
        .join(c_ctx, "prev")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum(F.log2(p)) / F.count(F.lit(1))).alias("__h"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        F.round("__h", 6).alias("cross_entropy"),
        F.round(F.pow(F.lit(2.0), F.col("__h")), 6).alias("ppl"),
    )


def perplexity_buckets(
    docs: DataFrame,
    buckets: int = 3,
    k_smooth: float = 0.5,
    exact: bool = True,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (public technique:
    CCNet splits each language's Common-Crawl documents into head/middle/
    tail thirds by LM perplexity and trains preferentially on the head).
    Scores come from :func:`ngram_lm_scores` (in-corpus bigram LM, closed
    over the input); bucketing is per ``lang_col`` so one dominant
    language doesn't absorb every head slot.

    Two modes:

    * ``exact=True`` — rank-exact ``ntile(buckets)`` over (lang, ppl,
      doc_id).  Integer-exact and engine-replayable (the SQL-standard
      ntile fill rule), but a window partitioned by language sorts each
      language in ONE task — the audit/small-scale path.
    * ``exact=False`` — the 100 TB path: per-language approximate
      quantile cutoffs (``percentile_approx``, one hash aggregate, |langs|
      rows broadcast back) and a cutoff compare per document.  Two
      scans, no per-language global sort, skew-immune; bucket boundaries
      are approximate, which CCNet-style selection tolerates by design.

    Docs with NULL text or < 2 tokens have no LM score and are absent
    (``ngram_lm_scores`` contract).  ``ppl`` ties break on doc_id, so the
    exact mode is fully deterministic.  Returns (doc_id, lang, ppl,
    ppl_bucket 1..buckets; 1 = head/lowest perplexity).
    """
    from pyspark.sql import Window

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    scores = ngram_lm_scores(docs, k_smooth=k_smooth, text_col=text_col)
    joined = scores.join(docs.select("doc_id", lang_col), "doc_id")
    if exact:
        w = Window.partitionBy(lang_col).orderBy("ppl", "doc_id")
        return joined.select(
            "doc_id", lang_col, "ppl",
            F.ntile(buckets).over(w).alias("ppl_bucket"),
        )
    probs = [i / buckets for i in range(1, buckets)]
    cuts = joined.groupBy(lang_col).agg(
        F.percentile_approx("ppl", probs, 10000).alias("__cuts")
    )
    b = F.lit(buckets)
    # bucket = 1 + number of cutoffs strictly below ppl (approximate rank)
    bucket = F.lit(1) + F.size(
        F.filter(F.col("__cuts"), lambda c: c < F.col("ppl"))
    )
    return joined.join(F.broadcast(cuts), lang_col).select(
        "doc_id", lang_col, "ppl", F.least(bucket, b).alias("ppl_bucket")
    )


# The classic UTF-8-bytes-read-as-cp1252 double encodings (public
# knowledge — the repair ftfy calls "mojibake"; table limited to
# unambiguous, reversible pairs: 3-char punctuation sequences first so the
# 2-char accent rules never split them).  U+201D (") is excluded — its
# middle byte 0x9D is undefined in cp1252, so that corruption never
# round-trips as text.
MOJIBAKE_REPAIRS: list[tuple[str, str]] = [
    ("â€™", "’"), ("â€œ", "“"), ("â€“", "–"), ("â€”", "—"), ("â€¦", "…"),
    ("Ã©", "é"), ("Ã¨", "è"), ("Ã¡", "á"), ("Ã³", "ó"), ("Ã±", "ñ"),
    ("Ã¼", "ü"), ("Ã¶", "ö"), ("Ã¤", "ä"), ("Ã§", "ç"), ("Ãº", "ú"),
    ("Ã\u00a0", "à"),  # à = 0xE0 → "Ã" + NBSP (0xA0): the second char is
    # a real non-breaking space, unambiguous as a 2-char literal
    ("Â«", "«"), ("Â»", "»"), ("Â°", "°"),
]


def fix_mojibake(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repair the most common web-corpus encoding corruption — UTF-8 text
    that was decoded as cp1252/Latin-1 somewhere in the crawl chain
    ("cafÃ©" for "café", "donâ€™t" for "don’t").  A real Common-Crawl
    pipeline runs this before every text analysis; language-ID and
    quality scoring both mis-fire on mojibake.

    Deterministic ordered literal-replace chain over
    :data:`MOJIBAKE_REPAIRS` — pure Catalyst (`replace`, whole-stage
    codegen, no UDF), byte-replayable in ANSI SQL, map-only (zero
    shuffles at any scale).  Longer (3-char) corruptions are repaired
    before 2-char ones so overlapping prefixes never mis-split.  NULL
    text propagates NULL outputs (module NULL contract).

    Returns the input columns plus ``fixed_text``, ``changed`` (0/1 INT)
    and ``chars_fixed`` (BIGINT: character-count shrink — each repair
    collapses 2-3 chars to 1).
    """
    t = F.col(text_col)
    fixed = t
    for bad, good in MOJIBAKE_REPAIRS:
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    return docs.withColumns(
        {
            "fixed_text": fixed,
            "changed": F.when(t.isNull(), F.lit(None).cast("int"))
            .otherwise((F.length(t) != F.length(fixed)).cast("int")),
            "chars_fixed": (F.length(t) - F.length(fixed)).cast("long"),
        }
    )


def bpe_pair_stats(
    docs: DataFrame, top_n: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide adjacent-character-pair frequencies — the inner
    statistic of BPE tokenizer training (Sennrich et al. ACL'16: each
    merge step picks the most frequent adjacent symbol pair).  This is
    the first-merge-step pass at corpus scale: lowercase whitespace
    words, each word's adjacent char pairs weighted by the word's corpus
    frequency, global top-``top_n`` pairs by (count DESC, pair ASC) —
    the deterministic tie-break BPE training needs for reproducible
    vocabularies.

    Scale shape: one (word → count) hash aggregate first, so the
    per-character explode runs over DISTINCT words (vocabulary-bounded,
    Zipf-small — the same trick as ``ngram_lm_scores``'s count tables),
    then one (pair) hash aggregate and a TakeOrdered top-n.  No pairwise
    work; the explode factor is mean word length, applied to the
    vocabulary, not the corpus.  NULL/blank text contributes nothing.
    Returns (left_ch, right_ch, pair_count) — integer-exact.
    """
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    t = F.col(text_col)
    words = (
        docs.filter(t.isNotNull())
        .filter(F.length(F.trim(t)) > 0)
        .select(
            F.explode(F.split(F.trim(F.lower(t)), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        "w",
        "wc",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
    ).select(
        F.substring(F.col("w"), F.col("i"), 1).alias("left_ch"),
        F.substring(F.col("w"), F.col("i") + 1, 1).alias("right_ch"),
        "wc",
    )
    return (
        pairs.groupBy("left_ch", "right_ch")
        .agg(F.sum("wc").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_ch", "right_ch")
        .limit(top_n)
    )


def hash_features(
    docs: DataFrame, n_buckets: int = 1024, text_col: str = "text"
) -> DataFrame:
    """Hashing-trick bag-of-words features (public technique: Weinberger
    et al. ICML'09 feature hashing; fastText's input layer) — the sparse
    feature extraction a corpus-scale quality/topic classifier trains on
    without a driver-side vocabulary: token → md5 → bucket id, counted
    per document.

    The bucket id is the first FOUR md5 nibbles valued via the portable
    strpos alphabet (0..65535) mod ``n_buckets`` — integer-exact in any
    engine, no vocabulary artifact to ship, collisions are the accepted
    tradeoff of the technique.  Lowercase whitespace tokenization (corpus
    convention).  One explode + one (doc_id, bucket) hash aggregate —
    map-side combine collapses repeated tokens before the shuffle.  NULL
    or blank text yields no rows.  Returns (doc_id, bucket, cnt).
    """
    if not 2 <= n_buckets <= 65536:
        raise ValueError(
            f"n_buckets must be in [2, 65536] (four md5 nibbles), got {n_buckets}"
        )
    t = F.col(text_col)
    tok = (
        docs.filter(t.isNotNull())
        .filter(F.length(F.trim(t)) > 0)
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(t)), r"\s+")).alias("__w"),
        )
        .withColumn("__h", F.md5(F.col("__w")))
    )
    nib = lambda i: F.position(
        F.substring(F.col("__h"), i, 1), F.lit("0123456789abcdef")
    ) - 1
    bucket = (
        (nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)) % n_buckets
    ).cast("int")
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def blocklist_filter(
    docs: DataFrame, terms: list[str], text_col: str = "text"
) -> DataFrame:
    """Blocklist screening — the C4-style "bad words" filter (public
    technique: C4 removed any document containing a banned-word-list hit;
    Dolma/RefinedWeb run the same stage with curated lists): word-bounded,
    case-insensitive match of a fixed term list, with an explicit verdict
    and hit count so filtering stays auditable (the ``corpus_filter``
    convention — what was dropped, and why).

    The list is compiled into ONE alternation regex (longest-first so
    multi-word terms win over their prefixes) — a single map-only
    ``regexp_extract_all`` pass, whole-stage codegen, zero shuffles at
    any corpus size; the term list is query-shipped, never joined.
    Terms are regex-escaped; word-boundary anchored.  NULL text
    propagates NULL verdicts (module NULL contract).  Returns the input
    key plus ``(block_hits, blocked)``.
    """
    import re as _re

    if not terms:
        raise ValueError("terms must name >= 1 blocklist entry")
    pat = (
        r"\b("
        + "|".join(
            _re.escape(t.lower())
            for t in sorted(set(terms), key=lambda t: (-len(t), t))
        )
        + r")\b"
    )
    t = F.col(text_col)
    hits = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(pat), F.lit(0))
    )
    return docs.select(
        "doc_id",
        F.when(t.isNull(), F.lit(None).cast("long"))
        .otherwise(hits)
        .cast("long")
        .alias("block_hits"),
        F.when(t.isNull(), F.lit(None).cast("int"))
        .otherwise((hits > 0).cast("int"))
        .alias("blocked"),
    )


def classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1024,
    bias_scaled: int = 0,
    threshold_scaled: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Linear text-classifier INFERENCE over hashing-trick features — the
    corpus-quality-filter production path (public technique: fastText's
    linear layer, Joulin et al. EACL'17; the model-based keep/drop stage
    of DCLM / FineWeb-Edu-style pipelines runs exactly this shape at
    corpus scale: score every document with a small linear model, keep
    above threshold).

    ``weights`` is a small table ``(bucket, w_scaled)`` of INTEGER-scaled
    weights (train offline, scale by e.g. 1000, ship the table —
    no float model artifact).  The logit is then pure int64:
    ``logit_scaled = bias_scaled + Σ cnt · w_scaled`` — every aggregation
    an integer sum, order-independent, bit-identical in any engine (the
    repo's scaled-int convention), so inference is exactly auditable and
    SQL-replayable.  ``score`` divides by 1000 only for display.

    Scale shape: feature extraction is :func:`hash_features` (one explode
    + one combine-collapsed hash agg); the model join BROADCASTS the
    weight table (≤ 65536 rows by construction — never a shuffle); one
    integer-sum agg per doc_id; docs with NULL/blank text (no features)
    come back via a left join with the bias-only logit, keeping the
    verdict total over the corpus (the ``corpus_filter`` auditability
    convention).  Returns ``(doc_id, logit_scaled, score, keep)``.
    """
    from pyspark.sql.functions import broadcast

    feats = hash_features(docs, n_buckets=n_buckets, text_col=text_col)
    dots = (
        feats.join(broadcast(weights.select("bucket", "w_scaled")), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("w_scaled")).alias("__dot"))
    )
    logit = (F.lit(int(bias_scaled)) + F.coalesce(F.col("__dot"), F.lit(0))).cast(
        "long"
    )
    return (
        docs.select("doc_id")
        .join(dots, "doc_id", "left")
        .select(
            "doc_id",
            logit.alias("logit_scaled"),
            F.round(logit / F.lit(1000.0), 6).alias("score"),
            (logit >= F.lit(int(threshold_scaled))).alias("keep"),
        )
    )


def perceptron_train(
    docs: DataFrame,
    labels: DataFrame,
    n_buckets: int = 1024,
    rounds: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Distributed batch-perceptron TRAINING over hashing-trick features —
    the in-engine counterpart to :func:`classifier_scores` inference
    (public technique: Rosenblatt 1958 perceptron; the batch variant sums
    the classic per-mistake update over all currently-misclassified
    examples each round, lr = 1).  Every quantity is an exact int64 —
    feature counts, margins, weight deltas — so training is
    order-independent, bit-identical in any engine, and SQL-replayable
    round by round: the repo's scaled-int convention applied to LEARNING,
    not just inference.

    ``labels`` is ``(doc_id, y)`` with y ∈ {-1, +1}.  The bias is bucket
    −1 with an implicit always-on feature (cnt = 1 appended per labeled
    doc), so the whole round — margin, mistake set, update — is one
    declarative plan with ZERO driver-side actions or scalar collects.

        margin(d) = Σ_b cnt(d,b)·w(b)      (bias row included)
        mistakes  = {d : y(d)·margin(d) ≤ 0}
        w(b)     += Σ_{d ∈ mistakes} y(d)·cnt(d,b)

    Convergence contract (Novikoff): on LINEARLY SEPARABLE labels the
    mistake set empties and weights become stationary (pinned in the
    idempotence test; demonstrated in examples/quality_classifier.py).
    On non-separable labels the full-batch lr=1 update can oscillate
    between all-positive and all-negative predictions — measured on this
    repo's synthetic lang labels — so gate deployment on a mistake-count
    trend, or use the heuristic/LSH quality stack for fuzzy targets.

    Scale shape per round: one broadcast-able weight join (≤ n_buckets+1
    rows, enforced ≤ 65536), one doc-keyed margin agg, one bucket-keyed
    delta agg, one tiny full-outer weight merge — the only data-sized
    shuffles are doc/bucket hash aggs with map-side combine; lineage
    truncated per round.  Returns the trained ``(bucket, w)`` table
    (zero weights dropped; bucket −1 = bias) — feed it to
    ``classifier_scores(weights=...)`` as-is.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from pyspark.sql.functions import broadcast

    from pregel_rs_spark.pregel import truncate_plan

    feats = hash_features(docs, n_buckets=n_buckets, text_col=text_col).unionByName(
        labels.select(
            "doc_id",
            F.lit(-1).cast("int").alias("bucket"),
            F.lit(1).cast("long").alias("cnt"),
        )
    )
    spark = docs.sparkSession
    w = spark.createDataFrame([], "bucket int, w long")
    y = labels.select("doc_id", F.col("y").cast("long").alias("y"))
    for _ in range(rounds):
        margin = (
            feats.join(broadcast(w), "bucket", "left")
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0))).alias(
                    "margin"
                )
            )
        )
        mis = (
            y.join(margin, "doc_id", "left")
            .select(
                "doc_id", "y", F.coalesce("margin", F.lit(0)).alias("margin")
            )
            .filter(F.col("y") * F.col("margin") <= 0)
        )
        delta = (
            mis.join(feats, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("cnt")).alias("dw"))
        )
        w = truncate_plan(
            w.join(delta, "bucket", "full")
            .select(
                "bucket",
                (
                    F.coalesce(F.col("w"), F.lit(0))
                    + F.coalesce(F.col("dw"), F.lit(0))
                ).alias("w"),
            )
            .filter(F.col("w") != 0)
        )
    return w


def bpe_train(
    docs: DataFrame, merges: int = 3, text_col: str = "text"
) -> DataFrame:
    """TRUE iterative BPE tokenizer training (Sennrich et al. ACL'16) at
    corpus scale — not just the first-step pair statistic
    (:func:`bpe_pair_stats`) but the real loop: segment the vocabulary
    into symbols, count corpus-weighted adjacent SYMBOL pairs, merge the
    most frequent pair everywhere (non-overlapping, left-to-right — the
    BPE contract), recount, repeat ``merges`` times.
    Tie-break (count DESC, left ASC, right ASC) makes the learned
    vocabulary reproducible — and the whole loop is engine-exact: every
    count is an int64, every merge a deterministic symbol-array scan, so
    a SQL oracle replays training step for step.

    Merge application is a left-to-right SCAN over WHOLE symbols (an
    ``F.aggregate`` fold over the split array), NOT a substring replace
    of ``left+SEP+right`` on the delimited string: an unanchored replace
    can match across symbol boundaries — after learning (l,o), applying
    a later winner (o,w) to the segmentation ``lo·w`` would falsely fuse
    it into ``low`` (the left symbol's suffix ``o`` completes the
    pattern), silently corrupting later rounds' pair statistics.  The
    fold merges ``(left,right)`` only when ``left`` is exactly the
    previous WHOLE symbol; greedy non-overlap falls out of the fold
    because a just-merged accumulator tail ``left+right`` can never
    equal ``left`` again (symbols are non-empty).

    Scale shape per merge: pair stats run over the DISTINCT-WORD
    vocabulary weighted by word counts (Zipf-bounded, the
    ``bpe_pair_stats`` trick — the corpus is touched once for the word
    counts), one (pair) hash agg, a 1-row TakeOrdered winner broadcast
    into a map-only replace.  Words are delimited with chr(31) (unit
    separator); words containing it are dropped on both engines.

    Returns the learned merge table ``(step, left, right, pair_count)``,
    one row per merge, step 1..``merges``.
    """
    if merges < 1:
        raise ValueError(f"merges must be >= 1, got {merges}")
    SEP = "\x1f"
    t = F.col(text_col)
    vocab = (
        docs.filter(t.isNotNull())
        .filter(F.length(F.trim(t)) > 0)
        .select(F.explode(F.split(F.trim(F.lower(t)), r"\s+")).alias("w"))
        .filter((F.col("w") != "") & (~F.col("w").contains(SEP)))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .select(
            F.regexp_replace(F.col("w"), "(.)", "$1" + SEP).alias("s"),
            "wc",
        )
        .select(F.expr(f"rtrim('{SEP}', s)").alias("s"), "wc")
    )
    spark = docs.sparkSession
    learned = spark.createDataFrame(
        [], "step int, left string, right string, pair_count long"
    )
    for step in range(1, merges + 1):
        syms = vocab.select("wc", F.split("s", SEP).alias("a")).filter(
            F.size("a") >= 2
        )
        pairs = syms.select(
            "wc",
            F.explode(F.sequence(F.lit(0), F.size("a") - 2)).alias("i"),
            "a",
        ).select(
            F.col("a")[F.col("i")].alias("left"),
            F.col("a")[F.col("i") + 1].alias("right"),
            "wc",
        )
        best = (
            pairs.groupBy("left", "right")
            .agg(F.sum("wc").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
        )
        learned = learned.unionByName(
            best.select(
                F.lit(step).alias("step"), "left", "right", "pair_count"
            )
        )
        # Left-to-right whole-symbol scan (see docstring): fold the symbol
        # array with a string accumulator; merge only when the previous
        # WHOLE symbol equals `left` and the current one equals `right`.
        def _scan_step(acc, x):
            # rp = distance of the last SEP from the end (0 = none)
            rp = F.locate(SEP, F.reverse(acc))
            last_sym = F.when(rp == 0, acc).otherwise(
                acc.substr(F.length(acc) - rp + F.lit(2), F.length(acc))
            )
            prefix = F.when(rp == 0, F.lit("")).otherwise(
                acc.substr(F.lit(1), F.length(acc) - rp + F.lit(1))
            )
            return F.when(
                acc == "", x  # fold start: first symbol seeds the string
            ).otherwise(
                F.when(
                    (x == F.col("right")) & (last_sym == F.col("left")),
                    F.concat(prefix, F.col("left"), F.col("right")),
                ).otherwise(F.concat(acc, F.lit(SEP), x))
            )

        vocab = vocab.crossJoin(F.broadcast(best)).select(
            F.aggregate(
                F.split("s", SEP), F.lit(""), _scan_step
            ).alias("s"),
            "wc",
        )
    return learned


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    SIGMOD'03 — the MOSS algorithm, public literature): normalize text
    (lowercase, alphanumerics only), hash every k-gram, slide a
    ``window``-wide window over the hash sequence and keep the MINIMUM
    hash per window (ties → RIGHTMOST position, the paper's rule), then
    de-duplicate selections.  Guarantees every shared substring of
    length ≥ k + window − 1 yields at least one shared fingerprint —
    the local, position-robust near-dup/plagiarism signature that
    whole-doc hashing and fixed-stride shingling both miss.

    Everything is engine-exact: the k-gram hash is the first 8 md5
    nibbles (32-bit, strpos arithmetic) and the tie-break rides ONE
    integer window-min — combined = h·2²¹ + (2²¹−1−pos), so min(combined)
    is (min h, max pos); h and pos decode back by DIV/MOD.  Documents
    are capped at 2²¹−1 normalized chars (the encoding bound; longer
    docs raise no error — grams beyond the cap are simply absent, the
    documented contract).

    Scale shape: one map-only normalize + per-doc position explode
    (explode factor = normalized length), one doc-keyed window pass
    (the per-doc sort a fingerprinting pass needs anyway), one distinct
    — no joins, nothing pairwise.  Docs with fewer than ``window``
    k-grams yield no fingerprints (strict winnowing).  Returns
    ``(doc_id, pos, gram_hash)``, pos 1-based over normalized text.
    """
    if k < 1 or window < 1:
        raise ValueError(f"need k >= 1 and window >= 1, got k={k}, w={window}")
    from pyspark.sql import Window as W

    POS_BITS = 21
    POS_CAP = (1 << POS_BITS) - 1
    t = F.col(text_col)
    norm = docs.filter(t.isNotNull()).select(
        "doc_id",
        F.regexp_replace(F.lower(t), "[^a-z0-9]", "").alias("s"),
    ).filter(F.length("s") >= k)
    grams = norm.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.length("s") - k + 1, F.lit(POS_CAP)),
            )
        ).alias("pos"),
        "s",
    ).select(
        "doc_id",
        "pos",
        F.md5(F.expr(f"substring(s, pos, {k})")).alias("h8"),
    )
    nib = lambda i: (
        F.position(F.substring(F.col("h8"), i, 1), F.lit("0123456789abcdef"))
        - 1
    ).cast("long")
    h = None
    for i in range(1, 9):
        term = nib(i) * F.lit(1 << (4 * (8 - i)))
        h = term if h is None else h + term
    hashed = grams.select(
        "doc_id",
        "pos",
        (
            h * F.lit(1 << POS_BITS)
            + (F.lit(POS_CAP) - F.col("pos"))
        ).alias("combined"),
    )
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    n_win = W.partitionBy("doc_id")
    sel = (
        hashed.withColumn("wmin", F.min("combined").over(win))
        .withColumn("maxpos", F.max("pos").over(n_win))
        # a window starting at pos exists only if pos + window - 1 grams fit
        .filter(F.col("pos") <= F.col("maxpos") - (window - 1))
        .select("doc_id", F.col("wmin").alias("combined"))
        .distinct()
    )
    return sel.select(
        "doc_id",
        (F.lit(POS_CAP) - F.col("combined") % F.lit(1 << POS_BITS)).alias(
            "pos"
        ),
        F.expr(f"CAST(combined DIV {1 << POS_BITS} AS BIGINT)").alias(
            "gram_hash"
        ),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    max_df: int = 50,
    min_shared: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Pairwise document overlap via shared winnowing fingerprints — the
    plagiarism / near-dup path LOCAL fingerprints enable that whole-doc
    MinHash misses: two documents sharing any run of ≥ k + window − 1
    normalized chars share a fingerprint (the winnowing guarantee), so
    overlap localizes to copied PASSAGES, not global similarity.

    Candidates come from a fingerprint-hash equi-join — the same
    bucket-join discipline as ``lsh_candidate_pairs``, with the analogous
    web-scale guard: fingerprints present in more than ``max_df``
    documents (boilerplate passages) are dropped before the join, so a
    shared footer never drives O(d²) pair fan-out.  Pairs must share
    ≥ ``min_shared`` distinct fingerprints.

    Scale shape: :func:`winnow_fingerprints` (map + one doc-keyed window)
    → per-(doc, hash) distinct → df-filter hash agg → one hash-keyed
    self equi-join → one pair agg.  Returns ``(doc_a, doc_b, shared,
    overlap_a, overlap_b)`` with doc_a < doc_b — overlap_x = shared /
    |fingerprints(x)|, rounded 6 dp (containment, both directions, so a
    snippet inside a large doc still scores high on its own side).
    """
    fps = (
        winnow_fingerprints(docs, k=k, window=window, text_col=text_col)
        .select("doc_id", "gram_hash")
        .distinct()
    )
    df_ok = (
        fps.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("gram_hash")
    )
    kept = fps.join(df_ok, "gram_hash")
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "gram_hash")
    b = kept.select(F.col("doc_id").alias("doc_b"), "gram_hash")
    pairs = (
        a.join(b, "gram_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("__na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("__nb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(F.col("shared") / F.col("__na"), 6).alias("overlap_a"),
            F.round(F.col("shared") / F.col("__nb"), 6).alias("overlap_b"),
        )
    )
