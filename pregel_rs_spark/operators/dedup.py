"""Deduplication operators over a ``documents(doc_id, text, lang, source,
n_chars)`` table.

Design constraints:
  * everything is expressed in built-in ``pyspark.sql.functions`` (JVM-side,
    whole-stage-codegen) — no Python in the hot path;
  * hash primitives are **md5** (identical output in Spark and DuckDB/ANSI
    engines) so every operator has an exact SQL oracle;
  * pairwise work is always blocked/bucketed first (LSH bands, lang blocks)
    — never an unconstrained O(n²) cross join — and candidate pairs are
    canonicalized ``a < b`` so each pair is produced once.

Scale notes (100 TB corpus):
  * exact dedup is one hash-shuffle on a 32-byte key — AQE-coalesced;
  * MinHash signatures are computed by explode → groupBy(doc, seed) min —
    the explode factor is ~n_chars per doc, so at full scale feed it the
    shingle *set* (distinct) and cap document length upstream;
  * LSH band buckets are the join key — band width controls the candidate
    count; hot buckets (boilerplate docs) are capped with a per-bucket
    ``row_number() <= max_bucket`` guard to bound the quadratic blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --- exact -------------------------------------------------------------------

def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5(text): one row per distinct content,
    ``(content_hash, keep_id, dup_count)`` with keep = min doc_id."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def dedup_exact_survivors(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Documents surviving exact dedup (min doc_id per content hash)."""
    keep = dedup_exact(docs, text_col).select(F.col("keep_id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi")


# --- shingles / n-grams ------------------------------------------------------

def char_shingles(docs: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """Distinct k-character shingles per document: ``(doc_id, shingle)``.

    ``explode(sequence(1, n-k+1)) → substring`` — pure Catalyst, no UDF.
    """
    n = F.length(F.col(text_col))
    return (
        docs.select("doc_id", text_col)
        .filter(n >= k)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), n - k + 1)).alias("pos"),
            F.col(text_col),
        )
        .select(
            "doc_id",
            F.col(text_col).substr(F.col("pos"), F.lit(k)).alias("shingle"),
        )
        .distinct()
    )


# --- MinHash + LSH -----------------------------------------------------------

def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """Portable MinHash: hash_i(s) = md5(i || '|' || s); the signature
    component is the lexicographic MIN of the hex digest per (doc, seed).

    A uniform hash's minimum under lexicographic order on hex is a valid
    min-hash; using md5 keeps Spark and the SQL oracle bit-identical.
    Returns ``(doc_id, seed, minhash)``.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        shingles.select("doc_id", "shingle", seeds)
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_band_index(
    docs: DataFrame,
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 50,
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """The persisted LSH index artifact ``(doc_id, band, bucket)`` —
    shingle → minhash → band signature re-hashed to a bucket key, hot
    buckets capped at ``max_bucket`` rows (row_number by doc_id ASC, so
    the cap is deterministic).  At production scale this table is
    written ONCE per corpus (write-time indexing, like the IVF cell
    assignment) and every later dedup pass — batch self-join
    (:func:`lsh_candidate_pairs`) or snapshot screening
    (:func:`incremental_dedup`) — joins against it instead of
    re-shingling the corpus.
    """
    rows_per_band = num_hashes // bands
    if shingles is None:
        shingles = char_shingles(docs, k, text_col)
    sig = minhash_signatures(shingles, num_hashes)
    band = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list("minhash")))).alias("bucket"))
    )
    w = Window.partitionBy("band", "bucket").orderBy("doc_id")
    return (
        band.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_bucket)
        .select("doc_id", "band", "bucket")
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 50,
    text_col: str = "text",
    new_index: DataFrame | None = None,
) -> DataFrame:
    """Dedup-at-ingest: screen a NEW crawl snapshot against an EXISTING
    corpus's persisted LSH index (:func:`lsh_band_index` output) without
    touching the corpus text — the incremental production shape (each
    snapshot is banded once, then joined against the standing index; the
    corpus is never re-shingled).

    A new doc is **rejected** when any of its band buckets collides with
    a corpus doc (``old_candidates``) or with a LOWER-doc_id doc of the
    same snapshot (``new_candidates`` — first-occurrence-wins within the
    batch, the :func:`dedup_exact` convention).  Blank/NULL-text docs
    have no shingles, hence no buckets, and are admitted with zero
    candidates (quality filters own them downstream); the verdict table
    covers EVERY new doc (``corpus_filter`` auditability convention).

    LSH collision is a candidate signal, not proof — pipe rejected docs
    through :func:`lsh_jaccard_rerank`-style exact verification when the
    false-positive cost matters.  Scale shape: one band build over the
    snapshot (shuffle keyed by (band, bucket)), two bucket equi-joins
    against capped indexes (hot buckets bounded by ``max_bucket``² per
    side), one per-doc count agg — no corpus-sized pairwise work.

    ``new_index`` lets a caller that already banded the snapshot (e.g.
    the streaming sink, which also folds the admitted bands into the
    standing index) pass the :func:`lsh_band_index` output in instead of
    paying the shingle pass twice.

    Returns ``(doc_id, old_candidates, new_candidates, admit)``.
    """
    new_idx = (
        new_index
        if new_index is not None
        else lsh_band_index(
            new_docs, k, num_hashes, bands, max_bucket, text_col
        )
    )
    old_hits = (
        new_idx.join(
            corpus_index.select(
                "band", "bucket", F.col("doc_id").alias("__old")
            ),
            ["band", "bucket"],
        )
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("__old")).alias("old_candidates"))
    )
    new_hits = (
        new_idx.join(
            new_idx.select(
                "band", "bucket", F.col("doc_id").alias("__peer")
            ),
            ["band", "bucket"],
        )
        .filter(F.col("__peer") < F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("__peer")).alias("new_candidates"))
    )
    return (
        new_docs.select("doc_id")
        .join(old_hits, "doc_id", "left")
        .join(new_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("old_candidates", F.lit(0)).alias("old_candidates"),
            F.coalesce("new_candidates", F.lit(0)).alias("new_candidates"),
            (
                F.coalesce("old_candidates", F.lit(0))
                + F.coalesce("new_candidates", F.lit(0))
                == 0
            ).alias("admit"),
        )
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 50,
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs ``(doc_a, doc_b)`` with doc_a < doc_b.

    shingle → minhash → band (num_hashes/bands rows per band, concatenated
    and re-hashed to a bucket key) → self-join on the bucket.  ``max_bucket``
    caps pathological buckets (boilerplate) to bound the quadratic join.
    ``shingles`` lets a caller that already materialized
    :func:`char_shingles` (e.g. :func:`lsh_jaccard_rerank`, which also
    needs them for the exact intersection) pass them in instead of paying
    the explode+distinct again.
    """
    band = lsh_band_index(
        docs, k, num_hashes, bands, max_bucket, text_col, shingles
    )
    a = band.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    b = band.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _ngram_pair_intersections(
    docs: DataFrame,
    k: int,
    block_cols: tuple[str, ...],
    text_col: str,
    max_df: int | None,
) -> DataFrame:
    """Shared exact-intersection pipeline for the k-gram pair scorers
    (:func:`ngram_jaccard_pairs`, :func:`ngram_containment_pairs`):
    candidate pairs from a same-block shingle equi-join — with ``max_df``
    set, candidates come only from shingles whose per-block document
    frequency is ≤ max_df (prefix filtering: per-shingle join fan-out
    bounded by max_df², never O(d²) on boilerplate), and the exact
    |A∩B| is then re-computed over the candidates' FULL shingle sets.

    Returns ``(doc_a, doc_b, inter, sz_a, sz_b)`` with doc_a < doc_b.
    """
    sh = char_shingles(docs, k, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    blocks = docs.select("doc_id", *block_cols)
    sh = sh.join(blocks, "doc_id")
    cand_sh = sh
    if max_df is not None:
        rare = (
            sh.groupBy("shingle", *block_cols)
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle", *block_cols)
        )
        cand_sh = sh.join(rare, ["shingle", *block_cols])
    left = cand_sh.select(
        F.col("doc_id").alias("doc_a"), "shingle", *[F.col(c) for c in block_cols]
    )
    right = cand_sh.select(
        F.col("doc_id").alias("doc_b"), "shingle", *[F.col(c).alias(f"__r_{c}") for c in block_cols]
    )
    cond = [left["shingle"] == right["shingle"]] + [
        left[c] == right[f"__r_{c}"] for c in block_cols
    ]
    if max_df is None:
        inter = (
            left.join(right, cond)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        cand = (
            left.join(right, cond)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        # exact |A∩B| over full shingle sets, routed through the bounded
        # candidate list: (pair × shingles(doc_a)) ⋈ shingles(doc_b)
        sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            cand.join(sh_a, "doc_a")
            .join(sh_b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return inter.join(sa, "doc_a").join(sb, "doc_b")


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 5,
    threshold: float = 0.7,
    block_cols: tuple[str, ...] = ("lang",),
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact k-gram Jaccard ≥ threshold, blocked by
    ``block_cols`` (same-language comparison only by default).

    |A∩B| via shingle equi-join, |A∪B| = |A|+|B|−|A∩B|.  Returns
    ``(doc_a, doc_b, jaccard)``, doc_a < doc_b.

    ``max_df`` is the web-scale guard (document-frequency filtering, the
    standard prefix-filter idea): without it, a boilerplate shingle present
    in d same-block documents contributes O(d²) equi-join rows — unbounded
    pairwise work at corpus scale.  With ``max_df`` set, CANDIDATE pairs
    are generated only from shingles whose per-block document frequency is
    ≤ max_df (per-shingle join fan-out bounded by max_df²), and the exact
    intersection is then re-computed over the candidates' FULL shingle
    sets — one row per (candidate pair, shared shingle), linear in
    candidate count × doc length, never doc×doc.  Jaccard values are
    exact; the only semantic difference is recall: a pair whose EVERY
    shared shingle sits in > max_df documents (pure-boilerplate overlap)
    is not emitted.
    """
    return (
        _ngram_pair_intersections(docs, k, block_cols, text_col, max_df)
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_containment_pairs(
    docs: DataFrame,
    k: int = 5,
    threshold: float = 0.7,
    block_cols: tuple[str, ...] = ("lang",),
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact k-gram CONTAINMENT (Broder 1997's
    containment measure; the RefinedWeb/Gopher dedup stack uses it beside
    Jaccard): C(A→B) = |A∩B| / |A| — the asymmetric score that catches a
    small document pasted inside a larger one, which symmetric Jaccard
    dilutes toward 0 as the size ratio grows.  A pair is emitted when
    EITHER direction reaches ``threshold``.

    Same candidate pipeline and ``max_df`` prefix-filter guard as
    :func:`ngram_jaccard_pairs` (shared :func:`_ngram_pair_intersections`)
    — bounded join fan-out, exact intersections over candidates only.

    Returns ``(doc_a, doc_b, cont_a_in_b, cont_b_in_a)``, doc_a < doc_b,
    scores rounded 6 dp.
    """
    pairs = _ngram_pair_intersections(docs, k, block_cols, text_col, max_df)
    c_ab = F.col("inter") / F.col("sz_a")
    c_ba = F.col("inter") / F.col("sz_b")
    return (
        pairs.filter(F.greatest(c_ab, c_ba) >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round(c_ab, 6).alias("cont_a_in_b"),
            F.round(c_ba, 6).alias("cont_b_in_a"),
        )
    )


def lsh_jaccard_rerank(
    docs: DataFrame,
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 50,
    threshold: float = 0.4,
    text_col: str = "text",
    shingle_storage: "StorageLevel | None" = None,
    unpersist_handle: "list | None" = None,
) -> DataFrame:
    """Exact k-gram Jaccard computed ONLY on MinHash-LSH candidate pairs —
    the web-scale route to exact-Jaccard dedup (candidate generation is
    bucketed and capped; the expensive exact intersection touches candidate
    pairs, never doc×doc).

    This is the composition ``lsh_candidate_pairs → full-shingle-set
    intersection → |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold``.  Versus
    ``ngram_jaccard_pairs``: recall is bounded by the LSH band collision
    probability (1−(1−j^r)^b) instead of the max_df prefix filter, and the
    per-pair Jaccard values that ARE emitted are exact and identical.

    Scale shape: shingles are computed ONCE, cached, and reused by all
    four consumers (the MinHash signature, the size table, and both sides
    of the intersection join) — without the cache Spark re-runs the
    explode+distinct per subtree (no ReusedExchange across differing
    projections), a measured ~1.9× wall cost at sf0.1.  The cache is
    O(corpus shingles) — at 100 TB that is a real storage budget, so it
    is caller-controllable: ``shingle_storage`` sets the StorageLevel
    (default ``MEMORY_AND_DISK`` — LRU-evictable and spillable; pass
    ``StorageLevel.DISK_ONLY`` to keep executor memory for the joins),
    and passing a list as ``unpersist_handle`` appends the cached
    shingle DataFrame so loop callers can ``.unpersist()`` it as soon as
    the returned frame is materialized instead of waiting for LRU
    eviction.  The intersection join fans out as (candidate pair ×
    |shingles(doc_a)|) ⋈ shingles(doc_b) — linear in candidate count ×
    doc length.

    Returns ``(doc_a, doc_b, jaccard)`` with doc_a < doc_b.
    """
    from pyspark import StorageLevel

    level = (
        shingle_storage
        if shingle_storage is not None
        else StorageLevel.MEMORY_AND_DISK
    )
    sh = char_shingles(docs, k, text_col).persist(level)
    if unpersist_handle is not None:
        unpersist_handle.append(sh)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    cand = lsh_candidate_pairs(
        docs, k=k, num_hashes=num_hashes, bands=bands,
        max_bucket=max_bucket, text_col=text_col, shingles=sh,
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --- SimHash -----------------------------------------------------------------

def _hex_nibble_value(col):
    """Portable hex-char → 0..15: strpos over a fixed alphabet (works
    identically in Spark and ANSI SQL — no conv())."""
    return F.position(col, F.lit("0123456789abcdef")) - 1


def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text") -> DataFrame:
    """16-bit SimHash over whitespace tokens, fully portable.

    token → md5 → first bits/4 hex chars → per-bit ±1 vote weighted by token
    multiplicity → sign → fingerprint int.  Near-dup docs land on close
    fingerprints; group by fingerprint for cheap candidate sets.
    Returns ``(doc_id, simhash)``.
    """
    nibbles = bits // 4
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    toks = toks.select("doc_id", F.md5("tok").alias("h"))
    # expand to (doc, bit, ±1): nibble n = hex[n], bit b of nibble = n*4+b
    expanded = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "h",
    ).select(
        "doc_id",
        "bit",
        (
            F.floor(
                _hex_nibble_value(
                    F.substring(F.col("h"), (F.col("bit") / 4).cast("int") + 1, 1)
                )
                / F.pow(F.lit(2.0), 3 - F.col("bit") % 4)
            ).cast("int")
            % 2
        ).alias("b"),
    )
    votes = expanded.groupBy("doc_id", "bit").agg(
        F.sum(F.col("b") * 2 - 1).alias("vote")
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("vote") > 0, F.pow(F.lit(2.0), F.col("bit")).cast("long"))
                .otherwise(F.lit(0))
            ).cast("long").alias("simhash")
        )
    )


def simhash_candidate_pairs(
    docs: DataFrame,
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``max_hamming``,
    found with banded blocking (Manku/Jain/Sarma, WWW'07 — the Google
    web-dedup construction; public literature, no reference counterpart).

    The ``bits``-bit fingerprint is split into ``bands`` contiguous bit
    bands; by pigeonhole, two fingerprints within Hamming distance
    ``bands − 1`` agree EXACTLY on at least one band, so candidates are
    generated by equi-joining on (band index, band value) — never all-pairs.
    With the defaults (4 bands, max_hamming 3) recall is exact: every
    qualifying pair collides in some band.  Hot bands (e.g. the all-zeros
    band of short docs) are capped at ``max_bucket`` rows, mirroring the
    LSH ``max_bucket`` / embedding ``max_block`` guards.

    Candidates are then exact-filtered with ``bit_count(a XOR b) ≤
    max_hamming``.  Returns ``(doc_a, doc_b, hamming)``, doc_a < doc_b.
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"banded blocking guarantees recall only for max_hamming <= "
            f"bands - 1, got max_hamming={max_hamming} bands={bands}"
        )
    if bits % bands != 0:
        # the pigeonhole argument needs the bands to PARTITION the bits —
        # a leftover high bit would be examined by no band, so two
        # fingerprints differing only there would never collide
        raise ValueError(
            f"bands must divide bits exactly, got bits={bits} bands={bands}"
        )
    band_bits = bits // bands
    fp = simhash(docs, bits=bits, text_col=text_col)
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        # (fp >> band*band_bits) & (2^band_bits - 1), written as portable
        # integer arithmetic (shift builtins take literal amounts; the
        # fingerprint is < 2^16 so the double division is exact)
        "band_val",
        F.floor(
            F.col("simhash") / F.pow(F.lit(2.0), F.col("band") * band_bits)
        ).cast("long")
        % (1 << band_bits),
    )
    w = Window.partitionBy("band", "band_val").orderBy("doc_id")
    banded = banded.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_bucket
    )
    a = banded.select(
        "band", "band_val",
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"),
    )
    b = banded.select(
        "band", "band_val",
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"),
    )
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --- embedding cosine near-dup ------------------------------------------------

def cosine_expr(a, b):
    """Cosine similarity of two float arrays, pure Catalyst
    (zip_with dot product / norms)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def embedding_cosine_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    max_block: int = 10_000,
) -> DataFrame:
    """Near-duplicate vector pairs with cosine ≥ threshold, blocked by
    ``block_col`` (an upstream coarse cluster id — at 100 TB that column
    comes from k-means/IVF assignment, here the dataset's label).

    ``max_block`` caps each block to its first ``max_block`` vectors by
    vec_id (same ``row_number() <= cap`` guard as the LSH bucket cap): one
    degenerate block — a boilerplate cluster, a catch-all label — would
    otherwise make the within-block self-join O(b²) with no bound.  Vectors
    beyond the cap are reported as dropped via the ``emb_cap_dropped``
    accumulator-free contract: callers needing exactness must re-block
    (finer ``block_col``) rather than raise the cap past memory.

    Returns ``(vec_a, vec_b, cosine)``, vec_a < vec_b.
    """
    capped = (
        emb.select(F.col(block_col).alias("blk"), "vec_id", "embedding")
        .withColumn("__rn__", F.row_number().over(Window.partitionBy("blk").orderBy("vec_id")))
        .filter(F.col("__rn__") <= max_block)
        .drop("__rn__")
    )
    a = capped.select(
        "blk", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = capped.select(
        "blk", F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine_expr(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


# --- end-to-end near-dup clustering -------------------------------------------

def dedup_clusters(
    docs: DataFrame,
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 50,
    text_col: str = "text",
    verify_threshold: float | None = None,
) -> DataFrame:
    """End-to-end near-duplicate deduplication — the production composition
    at corpus scale: banded-LSH candidate pairs (bucket-capped, never
    all-pairs) → connected components over the candidate-pair graph →
    cluster id = MIN doc_id in the cluster → survivor = that minimum.

    The component step uses the O(log n)-round large-star/small-star path
    (``connected_components_star``), so a boilerplate chain of near-dups
    thousands of docs long costs ~log rounds, not O(diameter) supersteps —
    at 100 TB the pair graph's diameter is unbounded (transitive chains of
    86%%-similar docs), which is exactly the case min-label cannot survive.

    ``verify_threshold`` inserts the exact-Jaccard verification stage
    between candidate generation and clustering
    (:func:`lsh_jaccard_rerank`): only candidate pairs whose TRUE k-gram
    Jaccard is ≥ the threshold become cluster edges.  Without it, banded
    LSH's false-positive pairs (per-band collision probability ≈ j^r)
    CHAIN under the transitive closure — on a homogeneous corpus a few
    percent pair-level FP rate is enough to fuse most of the corpus into
    one giant cluster (measured: 477/500 synthetic docs in one component
    unverified vs exact clusters at 0.4).  At 100 TB the verification is
    the standard MinHashLSH shape: exact intersection over candidates
    only, never doc×doc.

    Returns ``(doc_id, cluster_id, survivor)`` for EVERY input document
    (docs with no near-dup are their own singleton cluster, survivor=1).
    """
    from ..algorithms import connected_components
    from ..graphframe import GraphFrame

    if verify_threshold is None:
        pairs = lsh_candidate_pairs(
            docs, k, num_hashes, bands, max_bucket, text_col
        )
    else:
        pairs = lsh_jaccard_rerank(
            docs, k, num_hashes, bands, max_bucket,
            threshold=verify_threshold, text_col=text_col,
        )
    vertices = docs.select(F.col("doc_id").alias("vertex_id"))
    edges = pairs.select(
        F.col("doc_a").alias("subject"), F.col("doc_b").alias("object")
    )
    comp = connected_components(
        GraphFrame(vertices, edges, closed=True), method="star"
    )
    return comp.select(
        F.col("vertex_id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("vertex_id") == F.col("component")).cast("long").alias("survivor"),
    )


# --- exact duplicated spans (substring-level dedup) ---------------------------
def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-span detection at sub-document granularity — the
    signal behind suffix-array substring dedup (Lee et al., ACL'22,
    "Deduplicating Training Data Makes Language Models Better"): a span
    repeated verbatim across documents is memorization fuel even when
    the documents as wholes are not near-duplicates (quotes, boilerplate
    footers, syndicated fragments).

    The suffix-array machinery doesn't distribute; its *detector* does:
    every overlapping n-word window is keyed by ``md5(window)`` (one
    pure-Catalyst transform over the token array — split, slice,
    concat_ws — no Python, no shuffle), then one groupBy(hash) counts
    distinct documents and keeps hashes seen in ≥ ``min_docs`` docs.
    A span duplicated as a run of length L>n shows up as L−n+1 flagged
    windows, so callers recover maximal spans by merging adjacent
    ``start`` positions per doc.

    Scale: the exploded window table is ~tokens-per-doc rows per
    document (same order as the corpus token count); the only shuffle is
    the 32-byte-hash groupBy, map-side-combined.  NULL/short texts
    (< n tokens) contribute no windows.

    Returns ``(doc_id, start, gram_hash, n_docs)`` — start is the
    0-based token offset of the window; n_docs the number of distinct
    documents sharing it.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), r"\s+").alias("toks"),
    )
    # the CASE guard matters twice: sequence(0, negative) would generate a
    # DESCENDING index list for docs shorter than n tokens, and NULL text
    # (NULL toks) must contribute zero windows, not crash slice()
    wins = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(toks) >= {n} THEN"
                f" transform(sequence(0, size(toks) - {n}),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {n})))"
                f" ELSE array() END"
            )
        ).alias("start", "gram"),
    ).filter(F.col("gram").isNotNull()).select(
        "doc_id", F.col("start").cast("long").alias("start"),
        F.md5(F.col("gram")).alias("gram_hash"),
    )
    shared = (
        wins.groupBy("gram_hash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return wins.join(shared, "gram_hash").select(
        "doc_id", "start", "gram_hash", "n_docs"
    )


def duplicate_span_stats(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-window fraction over
    :func:`duplicate_ngram_spans` — the corpus-health rollup used to
    decide whether substring-level dedup is worth a pipeline stage:

        dup_ratio(d) = flagged n-gram windows / total n-gram windows

    Documents shorter than n tokens have no windows and report 0; NULL
    text propagates NULL (the module-wide NULL-text contract).  Returns
    ``(doc_id, n_windows, dup_windows, dup_ratio)`` with dup_ratio
    rounded to 6 dp (exact-integer division in double).
    """
    spans = duplicate_ngram_spans(
        docs, n=n, min_docs=min_docs, text_col=text_col, id_col=id_col
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dup_windows")
    )
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(
            F.col(text_col).isNull(), F.lit(None).cast("long")
        ).otherwise(
            F.greatest(
                F.size(F.split(F.col(text_col), r"\s+")) - (n - 1),
                F.lit(0),
            ).cast("long")
        ).alias("n_windows"),
    )
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_windows",
        F.when(F.col("n_windows").isNull(), F.lit(None).cast("long"))
        .otherwise(F.coalesce(F.col("dup_windows"), F.lit(0)))
        .alias("dup_windows"),
        F.when(F.col("n_windows") > 0,
               F.round(
                   F.coalesce(F.col("dup_windows"), F.lit(0))
                   / F.col("n_windows"), 6
               ))
        .when(F.col("n_windows") == 0, F.lit(0.0))
        .otherwise(F.lit(None).cast("double")).alias("dup_ratio"),
    )


def dedup_chunks(
    docs: DataFrame,
    chunk: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-level exact dedup with REMOVAL — the rewrite stage that
    :func:`duplicate_ngram_spans` is the detector for (Lee et al., ACL'22
    remove repeated substrings from the corpus, not just flag them; the
    chunk-hash formulation is the standard MapReduce-able approximation
    of their suffix-array dedup).  Documents are cut into DISJOINT
    ``chunk``-token pieces (the final piece may be shorter); every
    occurrence of a piece except the globally FIRST one — minimum
    ``(doc_id, chunk_idx)``, lexicographic, deterministic — is deleted,
    including repeats within a single document, and each document's text
    is rebuilt from its surviving pieces in order.

    Scale shape (100 TB): the chunk table is ~(tokens/chunk) rows per
    document — ``chunk``× SMALLER than the detector's overlapping-window
    table; the keeper table is one md5-keyed hash agg (map-side
    combined); the survive test is one equi-join where every occurrence
    matches exactly one keeper row (no fan-out even for a boilerplate
    chunk shared by millions of docs); the rebuild is one per-doc hash
    agg of a sorted struct array.  No windows, no pairwise work.

    Returns ``(doc_id, text_dedup, n_chunks, kept_chunks)``; NULL text
    propagates (NULL, NULL, NULL) per the module-wide NULL contract.  A
    document whose every chunk is removed rebuilds to the empty string.
    Tokenization is ``split(text, '\\s+')`` — byte-replayable in ANSI
    SQL, consistent with the detector.
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), r"\s+").alias("toks"),
    )
    pieces = toks.filter(F.col("toks").isNotNull()).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST((size(toks) - 1) / {chunk} AS INT)),"
                f" i -> concat_ws(' ', slice(toks, i * {chunk} + 1, {chunk})))"
            )
        ).alias("chunk_idx", "piece"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.md5("piece").alias("piece_hash"),
        "piece",
    )
    keepers = pieces.groupBy("piece_hash").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("keep")
    )
    kept = (
        pieces.join(keepers, "piece_hash")
        .filter(
            (F.col("doc_id") == F.col("keep.doc_id"))
            & (F.col("chunk_idx") == F.col("keep.chunk_idx"))
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(chunk_idx, piece))), x -> x.piece)"
                ),
                " ",
            ).alias("text_dedup"),
            F.count(F.lit(1)).alias("kept_chunks"),
        )
    )
    totals = toks.select(
        "doc_id",
        F.when(F.col("toks").isNull(), F.lit(None).cast("long"))
        .otherwise(
            F.expr(f"CAST((size(toks) - 1) / {chunk} AS BIGINT) + 1")
        )
        .alias("n_chunks"),
    )
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("n_chunks").isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce("text_dedup", F.lit("")))
        .alias("text_dedup"),
        "n_chunks",
        F.when(F.col("n_chunks").isNull(), F.lit(None).cast("long"))
        .otherwise(F.coalesce("kept_chunks", F.lit(0)))
        .alias("kept_chunks"),
    )


def semdedup(
    emb: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    max_block: int = 10_000,
) -> DataFrame:
    """SemDeDup — semantic deduplication of an embedding corpus (Abbas
    et al. 2023, arXiv:2303.09540 — public literature): k-means-cluster
    the embeddings, then look for near-duplicate pairs ONLY within each
    cluster (cosine ≥ ``threshold``), keeping the lowest vec_id of every
    duplicate pair — the published recipe for pruning semantically
    redundant web data before pretraining, and the composition this
    repo's pieces were built for (:func:`~pregel_rs_spark.operators.
    similarity.kmeans_assign` is the clustering stage,
    :func:`embedding_cosine_dups` the blocked pair stage).

    Scale shape: clustering is ``iters + 1`` corpus scans (broadcast
    centroids); the pair stage is the CLUSTER-blocked self-join — O(Σ
    b_i²) bounded by ``max_block``² per cluster instead of corpus² (at
    10^12 vectors you raise ``n_clusters`` so clusters fit the cap, the
    paper's own regime) — and the verdict is one anti-join-shaped left
    join keyed by vec_id.  Deterministic end to end: md5-seeded
    centroids, scaled-integer centroid sums, keep-lowest tie-break.

    Returns ``(vec_id, cluster_id, keep)`` — one auditable verdict row
    per input vector (the :func:`corpus_filter` convention).
    """
    from .similarity import kmeans_assign

    assign = kmeans_assign(emb, n_clusters=n_clusters, iters=iters)
    blocked = emb.select("vec_id", "embedding").join(
        assign.select("vec_id", "cluster_id"), "vec_id"
    )
    pairs = embedding_cosine_dups(
        blocked, threshold=threshold, block_col="cluster_id",
        max_block=max_block,
    )
    dropped = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    return (
        blocked.select("vec_id", "cluster_id")
        .join(dropped.withColumn("__d", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id", "cluster_id", F.col("__d").isNull().alias("keep")
        )
    )


def minhash_similar(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    k: int = 5,
    num_hashes: int = 8,
    max_key: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """MinHash similarity retrieval: for each query document, the
    ``top_k`` corpus documents by ESTIMATED Jaccard — the fraction of
    agreeing MinHash components (Broder 1997's resemblance estimator;
    public literature) — the third retrieval modality next to BM25
    (lexical) and embedding ANN (semantic): "find the near-duplicates
    of THIS document" without a pairwise scan.

    The corpus signature table (``minhash_signatures``, |corpus| ·
    num_hashes rows) is the write-time index; queries join it on the
    (seed, minhash) key, agreement counts become ĵ = matches /
    num_hashes, and a per-query window keeps ``top_k`` (ties: higher
    agreement first, then doc_id ASC — engine-portable total order).
    ``max_key`` caps each (seed, minhash) key's corpus posting list
    (row_number by doc_id — a minimum shared by half the corpus is
    boilerplate, not signal; same guard family as ``max_bucket``).
    Self-matches are excluded.  Returns ``(query_id, doc_id, matches,
    est_jaccard, rank)``; est_jaccard rounds to 6 dp.

    Scale shape: one signature build per side (or reuse the persisted
    index), one capped equi-join keyed by (seed, minhash), one
    (query, doc) count agg, one per-query window over ≤ num_hashes ·
    max_key candidate rows.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    sig = minhash_signatures(char_shingles(docs, k, text_col), num_hashes)
    wk = Window.partitionBy("seed", "minhash").orderBy("doc_id")
    sig_capped = (
        sig.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= max_key)
        .drop("__rn")
    )
    qsig = minhash_signatures(
        char_shingles(queries, k, text_col), num_hashes
    ).select(
        F.col("doc_id").alias("query_id"), "seed", "minhash"
    )
    agree = (
        qsig.join(sig_capped, ["seed", "minhash"])
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("matches"), F.asc("doc_id")
    )
    return (
        agree.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "doc_id",
            "matches",
            F.round(F.col("matches") / F.lit(num_hashes), 6).alias(
                "est_jaccard"
            ),
            "rank",
        )
    )


def _bloom_positions(key_col: str, m_bits: int, k_hashes: int):
    """k deterministic bit positions per key: the first 6 md5 nibbles of
    md5(i|key) valued 0..16^6-1, mod m_bits — engine-portable integer
    arithmetic (the hash_features nibble convention)."""
    cols = []
    for i in range(k_hashes):
        h = F.md5(F.concat_ws("|", F.lit(str(i)), F.col(key_col)))
        nib = lambda j: F.position(
            F.substring(h, j, 1), F.lit("0123456789abcdef")
        ) - 1
        v = (
            nib(1) * 1048576 + nib(2) * 65536 + nib(3) * 4096
            + nib(4) * 256 + nib(5) * 16 + nib(6)
        )
        cols.append((v % m_bits).cast("long"))
    return cols


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter over a key column as a TABLE of 32-bit words
    ``(word_idx, word)`` (Bloom 1970 — public literature): the
    memory-constant seen-set for crawl frontiers and content screens —
    at 10^12 URLs the exact seen-set is a 10-TB shuffle per probe batch,
    the Bloom table is ``m_bits/32`` rows broadcast once (FPR ≈
    ``(1 - e^{-k·n/m})^k``; size m to the expected key volume).

    Words are 32-bit (bit values < 2^31) so every mask is a positive
    int64 in ANY engine — no sign-bit portability trap at bit 63.  The
    build is one explode (k rows/key) + one ``bit_or`` hash aggregation;
    only set words are stored (absent word_idx ≡ 0).
    """
    if not 32 <= m_bits <= 1 << 24:
        raise ValueError(
            f"m_bits must be in [32, 2^24] (6 md5 nibbles), got {m_bits}"
        )
    if not 1 <= k_hashes <= 16:
        raise ValueError(f"k_hashes must be in [1, 16], got {k_hashes}")
    pos = _bloom_positions(key_col, m_bits, k_hashes)
    rows = keys.select(
        F.explode(F.array(*pos)).alias("__pos")
    )
    return (
        rows.select(
            (F.col("__pos") / 32).cast("long").alias("word_idx"),
            F.expr("CAST(pow(2, __pos % 32) AS BIGINT)").alias("__m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m").alias("word"))
    )


def bloom_screen(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Probe a :func:`bloom_build` filter: one verdict row per input row
    with ``maybe_seen`` — True means ALL k bits are set (key was
    inserted, OR a false positive at the filter's FPR; never a false
    negative), False proves the key was never inserted.  The production
    frontier rule: drop ``maybe_seen`` URLs (accepting the tiny FPR as
    lost recrawls) or route them to the exact check.

    Scale shape: one explode (k rows/key) + one BROADCAST join against
    the word table + one per-key count agg — the probe never shuffles
    the corpus on a 32-byte key the way exact dedup must.
    """
    pos = _bloom_positions(key_col, m_bits, k_hashes)
    probes = df.select(
        key_col, F.explode(F.array(*pos)).alias("__pos")
    ).select(
        key_col,
        (F.col("__pos") / 32).cast("long").alias("word_idx"),
        F.expr("CAST(pow(2, __pos % 32) AS BIGINT)").alias("__m"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            key_col,
            (
                F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("__m"))
                != 0
            ).cast("int").alias("__hit"),
        )
        .groupBy(key_col)
        .agg((F.sum("__hit") == k_hashes).alias("maybe_seen"))
    )
    return df.select(key_col).distinct().join(hits, key_col, "left")
