"""HTML → text and HTML → links extraction.

Per BASELINE.json ``input_hint``: the input is a table of Common-Crawl-style
pages ``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``; extraction must be **vectorized pandas/Arrow UDFs (no
per-row Python at the Spark boundary)** and the extracted text must be
**byte-identical per url** between the distributed run and a local
pure-Python reference — which is guaranteed here by construction: the
pandas UDFs call the exact same pure functions (`extract_text_bytes`,
`extract_links_py`) that the local reference path calls, and those functions
use only locale-independent byte/`str` operations (no pandas string methods,
no locale-aware case mapping).

Scale notes:
  * extraction is embarrassingly parallel — one Arrow batch at a time,
    no shuffle; Catalyst pushes the `html` column prune into the scan.
  * edge building hashes urls to stable 64-bit ids with ``F.xxhash64``
    (JVM-side, fixed seed 42) so downstream shuffles move longs, not urls.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# --- pure extraction (the byte-identity contract) ----------------------------

_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]*>")
# fixed, ordered entity map — deliberately tiny and explicit so the
# transformation is unambiguous and reproducible everywhere
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so "&amp;lt;" → "&lt;" (literal), not "<"
)

_HREF_RE = re.compile(rb"""href\s*=\s*["']([^"'<>\s]+)["']""", re.I)
_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "#")


def extract_text_bytes(html: bytes) -> str:
    """Pure-Python reference text extractor (deterministic, locale-free).

    comments → script/style blocks → tags stripped to spaces; utf-8 decode
    with replacement; fixed entity table; whitespace collapsed via
    ``" ".join(s.split())`` (ASCII+unicode whitespace, locale-independent).
    """
    if html is None:
        return ""
    h = _COMMENT_RE.sub(b" ", html)
    h = _SCRIPT_RE.sub(b" ", h)
    h = _TAG_RE.sub(b" ", h)
    s = h.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return " ".join(s.split())


def extract_links_py(html: bytes, base_url: str) -> list[str]:
    """Pure-Python reference link extractor: href attributes, resolved
    against the page url, fragments dropped, order preserved, de-duplicated.
    """
    if html is None:
        return []
    seen: set[str] = set()
    out: list[str] = []
    for m in _HREF_RE.finditer(html):
        href = m.group(1).decode("utf-8", errors="replace")
        if href.startswith(_SKIP_SCHEMES):
            continue
        absu = urljoin(base_url, href)
        absu = absu.split("#", 1)[0]
        if not absu.startswith(("http://", "https://")):
            continue
        if absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out


_A_TAG_RE = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*["']([^"'<>\s]+)["'][^>]*>(.*?)</a\s*>""",
    re.I | re.S,
)


def extract_anchors_py(html: bytes, base_url: str) -> list[tuple[str, str]]:
    """Pure-Python reference anchor extractor: ``(dst_url, anchor_text)``
    pairs with the SAME url resolution/filter rules as
    :func:`extract_links_py` (so dst_url sets agree), anchor text cleaned
    through :func:`extract_text_bytes` (tags stripped, entities mapped,
    whitespace collapsed).  First occurrence per dst_url wins — order
    preserved, deterministic."""
    if html is None:
        return []
    seen: set[str] = set()
    out: list[tuple[str, str]] = []
    for m in _A_TAG_RE.finditer(html):
        href = m.group(1).decode("utf-8", errors="replace")
        if href.startswith(_SKIP_SCHEMES):
            continue
        absu = urljoin(base_url, href)
        absu = absu.split("#", 1)[0]
        if not absu.startswith(("http://", "https://")):
            continue
        if absu not in seen:
            seen.add(absu)
            out.append((absu, extract_text_bytes(m.group(2))))
    return out


# --- Spark surface (vectorized pandas UDFs over Arrow batches) ---------------

@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_links_py(h, u) for h, u in zip(html, url)]
    )


@pandas_udf(ArrayType(StructType([
    StructField("dst_url", StringType()),
    StructField("anchor", StringType()),
])))
def extract_anchors_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_anchors_py(h, u) for h, u in zip(html, url)]
    )


def url_id(col) -> "F.Column":
    """Stable 64-bit vertex id for a url (JVM-side xxhash64, seed 42)."""
    return F.xxhash64(col)


def pages_to_edges(pages: DataFrame, closed_world: bool = True) -> DataFrame:
    """Build the link-graph edge table from a pages table.

    Returns ``(subject, object, src_url, dst_url)`` where subject/object are
    xxhash64 ids.  With ``closed_world=True`` only links whose target is
    itself a crawled page are kept (left-semi join against the page urls —
    keeps PageRank mass inside the corpus; the join broadcasts when the url
    set is small, SMJ otherwise).
    """
    links = pages.select(
        F.col("url").alias("src_url"),
        F.explode(extract_links_udf(F.col("html"), F.col("url"))).alias("dst_url"),
    ).filter(F.col("dst_url") != F.col("src_url"))
    if closed_world:
        urls = pages.select(F.col("url").alias("dst_url")).distinct()
        links = links.join(urls, "dst_url", "left_semi")
    return links.select(
        url_id(F.col("src_url")).alias("subject"),
        url_id(F.col("dst_url")).alias("object"),
        "src_url",
        "dst_url",
    )


def pages_to_vertices(pages: DataFrame) -> DataFrame:
    """Vertex table ``(vertex_id, url, lang)`` from pages (ids = xxhash64)."""
    return pages.select(
        url_id(F.col("url")).alias("vertex_id"),
        "url",
        "lang",
    ).distinct()


def pages_to_anchor_edges(pages: DataFrame, closed_world: bool = True) -> DataFrame:
    """Anchor-text edge table ``(subject, object, src_url, dst_url,
    anchor)`` — the link graph annotated with each link's first anchor
    text (the classic relevance signal: anchor text describes the TARGET
    page; used for query–document training pairs and snippet labels).

    Same closed-world semantics and xxhash64 ids as :func:`pages_to_edges`;
    the dst_url set per page is identical by construction (same resolution
    rules), only the anchor column is added.
    """
    links = pages.select(
        F.col("url").alias("src_url"),
        F.explode(
            extract_anchors_udf(F.col("html"), F.col("url"))
        ).alias("a"),
    ).select(
        "src_url",
        F.col("a.dst_url").alias("dst_url"),
        F.col("a.anchor").alias("anchor"),
    ).filter(F.col("dst_url") != F.col("src_url"))
    if closed_world:
        urls = pages.select(F.col("url").alias("dst_url")).distinct()
        links = links.join(urls, "dst_url", "left_semi")
    return links.select(
        url_id(F.col("src_url")).alias("subject"),
        url_id(F.col("dst_url")).alias("object"),
        "src_url",
        "dst_url",
        "anchor",
    )


def anchor_text_rollup(pages: DataFrame) -> DataFrame:
    """Per-target anchor-text aggregation ``(dst_url, anchor, n)`` — how
    many distinct source pages describe ``dst_url`` with each anchor
    string.  One hash aggregation over the anchor edges (map-side
    combined); the training-data view of "what the web calls this page"."""
    return (
        pages_to_anchor_edges(pages)
        .groupBy("dst_url", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- domain (host) rollups ---------------------------------------------------

# host part of an absolute url — a plain regexp (not parse_url) so the
# DuckDB oracle can compute the identical value with the same pattern
_DOMAIN_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def url_domain(col) -> "F.Column":
    """Host/domain of a url, empty string for non-absolute urls.

    Pure Catalyst (``regexp_extract``) — stays inside whole-stage codegen;
    the same pattern is portable to the SQL oracle side verbatim."""
    return F.regexp_extract(col, _DOMAIN_PATTERN, 1)


def domain_edges(pages: DataFrame, keep_intra: bool = False) -> DataFrame:
    """Host-level link graph: page links rolled up to
    ``(subject, object, src_domain, dst_domain, weight)``.

    ``weight`` counts DISTINCT page-level links between the two hosts (the
    standard host-graph construction for web-scale PageRank: ~3 orders of
    magnitude fewer vertices than the page graph, same mass flow shape).
    ``keep_intra=False`` drops same-host links — for host ranking they are
    self-loops that only dilute the random walk.

    Scale shape: the page-edge build is the dominant cost (pandas-UDF
    extraction, one semi-join); the rollup itself is a single hash
    aggregation on the (src_domain, dst_domain) pair, map-side combined —
    output cardinality is #host-pairs, tiny relative to #links.  Subject/
    object are xxhash64 ids of the DOMAIN strings, so the result plugs
    directly into GraphFrame/PageRank.
    """
    links = (
        pages_to_edges(pages)
        .select(
            url_domain(F.col("src_url")).alias("src_domain"),
            url_domain(F.col("dst_url")).alias("dst_domain"),
        )
    )
    if not keep_intra:
        links = links.filter(F.col("src_domain") != F.col("dst_domain"))
    return (
        links.groupBy("src_domain", "dst_domain")
        .agg(F.count(F.lit(1)).alias("weight"))
        .select(
            url_id(F.col("src_domain")).alias("subject"),
            url_id(F.col("dst_domain")).alias("object"),
            "src_domain",
            "dst_domain",
            "weight",
        )
    )


def domain_stats(pages: DataFrame) -> DataFrame:
    """Per-host corpus statistics over a pages table:
    ``(domain, n_pages, total_chars, mean_chars, n_langs)``.

    One hash aggregation (map-side combined); ``text`` lengths come from the
    stored column, so this does not touch ``html``  — Catalyst prunes the
    binary column out of the scan entirely."""
    return (
        pages.select(
            url_domain(F.col("url")).alias("domain"),
            F.length(F.col("text")).alias("n_chars"),
            F.col("lang"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# scheme://host[:port] prefix of an absolute url (no path/query/fragment)
_SCHEME_HOST_PATTERN = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def url_normalize(col) -> "F.Column":
    """Canonical form of an absolute url — the standard crawl-frontier /
    URL-dedup normalization (RFC 3986 §6 syntax-based normalization,
    public spec): lowercase the scheme and authority, drop the fragment,
    drop an explicit default port (``:80`` for http, ``:443`` for
    https), and canonicalize an empty path to ``/``.  Query strings and
    path case are preserved (they are significant).  Non-absolute inputs
    pass through unchanged.

    Pure Catalyst (``regexp_extract``/``regexp_replace``/string ops, no
    capture-group backreferences) — stays inside whole-stage codegen and
    is replayable verbatim by the DuckDB oracle.  Map-only: at 100 TB
    this is a zero-shuffle scan, the cheap first stage before the
    url-keyed dedup/recrawl shuffles.
    """
    u = F.col(col) if isinstance(col, str) else col
    sh = F.regexp_extract(u, _SCHEME_HOST_PATTERN, 1)
    shl = F.lower(sh)
    sh_norm = (
        F.when(
            shl.startswith("http://") & shl.endswith(":80"),
            F.substring(shl, F.lit(1), F.length(shl) - F.lit(3)),
        )
        .when(
            shl.startswith("https://") & shl.endswith(":443"),
            F.substring(shl, F.lit(1), F.length(shl) - F.lit(4)),
        )
        .otherwise(shl)
    )
    rest = F.substring(u, F.length(sh) + F.lit(1), F.length(u))
    rest_nofrag = F.regexp_replace(rest, r"#.*", "")
    path = F.when(rest_nofrag == "", F.lit("/")).otherwise(rest_nofrag)
    return F.when(sh == "", u).otherwise(F.concat(sh_norm, path))


def frontier_schedule(
    urls: DataFrame,
    priority_col: str = "priority",
    delay_s: float = 1.0,
    max_per_host: int | None = None,
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling (the host-queue model
    every polite crawler uses — Heritrix/Nutch-style per-host FIFO with a
    crawl delay; Mercator's frontier, Heydon & Najork 1999 — public
    designs): URLs are grouped by host, ordered within each host by
    ``priority_col`` DESC (ties broken by url ASC, deterministic), and
    the k-th URL of a host is scheduled ``(k-1) * delay_s`` seconds into
    the crawl cycle, so no host is hit faster than once per ``delay_s``
    while every host's queue starts immediately (maximum cross-host
    parallelism).  ``max_per_host`` caps each host's queue — the
    per-cycle politeness budget that keeps mega-hosts from dominating a
    fetch round.

    Scale shape (10^12 URLs): host extraction is map-only regexp; the
    only shuffle is the per-host window, whose skew bound is the largest
    single host — exactly the unit a frontier must serialize anyway (a
    host's queue is inherently sequential), so the plan's skew IS the
    problem's skew.  With ``max_per_host`` set, a 100 TB deployment
    would pre-prune per-host overflow with the same window it already
    pays for; no extra pass.

    Input needs ``(url, <priority_col>)``; returns
    ``(url, host, host_rank, fetch_slot)`` with ``host_rank`` 1-based
    and ``fetch_slot = (host_rank - 1) * delay_s`` (double, seconds).
    """
    if delay_s <= 0:
        raise ValueError(f"delay_s must be > 0, got {delay_s}")
    if max_per_host is not None and max_per_host < 1:
        raise ValueError(f"max_per_host must be >= 1, got {max_per_host}")
    from pyspark.sql.window import Window

    w = Window.partitionBy("host").orderBy(
        F.desc(priority_col), F.asc("url")
    )
    ranked = urls.select(
        "url",
        url_domain(F.col("url")).alias("host"),
        F.col(priority_col),
    ).withColumn("host_rank", F.row_number().over(w).cast("long"))
    if max_per_host is not None:
        ranked = ranked.filter(F.col("host_rank") <= max_per_host)
    return ranked.select(
        "url",
        "host",
        "host_rank",
        ((F.col("host_rank") - 1) * F.lit(float(delay_s))).alias(
            "fetch_slot"
        ),
    )


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """Parse ``sitemap.xml`` documents (sitemaps.org protocol — public
    spec) into (host, loc, lastmod) rows with pure Catalyst expressions:
    split on ``</url>`` record closers, regexp-extract the single
    ``<loc>``/``<lastmod>`` of each record.  Tag-level splitting instead
    of a full XML parse is deliberate: it is whole-stage-codegen map-only
    (zero shuffles at any corpus size), byte-replayable in ANSI SQL for
    the oracle, and the sitemap protocol's flat <url> record structure
    makes it exact for spec-conforming files (no nested <url> elements
    exist).  Records without a ``<loc>`` are dropped; a missing
    ``<lastmod>`` yields NULL.
    """
    seg = F.explode(F.split(F.col("content"), "</url>")).alias("seg")
    rows = sitemaps.select("host", seg)
    loc = F.regexp_extract(F.col("seg"), "<loc>([^<]+)</loc>", 1)
    lastmod = F.regexp_extract(
        F.col("seg"), "<lastmod>([^<]+)</lastmod>", 1
    )
    return rows.select(
        "host",
        loc.alias("loc"),
        F.when(lastmod != "", lastmod).alias("lastmod"),
    ).filter(F.col("loc") != "")


def sitemap_discoveries(
    sitemaps: DataFrame, pages: DataFrame
) -> DataFrame:
    """Frontier discovery from sitemaps: parsed sitemap urls MINUS the
    already-crawled url set — the feed a crawler merges into its
    frontier (:func:`frontier_schedule` consumes it directly).  One
    left-anti equi-join on url; the crawled side is the fact table, the
    sitemap side is crawl-metadata-sized, so at 100 TB the join
    broadcasts the PARSED sitemap urls when small or hash-shuffles on
    url otherwise — never pairwise.  Returns (host, loc, lastmod).
    """
    parsed = parse_sitemaps(sitemaps)
    return parsed.join(
        pages.select(F.col("url").alias("loc")).distinct(),
        "loc",
        "left_anti",
    ).select("host", "loc", "lastmod")


def crawl_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot delta between two crawls of the same web — the
    incremental-processing primitive (recrawl scheduling, changed-page
    reprocessing, tombstoning): full-outer url join with content-hash
    compare, yielding per url one of

        added      — url only in the new crawl
        removed    — url only in the old crawl
        changed    — both crawls, different html bytes (md5)
        unchanged  — both crawls, identical html bytes

    One hash shuffle on url (both sides md5-reduced to 32-byte digests
    before the join, so the exchange never carries page bodies) — the
    same shape at 10^12 urls.  Returns (url, status).
    """
    o = old.select("url", F.md5("html").alias("__ho"))
    n = new.select("url", F.md5("html").alias("__hn"))
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), "added")
        .when(F.col("__hn").isNull(), "removed")
        .when(F.col("__ho") != F.col("__hn"), "changed")
        .otherwise("unchanged")
    )
    return j.select("url", status.alias("status"))


def mirror_hosts(
    pages: DataFrame,
    min_shared: int = 2,
    max_hosts_per_content: int | None = 50,
) -> DataFrame:
    """Mirror-site detection — host pairs serving (near-)identical content
    sets (public technique: Bharat & Broder WWW'99 mirror detection; a
    standard Common-Crawl dedup stage, since mirrors duplicate entire
    sites, not single documents).  Hosts are compared by their sets of
    page-content md5 digests:

        shared(a, b)  = |digests(a) ∩ digests(b)|
        jaccard(a, b) = shared / (|digests(a)| + |digests(b)| − shared)

    Shape (100 TB-safe): pages reduce to DISTINCT (host, md5) — 32-byte
    keys, never bodies; the intersection comes from a self equi-join ON
    the digest, so only hosts that actually share content ever meet.
    ``max_hosts_per_content`` is the frequent-key guard (the
    ``max_df``/``max_bucket`` idiom): a boilerplate page served by d
    hosts would contribute O(d²) pairs — digests on more than the cap
    are dropped before the join (a page on 50+ hosts is boilerplate, not
    a mirror signal).  Pairs are canonical (host_a < host_b).  Returns
    (host_a, host_b, shared, size_a, size_b, jaccard round 6) filtered
    to ``shared >= min_shared``.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    hm = (
        pages.select(
            url_domain(F.col("url")).alias("host"),
            F.md5("html").alias("__h"),
        )
        .filter(F.col("host") != "")
        .distinct()
    )
    if max_hosts_per_content is not None:
        ok = (
            hm.groupBy("__h")
            .agg(F.count(F.lit(1)).alias("__d"))
            .filter(F.col("__d") <= max_hosts_per_content)
            .select("__h")
        )
        hm = hm.join(ok, "__h")
    sizes = hm.groupBy("host").agg(F.count(F.lit(1)).alias("sz"))
    a = hm.select(F.col("host").alias("host_a"), "__h")
    b = hm.select(F.col("host").alias("host_b"), "__h")
    pairs = (
        a.join(b, "__h")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("size_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("size_b")),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "shared",
            "size_a",
            "size_b",
            F.round(
                F.col("shared")
                / (F.col("size_a") + F.col("size_b") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )


def latest_snapshot(
    pages: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Crawl-history compaction — keep ONE row per url, the newest crawl
    (the SCD-style "current snapshot" view every recrawl pipeline
    maintains before analysis; WARC archives are append-only, so the
    compaction is a read-side view, not a rewrite).

    Winner per key = max (ts, md5(html)) — the digest tie-break makes
    simultaneous recrawls deterministic.  Picked with groupBy +
    ``max_by``-style max(struct) rather than a window: the aggregation
    gets a map-side partial combine (each task reduces its local rows to
    one candidate per key before the shuffle), where a window would
    shuffle every historical version — the
    :func:`~pregel_rs_spark.functions.robots.robots_verdicts` winner-pick
    idiom.  Returns one row per key: (key, ts, content_md5).
    """
    cand = pages.select(
        F.col(key_col).alias("__k"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.md5("html").alias("content_md5"),
        ).alias("__c"),
    )
    won = cand.groupBy("__k").agg(F.max("__c").alias("__w"))
    return won.select(
        F.col("__k").alias(key_col),
        F.col("__w.ts").alias(ts_col),
        F.col("__w.content_md5").alias("content_md5"),
    )


def merge_snapshots(*snaps: DataFrame) -> DataFrame:
    """Merge already-reduced snapshot tables (url, warc_ts, content_md5)
    under the SAME winner rule as :func:`latest_snapshot` (max (ts, md5)
    per url) — the associative/commutative combine that makes snapshot
    maintenance incremental: ``latest(A ∪ B) == merge(latest(A),
    latest(B))``, so a stream can fold micro-batches into a running
    compact view without ever re-reading raw history."""
    if not snaps:
        raise ValueError("merge_snapshots needs >= 1 snapshot")
    u = snaps[0]
    for s in snaps[1:]:
        u = u.unionByName(s)
    won = (
        u.select(
            "url",
            F.struct(
                F.col("warc_ts").alias("ts"),
                F.col("content_md5").alias("content_md5"),
            ).alias("__c"),
        )
        .groupBy("url")
        .agg(F.max("__c").alias("__w"))
    )
    return won.select(
        "url",
        F.col("__w.ts").alias("warc_ts"),
        F.col("__w.content_md5").alias("content_md5"),
    )


def related_hosts(
    pages: DataFrame,
    min_shared: int = 2,
    max_hosts_per_target: int | None = 200,
) -> DataFrame:
    """Related-site suggestion by outlink-profile similarity — host pairs
    whose sets of DISTINCT outlink target hosts overlap (bibliographic
    coupling at host granularity, Kessler 1963; the link-graph analogue of
    :func:`mirror_hosts`' content-set overlap).  "Sites that link to the
    same places are about the same things" — the classic related-pages
    signal.

    Shape: pages → :func:`domain_edges` (host-level distinct link pairs)
    → self equi-join ON the shared TARGET host → canonical pair rollup.
    ``max_hosts_per_target`` is the frequent-key guard: a host everyone
    links to (a CDN, a social widget) contributes O(d²) pairs and zero
    signal — targets with more than the cap of distinct linkers are
    dropped before the join (the ``max_df``/``max_bucket`` idiom).
    Returns (host_a, host_b, shared, size_a, size_b, jaccard round 6)
    filtered to ``shared >= min_shared``.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    he = domain_edges(pages).select(
        F.col("src_domain").alias("host"), F.col("dst_domain").alias("__t")
    ).distinct()
    if max_hosts_per_target is not None:
        ok = (
            he.groupBy("__t")
            .agg(F.count(F.lit(1)).alias("__d"))
            .filter(F.col("__d") <= max_hosts_per_target)
            .select("__t")
        )
        he = he.join(ok, "__t")
    sizes = he.groupBy("host").agg(F.count(F.lit(1)).alias("sz"))
    a = he.select(F.col("host").alias("host_a"), "__t")
    b = he.select(F.col("host").alias("host_b"), "__t")
    pairs = (
        a.join(b, "__t")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("size_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("size_b")),
            "host_b",
        )
        .select(
            "host_a", "host_b", "shared", "size_a", "size_b",
            F.round(
                F.col("shared")
                / (F.col("size_a") + F.col("size_b") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )


def url_templates(
    pages: DataFrame, url_col: str = "url", min_count: int = 2
) -> DataFrame:
    """URL path-template mining — the crawler-trap / infinite-space
    detector (public crawl-engineering practice: calendar pages, session
    ids, and paginated archives differ only in numeric path segments, so
    collapsing digit runs exposes the template behind millions of
    near-identical URLs; cf. the IRLbot "spam/trap" frontier literature,
    Lee et al. 2009).  Per (domain, template):

      template = path+query with every digit run replaced by ``{n}``
      n_urls   = how many distinct URLs instantiate it

    High-n templates are the trap candidates a frontier scheduler caps;
    ``min_count`` drops the long singleton tail at the source (at crawl
    scale most templates are instantiated once — the filter is the
    skew/size guard).

    Pure Catalyst regex (domain = the extractor's ``_DOMAIN_PATTERN``,
    verbatim) — one map pass + one (domain, template) hash agg with
    map-side combine; no explode, no joins.  Returns
    ``(domain, template, n_urls)``.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    u = F.col(url_col)
    domain = F.regexp_extract(u, _DOMAIN_PATTERN, 1)
    path = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    template = F.regexp_replace(path, r"[0-9]+", "{n}")
    return (
        pages.select(domain.alias("domain"), template.alias("template"), u)
        .groupBy("domain", "template")
        .agg(F.count_distinct(u).cast("long").alias("n_urls"))
        .filter(F.col("n_urls") >= min_count)
    )
