"""F8 — synthetic pages + byte-identical extraction + link graph e2e."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pregel_rs_spark import GraphFrame
from pregel_rs_spark.algorithms import pagerank
from pregel_rs_spark.functions.extract import (
    extract_links_py,
    extract_text_bytes,
    extract_text_udf,
    pages_to_edges,
    pages_to_vertices,
)
from pregel_rs_spark.sources.synth import gen_page, synth_pages

N = 300


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, N, seed=42).cache()


def test_schema_exact(pages):
    assert [(f.name, f.dataType.simpleString()) for f in pages.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]
    assert pages.count() == N


def test_deterministic_generation(spark, pages):
    """Same (n, seed) → identical bytes, independent of partitioning."""
    again = synth_pages(spark, N, seed=42, partitions=3)
    h1 = sorted(
        (r.url, hashlib.sha256(bytes(r.html)).hexdigest()) for r in pages.collect()
    )
    h2 = sorted(
        (r.url, hashlib.sha256(bytes(r.html)).hexdigest()) for r in again.collect()
    )
    assert h1 == h2


def test_byte_identical_extraction(pages):
    """North-rule invariant: distributed pandas-UDF extraction is
    byte-identical per url to the local pure-Python reference."""
    got = pages.select(
        "url", extract_text_udf(F.col("html")).alias("extracted"), "html", "text"
    ).collect()
    assert len(got) == N
    for r in got:
        local = extract_text_bytes(bytes(r.html))
        assert r.extracted == local, r.url
        assert r.text == local, r.url  # pre-filled column used the same path
        # sha256 compare as FIXTURES.md F8 specifies
        assert (
            hashlib.sha256(r.extracted.encode()).digest()
            == hashlib.sha256(local.encode()).digest()
        )


def test_extractor_handles_noise():
    html = (
        b"<html><head><script>bad < worse</script><style>a{}</style></head>"
        b"<body><!-- no --><p>Hello &amp; welcome &lt;here&gt;</p>"
        b'<a href="javascript:void(0)">j</a></body></html>'
    )
    assert extract_text_bytes(html) == "Hello & welcome <here> j"
    assert extract_links_py(html, "https://x.com/a") == []


def test_link_extraction_resolution():
    html = (
        b'<a href="/page/7">rel</a>'
        b'<a href="https://other.com/x#frag">abs</a>'
        b'<a href="mailto:a@b.c">m</a>'
        b'<a href="/page/7">dup</a>'
    )
    links = extract_links_py(html, "https://site0.example.com/page/1")
    assert links == [
        "https://site0.example.com/page/7",
        "https://other.com/x",
    ]


def test_edges_and_skew(pages):
    edges = pages_to_edges(pages)
    assert edges.columns == ["subject", "object", "src_url", "dst_url"]
    n_edges = edges.count()
    assert n_edges > N  # dense enough
    # in-degree skew exists (hubs): max in-degree >> median
    ind = edges.groupBy("object").count()
    stats = ind.agg(
        F.max("count").alias("mx"), F.expr("percentile(count, 0.5)").alias("md")
    ).collect()[0]
    assert stats.mx >= 5 * stats.md


def test_xxhash64_parity(spark, pages):
    """Pure-Python XXH64 (oracle path) is bit-identical to F.xxhash64 on
    every corpus url — the foundation of the Spark-free edge oracle."""
    from pregel_rs_spark.functions.hashing import url_id_py

    rows = pages.select("url", F.xxhash64("url").alias("h")).collect()
    assert len(rows) == N
    for r in rows:
        assert url_id_py(r.url) == r.h, r.url


def test_webtext_edges_oracle_parquet(spark):
    """The committed expected-edge parquet (tests/data, driver oracle for
    `webtext_edges`) equals both a fresh pure-Python regeneration and the
    Spark extraction pipeline at n=2000."""
    import os
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_webtext_oracle import expected_edges

    path = os.path.join(
        os.path.dirname(__file__), "data", "webtext_edges_n2000_seed42.parquet"
    )
    committed = sorted(
        zip(*(pq.read_table(path).column(c).to_pylist() for c in ("subject", "object")))
    )
    fresh = expected_edges(2000, 42)
    assert committed == fresh, "committed oracle parquet drifted — regenerate"

    got = sorted(
        (r.subject, r.object)
        for r in pages_to_edges(synth_pages(spark, 2000, seed=42, partitions=8))
        .select("subject", "object")
        .distinct()
        .collect()
    )
    assert got == fresh


def test_pagerank_over_synthetic_pages(spark, pages):
    """E2E: pages → links → edge table → PageRank to 1e-6, Σ=1."""
    edges = pages_to_edges(pages).select("subject", "object").distinct()
    vertices = pages_to_vertices(pages)
    g = GraphFrame(vertices, edges)
    res = pagerank(g, tol=1e-6, max_iterations=60)
    total = res.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)
    assert res.count() == N


def test_domain_rollup_matches_pure_python(spark, pages):
    """domain_edges/domain_stats equal a pure-Python rollup of the same
    corpus (domains from the same regexp, weights = distinct page links)."""
    import re
    from collections import Counter, defaultdict

    from pregel_rs_spark.functions.extract import (
        domain_edges,
        domain_stats,
        extract_links_py,
    )
    from pregel_rs_spark.sources.synth import gen_page, page_url

    dom_re = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)")

    def dom(u):
        m = dom_re.match(u)
        return m.group(1) if m else ""

    urls = {page_url(i, N) for i in range(N)}
    w = Counter()
    for i in range(N):
        p = gen_page(i, N, 42)
        for dst in extract_links_py(p["html"], p["url"]):
            if dst == p["url"] or dst not in urls:
                continue
            a, b = dom(p["url"]), dom(dst)
            if a != b:
                w[(a, b)] += 1

    got = {
        (r.src_domain, r.dst_domain): r.weight
        for r in domain_edges(pages).collect()
    }
    assert got == dict(w)
    # ids are xxhash64 of the domain strings (pluggable into GraphFrame)
    one = domain_edges(pages).limit(1).collect()[0]
    from pregel_rs_spark.functions.hashing import url_id_py

    assert one.subject == url_id_py(one.src_domain)

    st = defaultdict(lambda: [0, 0, set()])
    for i in range(N):
        p = gen_page(i, N, 42)
        d = st[dom(p["url"])]
        d[0] += 1
        d[1] += len(p["text"])
        d[2].add(p["lang"])
    got_stats = {
        r.domain: (r.n_pages, r.total_chars, r.n_langs)
        for r in domain_stats(pages).collect()
    }
    assert got_stats == {
        k: (v[0], v[1], len(v[2])) for k, v in st.items()
    }


def test_domain_oracle_parquets_fresh(spark):
    """The committed links/pages oracle parquets equal fresh pure-Python
    regenerations (drift guard, like the edge parquet)."""
    import os
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_webtext_oracle import expected_links, expected_pages

    data = os.path.join(os.path.dirname(__file__), "data")
    lp = os.path.join(data, "webtext_links_n2000_seed42.parquet")
    committed = sorted(
        zip(*(pq.read_table(lp).column(c).to_pylist()
              for c in ("src_url", "dst_url")))
    )
    assert committed == expected_links(2000, 42)

    pp = os.path.join(data, "webtext_pages_n2000_seed42.parquet")
    committed_p = list(
        zip(*(pq.read_table(pp).column(c).to_pylist()
              for c in ("url", "lang", "n_chars")))
    )
    assert committed_p == expected_pages(2000, 42)


def test_anchor_extraction_matches_pure_python(spark, pages):
    """Distributed anchor edges equal the pure-Python reference per url;
    dst_url sets agree with the link extractor exactly."""
    from pregel_rs_spark.functions.extract import (
        extract_anchors_py,
        pages_to_anchor_edges,
    )
    from pregel_rs_spark.sources.synth import gen_page, page_url

    urls = {page_url(i, N) for i in range(N)}
    expected = set()
    for i in range(N):
        p = gen_page(i, N, 42)
        for dst, anchor in extract_anchors_py(p["html"], p["url"]):
            if dst != p["url"] and dst in urls:
                expected.add((p["url"], dst, anchor))
        # dst alignment with the plain link extractor
        from pregel_rs_spark.functions.extract import extract_links_py

        assert [d for d, _ in extract_anchors_py(p["html"], p["url"])] == \
            extract_links_py(p["html"], p["url"])

    got = {
        (r.src_url, r.dst_url, r.anchor)
        for r in pages_to_anchor_edges(pages).collect()
    }
    assert got == expected
    # anchors are cleaned text: non-empty for the synth corpus vocab words
    assert all(a and "<" not in a for _, _, a in got)


def test_anchor_oracle_parquet_fresh():
    """Committed anchors parquet equals a fresh pure-Python regeneration."""
    import os
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_webtext_oracle import expected_anchors

    path = os.path.join(
        os.path.dirname(__file__), "data", "webtext_anchors_n2000_seed42.parquet"
    )
    committed = sorted(
        zip(*(pq.read_table(path).column(c).to_pylist()
              for c in ("src_url", "dst_url", "anchor")))
    )
    assert committed == expected_anchors(2000, 42)


def test_url_normalize_cases(spark):
    """RFC 3986 syntax normalization: case, default ports, fragments,
    empty path; query and path case preserved; non-urls pass through."""
    from pregel_rs_spark.functions.extract import url_normalize

    cases = [
        ("HTTP://WWW.Example.COM:80/Path/To#frag", "http://www.example.com/Path/To"),
        ("https://Host.com:443", "https://host.com/"),
        ("http://h.com:8080/a?q=B#x", "http://h.com:8080/a?q=B"),
        ("ftp://H.com/", "ftp://h.com/"),
        ("http://h.com", "http://h.com/"),
        ("HTTPS://A.B.C:443/X/../Y?Z=1", "https://a.b.c/X/../Y?Z=1"),
        ("not a url", "not a url"),
        ("/relative/path#f", "/relative/path#f"),
    ]
    df = spark.createDataFrame(cases, "url string, expected string")
    got = df.select("url", "expected", url_normalize("url").alias("norm"))
    for r in got.collect():
        assert r.norm == r.expected, f"{r.url!r}: {r.norm!r} != {r.expected!r}"


def test_frontier_schedule_politeness(spark):
    """Per-host politeness scheduling: priority-desc/url-asc ordering,
    (rank-1)*delay slots, per-host cap, hostless urls grouped, and
    parameter validation."""
    from pregel_rs_spark.functions.extract import frontier_schedule

    rows = [
        ("http://a.com/1", 10), ("http://a.com/2", 30),
        ("http://a.com/3", 30),                     # tie -> url asc
        ("http://b.org/x", 5),
        ("nohost", 1), ("alsonohost", 2),           # no scheme://host
    ]
    urls = spark.createDataFrame(rows, "url string, priority long")
    got = {
        r.url: (r.host, r.host_rank, r.fetch_slot)
        for r in frontier_schedule(urls, delay_s=2.0).collect()
    }
    assert got["http://a.com/2"] == ("a.com", 1, 0.0)
    assert got["http://a.com/3"] == ("a.com", 2, 2.0)   # tie loses on url
    assert got["http://a.com/1"] == ("a.com", 3, 4.0)
    assert got["http://b.org/x"] == ("b.org", 1, 0.0)
    assert got["alsonohost"] == ("", 1, 0.0)            # hostless bucket
    assert got["nohost"] == ("", 2, 2.0)

    capped = frontier_schedule(urls, delay_s=2.0, max_per_host=2)
    assert capped.count() == 5  # a.com loses its 3rd url

    import pytest as _pytest
    with _pytest.raises(ValueError, match="delay_s"):
        frontier_schedule(urls, delay_s=0)
    with _pytest.raises(ValueError, match="max_per_host"):
        frontier_schedule(urls, max_per_host=0)


def test_sitemap_corpus_and_parse(spark):
    """synth_sitemaps matches the committed pre-materialized corpus AND a
    fresh pure-Python regeneration; parse_sitemaps extracts every entry
    with its lastmod; discoveries are exactly the novel /new/ urls."""
    import duckdb

    from pregel_rs_spark.functions.extract import (
        parse_sitemaps,
        sitemap_discoveries,
    )
    from pregel_rs_spark.sources.synth import (
        gen_sitemap,
        synth_pages,
        synth_sitemaps,
    )

    committed = {
        (r[0], r[1])
        for r in duckdb.sql(
            "SELECT host, content FROM "
            "'/root/repo/tests/data/sitemaps_n2000_seed42.parquet'"
        ).fetchall()
    }
    fresh = {
        (s["host"], s["content"])
        for s in (gen_sitemap(j, 2000, 42) for j in range(40))
        if s is not None
    }
    assert committed == fresh  # drift guard
    sm = synth_sitemaps(spark, 2000, seed=42)
    spark_side = {(r.host, r.content) for r in sm.collect()}
    assert spark_side == committed  # engine guard

    parsed = parse_sitemaps(sm).collect()
    # replay the parse in python over the committed content
    import re

    expect = set()
    for host, content in committed:
        for seg in content.split("</url>"):
            m = re.search(r"<loc>([^<]+)</loc>", seg)
            if m:
                lm = re.search(r"<lastmod>([^<]+)</lastmod>", seg)
                expect.add((host, m.group(1), lm.group(1) if lm else None))
    assert {(r.host, r.loc, r.lastmod) for r in parsed} == expect

    pages = synth_pages(spark, 2000, seed=42, partitions=8)
    disc = sitemap_discoveries(sm, pages).collect()
    assert all("/new/" in r.loc for r in disc)
    assert len(disc) == len({r.loc for r in disc}) > 0


def test_crawl_delta_statuses(spark):
    """crawl_delta: all four statuses on a toy pair of snapshots."""
    from pregel_rs_spark.functions.extract import crawl_delta

    old = spark.createDataFrame(
        [("u1", bytearray(b"a")), ("u2", bytearray(b"b")),
         ("u3", bytearray(b"c"))],
        "url string, html binary",
    )
    new = spark.createDataFrame(
        [("u1", bytearray(b"a")), ("u2", bytearray(b"B")),
         ("u4", bytearray(b"d"))],
        "url string, html binary",
    )
    got = {r.url: r.status for r in crawl_delta(old, new).collect()}
    assert got == {
        "u1": "unchanged", "u2": "changed", "u3": "removed", "u4": "added"
    }


def test_crawl_hashes_committed_match_fresh():
    """Committed hash tables equal a fresh pure-Python regeneration for
    both seeds (drift guard for the crawl_delta oracle inputs)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import duckdb

    from tools.gen_crawl_oracle import expected_hashes

    for seed in (42, 43):
        committed = duckdb.sql(
            "SELECT url, page_no, content_md5 FROM "
            f"'/root/repo/tests/data/webtext_hashes_n2000_seed{seed}.parquet' "
            "ORDER BY page_no"
        ).fetchall()
        fresh = [tuple(r) for r in expected_hashes(2000, seed)]
        assert [tuple(r) for r in committed] == sorted(
            fresh, key=lambda r: r[1]
        )


def test_mirror_hosts_detection(spark):
    """mirror_hosts: exact shared/size/jaccard on a toy corpus; the
    frequent-digest cap drops boilerplate; min_shared filters."""
    from pregel_rs_spark.functions.extract import mirror_hosts

    rows = []
    # hostA and hostB share 2 of 3 pages; hostC shares only 1 with A
    for h, pages in (
        ("a.com", ["x", "y", "z"]),
        ("b.com", ["x", "y", "w"]),
        ("c.com", ["x", "q", "r"]),
    ):
        for i, content in enumerate(pages):
            rows.append(
                (f"https://{h}/p{i}", bytearray(content.encode()))
            )
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = {
        (r.host_a, r.host_b): r for r in mirror_hosts(pages, min_shared=2).collect()
    }
    assert set(out) == {("a.com", "b.com")}
    r = out[("a.com", "b.com")]
    assert r.shared == 2 and r.size_a == 3 and r.size_b == 3
    assert abs(r.jaccard - 2 / 4) < 1e-9
    # content 'x' lives on 3 hosts; cap at 2 removes it everywhere
    capped = {
        (r.host_a, r.host_b): r.shared
        for r in mirror_hosts(
            pages, min_shared=1, max_hosts_per_content=2
        ).collect()
    }
    assert capped == {("a.com", "b.com"): 1}  # only 'y' survives


def test_crawl_plan_composition(spark):
    """crawl_plan (driver query): discoveries enter the schedule with
    priority 0 (tail of their host queue), disallowed urls never appear,
    every host respects the 5 s delay spacing."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = m.queries()["crawl_plan"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    for host, rows in by_host.items():
        rows.sort(key=lambda r: r.host_rank)
        assert [r.host_rank for r in rows] == list(range(1, len(rows) + 1))
        for r in rows:
            assert abs(r.fetch_slot - (r.host_rank - 1) * 5.0) < 1e-9
        assert len(rows) <= 50
    disc = [r for r in out if "/new/" in r.url]
    assert disc, "sitemap discoveries must be schedulable"


def test_latest_snapshot_compaction(spark):
    """latest_snapshot: newest ts wins per url; md5 DESC breaks exact-ts
    ties deterministically; one row per url."""
    from datetime import datetime, timezone

    from pregel_rs_spark.functions.extract import latest_snapshot

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t1 = datetime(2024, 1, 2, tzinfo=timezone.utc)
    rows = [
        ("u1", t0, bytearray(b"old")), ("u1", t1, bytearray(b"new")),
        ("u2", t0, bytearray(b"a")), ("u2", t0, bytearray(b"b")),
        ("u3", t1, bytearray(b"only")),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    out = {r.url: r for r in latest_snapshot(pages).collect()}
    import hashlib

    assert len(out) == 3
    assert out["u1"].content_md5 == hashlib.md5(b"new").hexdigest()
    tie = max(
        hashlib.md5(b"a").hexdigest(), hashlib.md5(b"b").hexdigest()
    )
    assert out["u2"].content_md5 == tie


def test_related_hosts_coupling(spark):
    """related_hosts: outlink-target set overlap with a frequent-target
    guard; exact on a toy web."""
    from pregel_rs_spark.functions.extract import related_hosts

    def page(host, i, targets):
        html = "".join(
            f'<a href="https://{t}/p0">x</a>' for t in targets
        ).encode()
        from datetime import datetime, timezone

        return (
            f"https://{host}/p{i}",
            datetime(2024, 1, 1, tzinfo=timezone.utc),
            bytearray(html),
            "",
            "en",
        )

    rows = [
        page("a.com", 0, ["x.com", "y.com", "cdn.com"]),
        page("b.com", 0, ["x.com", "y.com", "cdn.com"]),
        page("c.com", 0, ["z.com", "cdn.com"]),
        # targets must exist: the link graph is closed-world
        page("x.com", 0, []), page("y.com", 0, []),
        page("z.com", 0, []), page("cdn.com", 0, []),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = {
        (r.host_a, r.host_b): r
        for r in related_hosts(pages, min_shared=2,
                               max_hosts_per_target=2).collect()
    }
    # cdn.com is linked by all 3 hosts -> dropped by the cap; a/b share x,y
    assert set(out) == {("a.com", "b.com")}
    r = out[("a.com", "b.com")]
    assert r.shared == 2 and r.size_a == 2 and r.size_b == 2
    assert r.jaccard == 1.0


def test_url_templates_trap_detection(spark):
    """Digit runs collapse into {n}: a calendar trap (3 urls, one
    template) surfaces while singleton paths drop below min_count;
    query strings are templated too; duplicate URLs count once."""
    from pregel_rs_spark.functions.extract import url_templates

    urls = [
        "https://a.example.com/cal/2024/01/05",
        "https://a.example.com/cal/2024/02/11",
        "https://a.example.com/cal/2025/03/09",
        "https://a.example.com/about",
        "https://b.example.com/item?id=7",
        "https://b.example.com/item?id=9",
        "https://b.example.com/item?id=9",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r.domain, r.template): r.n_urls
        for r in url_templates(df, min_count=2).collect()
    }
    assert got == {
        ("a.example.com", "/cal/{n}/{n}/{n}"): 3,
        ("b.example.com", "/item?id={n}"): 2,
    }
    import pytest as _p

    with _p.raises(ValueError):
        url_templates(df, min_count=0)
