"""Deterministic synthetic Common-Crawl-style pages generator (FIXTURES F8).

Schema per BASELINE.json ``input_hint`` (exact):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Properties:
  * fully deterministic for a given (n, seed) — page i's content depends only
    on (seed, i, n); generation is distributed (``spark.range → mapInPandas``)
    and the same `gen_page` pure function serves as the local oracle, so
    distributed output is byte-identical to the local reference per url.
  * link structure: seeded power-law out-degree (hubs exist) and
    quadratically low-id-biased targets (in-degree skew → exercises the
    engine's skew handling); a mix of absolute and relative hrefs plus
    javascript:/mailto:/fragment noise to exercise the extractor.
  * ``text`` is pre-filled with ``extract_text_bytes(html)`` — the invariant
    under test is that distributed re-extraction equals this column equals
    the local pure-Python extraction, per url (sha256 compare).

No randomness at query time: ``random.Random(seed*1_000_003 + i)`` (Mersenne
Twister — platform-stable) is the only entropy source.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pregel_rs_spark.functions.extract import extract_text_bytes

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_LANGS = ["en", "en", "en", "de", "fr", "es"]  # en-weighted
_VOCAB = {
    "en": "the quick brown fox jumps over lazy dog web page crawl rank link "
          "graph data spark engine query text value node edge".split(),
    "de": "der schnelle braune fuchs springt über faulen hund netz seite "
          "daten funke graph knoten kante wert".split(),
    "fr": "le renard brun rapide saute par dessus chien paresseux toile page "
          "données graphe nœud arête valeur".split(),
    "es": "el zorro marrón rápido salta sobre perro perezoso red página "
          "datos grafo nodo arista valor".split(),
}
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def page_url(i: int, n: int) -> str:
    n_sites = max(1, n // 50)
    return f"https://site{i % n_sites}.example.com/page/{i}"


def gen_page(i: int, n: int, seed: int = 42, link_factor: int = 1) -> dict:
    """Pure deterministic page builder — also the local test oracle.

    ``link_factor`` scales the power-law out-degree (1 → mean ≈ 3.4 links,
    6 → mean ≈ 16) so benchmark corpora can be made message-dense without
    touching the default fixtures.
    """
    rng = random.Random(seed * 1_000_003 + i)
    lang = _LANGS[rng.randrange(len(_LANGS))]
    vocab = _VOCAB[lang]
    url = page_url(i, n)
    n_sites = max(1, n // 50)

    # power-law out-degree: P(deg ≥ d) ~ d^-1.25, capped
    u = rng.random()
    out_deg = min(int(link_factor / max(u, 1e-9) ** 0.8), 40 * link_factor)

    anchors = []
    for k in range(out_deg):
        # quadratic bias toward low page ids → in-degree hubs
        t = int(n * (rng.random() ** 2)) % n
        if t == i:
            continue
        target_url = page_url(t, n)
        if t % n_sites == i % n_sites and rng.random() < 0.5:
            href = f"/page/{t}"            # relative, same site
        else:
            href = target_url              # absolute
        word = vocab[rng.randrange(len(vocab))]
        anchors.append(f'<a href="{href}">{word}</a>')
    # extractor noise
    anchors.append('<a href="javascript:void(0)">x</a>')
    anchors.append('<a href="#frag">y</a>')
    anchors.append('<a href="mailto:a@example.com">z</a>')

    paras = []
    for _ in range(2 + rng.randrange(4)):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(8 + rng.randrange(20))]
        paras.append("<p>" + " ".join(words) + "</p>")

    html = (
        f"<!DOCTYPE html><html lang={lang}><head>"
        f"<title>Page {i} &amp; friends</title>"
        f"<style>body {{ color: red }}</style>"
        f"<script>var x = {i}; if (x < 3) {{}}</script></head>"
        f"<body><!-- comment {i} --><h1>Page {i}</h1>"
        + "".join(paras)
        + "<nav>" + "".join(anchors) + "</nav>"
        + "&lt;escaped&gt; &quot;q&quot;</body></html>"
    ).encode("utf-8")

    ts = _EPOCH + timedelta(seconds=(i * 9973) % (365 * 86400))
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": extract_text_bytes(html),
        "lang": lang,
    }


def synth_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
    link_factor: int = 1,
) -> DataFrame:
    """Distributed deterministic pages table: ``spark.range(n) → mapInPandas``.

    Generation is per-partition streaming (no driver-side rows); at bench
    scale pick ``partitions ≈ 2-3 × cores``.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_page(int(i), n, seed, link_factor) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
            yield out

    return spark.range(0, n, 1, partitions).mapInPandas(gen, PAGES_SCHEMA)


ROBOTS_SCHEMA = "host string, content string"


def gen_robots(j: int, n: int, seed: int = 42) -> dict | None:
    """Pure deterministic robots.txt builder for site ``j`` of the synth
    corpus (hosts match ``page_url``'s ``site{j}.example.com``) — also the
    local oracle for functions/robots.py.

    Exercises the full RFC 9309 surface: comments, mixed-case directives,
    a non-``*`` decoy group, prefix / ``*``-wildcard / ``$``-anchored
    rules, longer-Allow carve-outs, empty ``Disallow:`` no-ops, unknown
    directives.  Every 7th site (j % 7 == 3) publishes no robots.txt —
    the crawl-by-default path.
    """
    host = f"site{j}.example.com"
    if j % 7 == 3:
        return None
    rng = random.Random(seed * 7919 + j * 104729 + 17)
    lines = [f"# robots for {host}"]
    if rng.random() < 0.5:  # group for another agent — must be ignored
        lines += ["User-Agent: evilbot", "Disallow: /"]
    lines += ["", "User-agent: *"]
    for _ in range(rng.randint(1, 4)):
        r = rng.random()
        if r < 0.35:
            lines.append(f"DisAllow: /page/{rng.randint(0, 9)}")
        elif r < 0.55:
            lines.append(f"Disallow: /page/{rng.randint(0, 9)}*5")
        elif r < 0.70:
            lines.append(f"Disallow: /page/{rng.randint(0, 99)}$")
        elif r < 0.85:
            lines.append(
                f"Allow: /page/{rng.randint(0, 9)}{rng.randint(0, 9)}"
            )
        else:
            lines.append("Disallow:")  # empty value — RFC no-op
    if rng.random() < 0.3:
        lines.append("Crawl-delay: 5")  # unknown directive — ignored
    return {"host": host, "content": "\n".join(lines)}


def synth_robots(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic robots.txt corpus for the ``n``-page synth
    web (one row per site that publishes a robots.txt)."""
    n_sites = max(1, n // 50)
    partitions = partitions or min(
        spark.sparkContext.defaultParallelism, n_sites
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                r
                for r in (gen_robots(int(j), n, seed) for j in pdf["id"])
                if r is not None
            ]
            yield pd.DataFrame(rows, columns=["host", "content"])

    return spark.range(0, n_sites, 1, partitions).mapInPandas(
        gen, ROBOTS_SCHEMA
    )


SITEMAP_SCHEMA = "host string, content string"


def gen_sitemap(j: int, n: int, seed: int = 42) -> dict | None:
    """Pure deterministic sitemap.xml builder for site ``j`` of the synth
    corpus — also the local oracle for functions/extract.py's sitemap
    parser.  Lists a deterministic subset of the site's crawled pages
    plus a few NOVEL urls the crawl has not seen (the discovery case a
    sitemap exists for), each with a ``<lastmod>`` date.  Every 5th site
    (j % 5 == 2) publishes no sitemap.
    """
    host = f"site{j}.example.com"
    if j % 5 == 2:
        return None
    n_sites = max(1, n // 50)
    entries = []
    for i in range(j, n, n_sites):  # this site's pages
        if (i * 7 + j) % 5 < 3:  # deterministic subset
            d = _EPOCH + timedelta(days=(i * 31 + j) % 365)
            entries.append((page_url(i, n), d.strftime("%Y-%m-%d")))
    for k in range(1 + j % 3):  # novel (uncrawled) urls
        d = _EPOCH + timedelta(days=(j * 17 + k) % 365)
        entries.append(
            (f"https://{host}/new/{j}-{k}", d.strftime("%Y-%m-%d"))
        )
    body = "".join(
        f"<url><loc>{u}</loc><lastmod>{d}</lastmod></url>"
        for u, d in entries
    )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + body
        + "</urlset>"
    )
    return {"host": host, "content": content}


def synth_sitemaps(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic sitemap corpus for the ``n``-page synth
    web (one row per site that publishes a sitemap)."""
    n_sites = max(1, n // 50)
    partitions = partitions or min(
        spark.sparkContext.defaultParallelism, n_sites
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                r
                for r in (gen_sitemap(int(j), n, seed) for j in pdf["id"])
                if r is not None
            ]
            yield pd.DataFrame(rows, columns=["host", "content"])

    return spark.range(0, n_sites, 1, partitions).mapInPandas(
        gen, SITEMAP_SCHEMA
    )
