"""robots.txt parsing + admission (functions/robots.py) — RFC 9309
semantics pinned against hand-built cases, the pure-Python mirror, and
the committed oracle parquet."""

import os

import pytest
from pyspark.sql import functions as F

from pregel_rs_spark.functions.robots import (
    parse_robots_py,
    robots_allowed_py,
    robots_verdicts,
)

DATA = os.path.join(os.path.dirname(__file__), "data")

ROBOTS = "\n".join(
    [
        "# comment-only line",
        "User-Agent: evilbot",
        "Disallow: /",
        "",
        "user-agent: helper",
        "User-agent: *",  # second header of the same group — applies
        "Disallow: /private",
        "Allow: /private/ok",  # longer allow carve-out wins
        "disallow: /tmp/*.log",  # wildcard
        "Disallow: /exact$",  # end anchor
        "Disallow:",  # empty value — no-op
        "Allow: /dup",  # same length as the disallow below → allow wins
        "Disallow: /dup",
        "Crawl-delay: 5",  # unknown directive — ignored
        "Disallow: /after-unknown",  # still in the * group
    ]
)


def test_parse_robots_py_group_semantics():
    rules = parse_robots_py(ROBOTS)
    assert ("disallow", "/") not in rules  # evilbot group ignored
    assert ("disallow", "/private") in rules
    assert ("allow", "/private/ok") in rules
    assert ("disallow", "/tmp/*.log") in rules
    assert ("disallow", "/exact$") in rules
    assert ("disallow", "/after-unknown") in rules
    assert all(p != "" for _, p in rules)  # empty Disallow dropped


@pytest.mark.parametrize(
    "path,allowed,rule_path",
    [
        ("/", True, ""),  # no match → crawl-by-default
        ("/private", False, "/private"),
        ("/private/ok/x", True, "/private/ok"),  # longest match wins
        ("/private/no", False, "/private"),
        ("/tmp/a/b.log", False, "/tmp/*.log"),  # wildcard spans /
        ("/tmp/a.txt", True, ""),
        ("/exact", False, "/exact$"),
        ("/exact/sub", True, ""),  # anchor: no prefix match
        ("/dup/x", True, "/dup"),  # tie length → allow wins
        ("/after-unknown/z", False, "/after-unknown"),
    ],
)
def test_robots_allowed_py_cases(path, allowed, rule_path):
    rules = parse_robots_py(ROBOTS)
    got_allowed, _, got_path = robots_allowed_py(path, rules)
    assert got_allowed is allowed, path
    assert got_path == rule_path, path


def test_spark_verdicts_match_python_mirror(spark):
    """The Catalyst parse+match equals the pure-Python mirror on the
    hand-built file, including regex-special characters in rule paths."""
    special = ROBOTS + "\nDisallow: /w(ei)rd[1]+x?"
    robots = spark.createDataFrame(
        [("h.example", special)], "host string, content string"
    )
    paths = [
        "/", "/private", "/private/ok/x", "/private/no", "/tmp/a/b.log",
        "/tmp/a.txt", "/exact", "/exact/sub", "/dup/x", "/after-unknown/z",
        "/w(ei)rd[1]+x?y", "/w(ei)rd[1]x",
    ]
    urls = spark.createDataFrame(
        [(f"https://h.example{p}",) for p in paths], "url string"
    )
    got = {
        r.url: (r.allowed, r.rule, r.rule_path)
        for r in robots_verdicts(urls, robots).collect()
    }
    rules = parse_robots_py(special)
    for p in paths:
        assert got[f"https://h.example{p}"] == robots_allowed_py(p, rules), p


def test_committed_oracle_matches_regeneration_and_spark(spark):
    """Drift guard (committed parquet == fresh pure-Python regen) and
    engine guard (Spark pipeline == committed parquet) at n=500."""
    import pandas as pd

    from tools.gen_robots_oracle import expected_verdicts
    from pregel_rs_spark.sources.synth import synth_pages, synth_robots

    committed = pd.read_parquet(
        os.path.join(DATA, "robots_verdicts_n2000_seed42.parquet")
    )
    regen = pd.DataFrame(expected_verdicts(2000, 42))
    pd.testing.assert_frame_equal(
        committed.sort_values("url").reset_index(drop=True),
        regen.sort_values("url").reset_index(drop=True),
    )
    assert (~committed["allowed"]).sum() > 0  # the corpus exercises blocks

    n = 500
    pages = synth_pages(spark, n, seed=42, partitions=4)
    robots = synth_robots(spark, n, seed=42)
    got = {
        r.url: (r.host, r.allowed, r.rule, r.rule_path)
        for r in robots_verdicts(pages.select("url"), robots).collect()
    }
    want = {
        r["url"]: (r["host"], r["allowed"], r["rule"], r["rule_path"])
        for r in expected_verdicts(n, 42)
    }
    assert got == want


def test_robots_verdicts_rejects_missing_robots_host(spark):
    """Hosts absent from the robots corpus are allowed (crawl-by-default),
    and the broadcast flag changes the plan, never the values."""
    robots = spark.createDataFrame(
        [("known.example", "User-agent: *\nDisallow: /no")],
        "host string, content string",
    )
    urls = spark.createDataFrame(
        [("https://unknown.example/no",), ("https://known.example/no",)],
        "url string",
    )
    for bcast in (True, False):
        got = {
            r.url: r.allowed
            for r in robots_verdicts(
                urls, robots, broadcast_rules=bcast
            ).collect()
        }
        assert got == {
            "https://unknown.example/no": True,
            "https://known.example/no": False,
        }
