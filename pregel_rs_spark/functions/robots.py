"""robots.txt parsing and URL admission — RFC 9309 (Robots Exclusion
Protocol, public standard) for the ``User-agent: *`` product token.

A polite crawler pairs :func:`frontier_schedule` (WHEN to fetch) with this
module (WHETHER to fetch).  Everything here is pure Catalyst — string
splits, windows, and regexes that stay inside whole-stage codegen; no
Python runs per row on the hot path.

Semantics implemented (RFC 9309 §2):
  * groups — consecutive ``User-agent:`` lines form one group header; a
    group's rules apply iff one of its headers is ``*`` (specific
    user-agents are out of scope for a corpus-wide admission pass);
  * ``allow`` / ``disallow`` rules with ``*`` wildcards and the ``$``
    end-of-URL anchor; an empty ``Disallow:`` value is a no-op (§2.2.2);
  * longest-match wins, measured in octets of the rule path as written;
    on a tie, ``allow`` wins (§2.2.2);
  * a URL whose host has no robots.txt, or that matches no rule, is
    allowed (§2.3.1.2 crawl-by-default);
  * directives are case-insensitive, rule paths case-sensitive;
    ``#`` starts a comment.

Scale shape: parsing is one window pass per robots file keyed by host
(robots.txt files are tiny — KBs); matching is a host-keyed equi-join of
the URL table against the parsed rules (rules-per-host is O(dozens), so
the join multiplies each URL row by a small constant) followed by one
per-URL max(struct) aggregation — map-side partial combine, no sort — to
pick the winning rule.  Broadcast the parsed-rules side
when the robots corpus fits (millions of hosts × dozens of rules is
single-digit GB — usually broadcastable even at 100 TB of pages).  The
per-row ``RLIKE`` with a column pattern forgoes the compiled-once regex
fast path; patterns are a few bytes and rules-per-host is tiny, so the
match cost is bounded by the same constant as the join fan-out.

No reference counterpart (extension beyond pregel-rs src/ — the
reference ships no web-corpus tooling).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pregel_rs_spark.functions.extract import url_domain

# Regex metacharacters to neutralize in rule paths — every special EXCEPT
# '*' (the REP wildcard, translated to '.*') and '$' (stripped first when
# it is the trailing end-anchor, escaped when literal mid-path).
_META = r"([.^$+?(){}\[\]\\|])"


def _rule_pattern(path_col):
    """Translate a REP rule path into an anchored Java regex (column expr).

    ``/a*b$`` → ``^/a.*b$`` ; ``/c(d)`` → ``^/c\\(d\\)`` (prefix match).
    """
    anchored = path_col.endswith("$")
    body = F.when(
        anchored, F.substring(path_col, F.lit(1), F.length(path_col) - 1)
    ).otherwise(path_col)
    esc = F.regexp_replace(body, _META, r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    content_col: str = "content",
) -> DataFrame:
    """Parse raw robots.txt bodies into ``User-agent: *`` rules.

    Input ``(host, content)``; returns
    ``(host, rule, rule_path, pattern)`` with ``rule`` ∈ {allow, disallow},
    ``rule_path`` the path as written, ``pattern`` the anchored regex the
    matcher applies.  Group attribution follows RFC 9309: a rule belongs
    to the nearest preceding run of ``User-agent:`` lines.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(content_col), "\n")).alias("pos", "raw"),
    )
    cleaned = lines.select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*", "")).alias("line"),
    ).filter(F.col("line") != "")
    parsed = cleaned.select(
        "host",
        "pos",
        F.lower(F.trim(F.substring_index("line", ":", 1))).alias("directive"),
        F.trim(F.regexp_extract("line", r"^[^:]*:(.*)$", 1)).alias("value"),
    ).filter(F.col("line").contains(":"))

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("directive") == "user-agent"
    new_group = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    grouped = parsed.withColumn(
        "group_id", F.sum(new_group.cast("int")).over(w)
    )
    star_groups = (
        grouped.filter(is_ua & (F.col("value") == "*"))
        .select("host", "group_id")
        .distinct()
    )
    rules = (
        grouped.filter(
            F.col("directive").isin("allow", "disallow")
            & (F.col("value") != "")
        )
        .join(star_groups, ["host", "group_id"], "left_semi")
        .select(
            "host",
            F.col("directive").alias("rule"),
            F.col("value").alias("rule_path"),
        )
    )
    return rules.withColumn("pattern", _rule_pattern(F.col("rule_path")))


def robots_verdicts(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Admission verdict per URL against its host's robots.txt.

    ``urls`` needs a ``url`` column (any extra columns are dropped);
    ``robots`` is raw ``(host, content)``.  Returns
    ``(url, host, allowed, rule, rule_path)`` — ``rule`` is the winning
    rule (``none`` when nothing matched), ``allowed`` per RFC 9309
    longest-match / allow-wins-ties / crawl-by-default.
    """
    rules = parse_robots(robots)
    if broadcast_rules:
        rules = F.broadcast(rules)
    u = urls.select(
        F.col(url_col).alias("url"),
        url_domain(F.col(url_col)).alias("host"),
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)$", 1
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ).alias("path"),
    )
    cand = u.join(rules, "host", "left").withColumn(
        "matched",
        F.col("pattern").isNotNull()
        & F.expr("path RLIKE pattern"),
    )
    # winner per url: longest rule path, allow beats disallow on ties,
    # then rule_path DESC as the deterministic final tie-break.  Picked
    # with groupBy + max(struct) rather than a row_number window: the
    # aggregation gets a map-side partial combine (each task reduces its
    # URL×rules rows to one row per local URL before the shuffle), where
    # a window would sort and shuffle the full fan-out.
    key = F.struct(
        F.when(F.col("matched"), F.length("rule_path"))
        .otherwise(F.lit(-1))
        .alias("mlen"),
        F.when(F.col("matched") & (F.col("rule") == "allow"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("allow_pref"),
        F.coalesce(F.col("rule_path"), F.lit("")).alias("rp"),
        F.coalesce(F.col("rule"), F.lit("")).alias("r"),
        F.coalesce(F.col("matched"), F.lit(False)).alias("m"),
    )
    top = cand.groupBy("url", "host").agg(F.max(key).alias("w"))
    return top.select(
        "url",
        "host",
        F.when(~F.col("w.m"), F.lit(True))
        .otherwise(F.col("w.r") == "allow")
        .alias("allowed"),
        F.when(F.col("w.m"), F.col("w.r")).otherwise(F.lit("none"))
        .alias("rule"),
        F.when(F.col("w.m"), F.col("w.rp")).otherwise(F.lit(""))
        .alias("rule_path"),
    )


# ---------------------------------------------------------------------------
# pure-Python mirror — the local oracle (tools/gen_robots_oracle.py and
# tests assert the Spark path equals this, value-identical per url)
# ---------------------------------------------------------------------------

def parse_robots_py(content: str) -> list[tuple[str, str]]:
    """(rule, rule_path) list for the ``*`` agent — mirrors parse_robots
    over the identical filtered line sequence (non-empty, has ':')."""
    rows: list[tuple[str, str]] = []
    for raw in content.split("\n"):
        line = re.sub("#.*", "", raw).strip()
        if line and ":" in line:
            d, _, v = line.partition(":")
            rows.append((d.strip().lower(), v.strip()))
    rules: list[tuple[str, str]] = []
    group_is_star = False
    prev_was_ua = False
    for directive, value in rows:
        if directive == "user-agent":
            if not prev_was_ua:
                group_is_star = False  # a new header run starts a group
            group_is_star = group_is_star or value == "*"
            prev_was_ua = True
        else:
            prev_was_ua = False
            if directive in ("allow", "disallow") and value and group_is_star:
                rules.append((directive, value))
    return rules


def _pattern_py(rule_path: str) -> str:
    anchored = rule_path.endswith("$")
    body = rule_path[:-1] if anchored else rule_path
    esc = re.sub(_META, r"\\\1", body)
    return "^" + esc.replace("*", ".*") + ("$" if anchored else "")


def robots_allowed_py(
    path: str, rules: list[tuple[str, str]]
) -> tuple[bool, str, str]:
    """(allowed, rule, rule_path) — mirrors robots_verdicts' window pick."""
    matched = [
        (rule, rp)
        for rule, rp in rules
        if re.search(_pattern_py(rp), path)
    ]
    if not matched:
        return True, "none", ""
    rule, rp = max(
        matched, key=lambda m: (len(m[1]), m[0] == "allow", m[1])
    )
    return rule == "allow", rule, rp
