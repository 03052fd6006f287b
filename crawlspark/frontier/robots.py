"""robots.txt parsing + REP matching, Spark-first.

The reference library has no robots support (verified in SURVEY.md — zero
hits for robots in non-test Go); the north rule adds "robots.txt rules +
crawl-delay budgets". This module implements the public Robots Exclusion
Protocol (RFC 9309 + the widely-documented Google REP extensions) at the
granularity a polite crawler needs:

  * user-agent groups, case-insensitive, most-specific product token wins
    ('*' is the fallback group); consecutive user-agent lines share a group
  * allow / disallow rules; empty disallow = allow everything
  * longest-match precedence; on equal length allow wins (RFC 9309 §2.2.2)
  * '*' wildcards and '$' end-anchor in rule paths
  * crawl-delay (non-standard but ubiquitous) in seconds, fractional ok

Two layers:
  1. Pure-Python `parse_robots` / `rule_allows` — unit-testable against the
     RFC examples, and the kernel of the vectorized parser.
  2. `robots_cache_from_bodies` — pandas-UDF over a DataFrame of raw
     robots.txt bodies → the engine's robots_cache row shape
     (host, rules array<struct<allow boolean, pattern string>>,
     crawl_delay_ms long). One Arrow batch per partition, no per-row
     Python dispatch at the DataFrame level.
  3. `rep_allowed_col(path, rules)` — a pure Column expression applying
     longest-match REP precedence executor-side (no UDF): per-path rule
     matching compiles to array filter/transform/max over the rules array.

The engine's hot path stays UDF-free: matching uses built-in higher-order
array functions; only PARSING (once per host, at cache build) runs Python.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# pure-Python kernel
# ---------------------------------------------------------------------------


def parse_robots(body: str, agent: str = "crawlspark") -> dict:
    """Parse a robots.txt body for ``agent``.

    Returns {"rules": [(allow: bool, pattern: str), ...],
             "crawl_delay_ms": int}.
    Group selection: the group whose user-agent token is the longest
    case-insensitive substring-prefix match of ``agent`` wins; '*' matches
    any agent with specificity 0; no matching group → empty rules.
    """
    agent_l = agent.lower()
    groups: list[dict] = []       # {"agents": [...], "rules": [...], "delay"}
    cur: dict | None = None
    last_was_agent = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur is None or not last_was_agent:
                cur = {"agents": [], "rules": [], "delay": None}
                groups.append(cur)
            cur["agents"].append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # rules before any user-agent line are ignored
        if key in ("allow", "disallow"):
            if val == "" and key == "disallow":
                continue  # empty disallow = allow all (no rule)
            cur["rules"].append((key == "allow", val))
        elif key == "crawl-delay":
            try:
                cur["delay"] = int(float(val) * 1000)
            except ValueError:
                pass

    # RFC 9309 §2.2.1: rules from ALL groups matching the agent at the
    # winning specificity are combined (e.g. two separate 'User-agent: *'
    # groups merge) — keeping only one group would silently drop disallow
    # rules in later duplicate groups. Specificity per group = best of its
    # agent tokens; winners = every group at the max specificity, merged in
    # document order; crawl-delay = first non-None among the winners.
    spec_of: list[int] = []
    for g in groups:
        spec = -1
        for a in g["agents"]:
            if a == "*":
                spec = max(spec, 0)
            elif a and a in agent_l:
                spec = max(spec, len(a))
        spec_of.append(spec)
    best_spec = max(spec_of, default=-1)
    if best_spec < 0:
        return {"rules": [], "crawl_delay_ms": 0}
    rules: list[tuple[bool, str]] = []
    delay = None
    for g, spec in zip(groups, spec_of):
        if spec != best_spec:
            continue
        rules.extend(g["rules"])
        if delay is None:
            delay = g["delay"]
    return {"rules": rules, "crawl_delay_ms": delay or 0}


def _pattern_to_regex(pattern: str) -> str:
    """REP rule path → anchored regex ('*' wildcard, '$' end anchor)."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in core)
    return "^" + rx + ("$" if anchored else "")


def rule_allows(path: str, rules: list[tuple[bool, str]]) -> bool:
    """Longest-match REP decision for ``path`` (True = fetch allowed)."""
    best_len, best_allow = -1, True
    for allow, pattern in rules:
        if re.match(_pattern_to_regex(pattern), path):
            ln = len(pattern)
            if ln > best_len or (ln == best_len and allow):
                best_len, best_allow = ln, allow
    return best_allow


# ---------------------------------------------------------------------------
# Spark layer
# ---------------------------------------------------------------------------

RULES_TYPE = "array<struct<allow:boolean,pattern:string>>"


def robots_cache_from_bodies(bodies: DataFrame, agent: str = "crawlspark"
                             ) -> DataFrame:
    """bodies(host string, body string) → robots_cache
    (host, rules array<struct<allow,pattern>>, crawl_delay_ms long).

    Parsing is the only Python step and runs once per HOST (the robots
    cache is a small dim table); a vectorized pandas UDF keeps it one
    Arrow batch per partition.
    """
    @F.pandas_udf(f"struct<rules:{RULES_TYPE},crawl_delay_ms:bigint>")
    def parse_udf(body: pd.Series) -> pd.DataFrame:
        out = body.map(lambda b: parse_robots(b, agent))
        return pd.DataFrame({
            "rules": out.map(
                lambda d: [{"allow": a, "pattern": p}
                           for a, p in d["rules"]]),
            "crawl_delay_ms": out.map(lambda d: d["crawl_delay_ms"]),
        })

    parsed = bodies.withColumn("_p", parse_udf(F.col("body")))
    return parsed.select("host", F.col("_p.rules").alias("rules"),
                         F.col("_p.crawl_delay_ms").alias("crawl_delay_ms"))


def _rule_matches(path_col, rule):
    """Column: does REP ``rule.pattern`` match ``path_col``? Pure exprs:
    no-wildcard patterns use startswith; wildcard/'$' patterns compile to
    an anchored regex via SQL string ops (escape, replace) + rlike."""
    pat = rule.getField("pattern")
    has_meta = pat.contains("*") | pat.endswith("$")
    # regex-quote every char class REP paths can contain, then re-open '*'
    # as '.*' and '$' (final only) as the anchor
    escaped = F.regexp_replace(pat, r"([.\^$+?()\[\]{}|\\])", r"\\$1")
    unstarred = F.regexp_replace(escaped, r"\*", ".*")
    # a trailing escaped \$ becomes the anchor
    anchored = F.regexp_replace(unstarred, r"\\\$$", r"\$")
    rx = F.concat(F.lit("^"), anchored)
    return F.when(has_meta, F.regexp_like(path_col, rx)) \
            .otherwise(path_col.startswith(pat))


def rep_allowed_col(path_col=None, rules_col=None):
    """Boolean Column: REP longest-match decision, executor-side, no UDF.

    matched = rules whose pattern matches the path; decision = allow-bit of
    the longest matched pattern, allow winning length ties (struct max over
    (length, allow)); no matched rule (or no rules row) → allowed.
    """
    path_col = path_col if path_col is not None else F.col("path")
    rules_col = rules_col if rules_col is not None else F.col("rules")
    matched = F.filter(rules_col, lambda r: _rule_matches(path_col, r))
    best = F.array_max(F.transform(
        matched, lambda r: F.struct(
            F.length(r.getField("pattern")).alias("l"),
            r.getField("allow").alias("a"))))
    return (rules_col.isNull() | (F.size(matched) == 0)
            | best.getField("a"))


def robots_sitemap_urls(body=None):
    """array<string>: the ``Sitemap:`` directive targets of a robots.txt
    body, in line order. RFC 9309 §2.2.4 carries them as "other records"
    outside any group: key case-insensitive, optional leading whitespace,
    value to the first whitespace/# — pure Column regexp per line, no UDF.
    Feed the result to frontier/sitemap.parse_sitemaps via the fetch loop
    (reference analog: the crawl discovering /sitemap.xml from robots).
    """
    body = body if body is not None else F.col("body")
    lines = F.split(body, "\r?\n")
    ex = F.transform(lines, lambda ln: F.regexp_extract(
        ln, r"(?i)^[ \t]*sitemap[ \t]*:[ \t]*([^ \t#]+)", 1))
    return F.filter(ex, lambda u: u != "")
