"""Crawler-trap detection: per-host URL-template explosion.

A crawl frontier's classic failure mode is the infinite URL space —
calendar pages, session-id permutations, faceted search — where one page
TEMPLATE generates unbounded distinct URLs (Heritrix calls these crawler
traps; the mitigation below is the standard path-signature heuristic, all
public crawl-engineering folklore). The reference never meets this (its
crawls are user-scripted, session.go FollowLink on explicit selectors);
a frontier operating at 10^10 URLs must rate-limit by template or hot
hosts fill the frontier with junk.

Detection is a pure aggregation: collapse every digit run in the path to
``N`` (one JVM regexp — the template), count distinct URLs per
(host, template), and flag templates whose URL count crosses a threshold.
ONE hash-aggregate shuffle on (host, template); partial aggregation
combines map-side, so the exchange carries one row per template per map
partition — at 100 TB the reduced table is tiny (templates, not URLs).
The flagged set is small by construction → broadcast back against the
frontier as an anti-join to suppress scheduling (same join shape as the
robots-disallow filter in engine insert)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def path_template(path) -> Column:
    """Digit runs → ``N``: /cal/2024/03/15 and /cal/1999/12/31 share the
    template /cal/N/N/N."""
    c = path if not isinstance(path, str) else F.col(path)
    return F.regexp_replace(c, "[0-9]+", "N")


def trap_report(urls: DataFrame, min_urls: int,
                host_col: str = "host", path_col: str = "path"
                ) -> DataFrame:
    """(host, template, n_urls, sample_path) for every per-host template
    whose distinct-URL count ≥ min_urls. ``sample_path`` (the minimum
    member) makes a flagged row actionable in triage."""
    return (urls
            .select(F.col(host_col).alias("host"),
                    path_template(F.col(path_col)).alias("template"),
                    F.col(path_col).alias("path"))
            .groupBy("host", "template")
            .agg(F.countDistinct("path").alias("n_urls"),
                 F.min("path").alias("sample_path"))
            .filter(F.col("n_urls") >= F.lit(int(min_urls))))


def trap_filter(frontier: DataFrame, flagged: DataFrame,
                host_col: str = "host", path_col: str = "path"
                ) -> DataFrame:
    """Drop frontier rows whose (host, template) is flagged. The flagged
    side is broadcast — it is O(templates), never O(URLs)."""
    keyed = frontier.withColumn("_tpl", path_template(F.col(path_col)))
    flg = flagged.select(F.col("host").alias("_fh"),
                         F.col("template").alias("_ftpl"))
    return (keyed.join(
        F.broadcast(flg),
        on=[keyed[host_col] == flg["_fh"], keyed["_tpl"] == flg["_ftpl"]],
        how="left_anti")
        .drop("_tpl"))
