"""Full Public Suffix List semantics for registrable-domain (eTLD+1)
extraction: wildcard (``*.ck``) and exception (``!www.ck``) rules,
arbitrary suffix depth, standard publicsuffix.org file format.

``urltools.registrable_domain`` keeps the literal-IN fast path over the
common-suffix subset (zero-join, whole-stage codegen, the engine
default); this module is the documented swap for deployments that need
the REAL list: parse a publicsuffix.org dat file (vendored snapshot in
``psl_data.py``, attribution there) and resolve hosts with a cascade of
per-depth BROADCAST left equi-joins — no shuffle, no Python in the hot
path, and list-size-independent (a 10k-rule list is still a few hundred
KB broadcast).

Algorithm (publicsuffix.org/list "Formal algorithm"):

* a rule matches when the host's trailing labels equal the rule's
  labels (``*`` matches exactly one label);
* the prevailing rule is the matching exception rule if any, else the
  matching rule with the most labels, else ``*`` (the last label);
* an exception rule's public suffix drops the rule's leftmost label;
* registrable domain = public suffix plus one more host label; a host
  that IS a public suffix has none (NULL). IPv4 literals have none.

Reference parity: the Go reference's cookie jar
(/root/reference/session.go:67-110 — net/http cookiejar semantics)
enforces the same never-set-on-a-public-suffix rule this resolver feeds
in engine.py's cookie harvest (CrawlConfig.psl) and
oracle.apply_set_cookie (rd_fn).

Scale shape: the host side never shuffles — K broadcast hash joins
(K = deepest literal key in the list, 5 for the real PSL) against
per-depth slices of one tiny rules table, then a pure-Column
winner-selection cascade. The rules DataFrame is built once per
PslRules instance and reused across rounds/queries (crawl serial-
fraction discipline).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

_IPV4 = r"^\d+\.\d+\.\d+\.\d+$"


@dataclass(frozen=True)
class PslRule:
    """One parsed rule; ``labels`` excludes any leading ``*.`` / ``!``."""
    labels: tuple
    wildcard: bool
    exception: bool


class PslRules:
    """A parsed rule set + its cached per-depth Spark rules frame."""

    def __init__(self, rules: list[PslRule]):
        if not rules:
            raise ValueError("empty PSL rule set")
        self.rules = tuple(rules)
        self.max_key_len = max(len(r.labels) for r in rules)
        self._frame = None
        self._frame_session = None

    def frame(self, spark) -> DataFrame:
        """(key, key_len, has_exc, has_wild, has_norm) — one row per
        distinct literal key, the three rule flavors pre-merged so the
        per-depth joins stay 1:1. Built once per SparkSession and
        cached on the instance (a rules object outliving its session —
        stop/restart — gets a fresh frame, not a dead handle)."""
        if self._frame is None or self._frame_session is not spark:
            by_key: dict[str, list[bool]] = {}
            for r in self.rules:
                key = ".".join(r.labels)
                f = by_key.setdefault(key, [False, False, False])
                if r.exception:
                    f[0] = True
                elif r.wildcard:
                    f[1] = True
                else:
                    f[2] = True
            rows = [(k, len(k.split(".")), e, w, m)
                    for k, (e, w, m) in sorted(by_key.items())]
            self._frame = spark.createDataFrame(
                rows, "key string, key_len int, has_exc boolean, "
                      "has_wild boolean, has_norm boolean")
            self._frame_session = spark
        return self._frame


def parse_psl(text: str) -> PslRules:
    """Parse standard publicsuffix.org file format: ``//`` comments and
    blank lines skipped, first whitespace-separated token per line,
    ``!`` exception prefix, ``*.`` wildcard prefix, lowercased.

    The published list spells IDN rules in UNICODE (e.g. ``公司.cn``),
    while every host this engine resolves is already punycode/ACE
    (urltools idn_canonicalize) — so non-ASCII labels are IDNA-encoded
    at parse time (stdlib codec, RFC 3490) or the real file's IDN rules
    would silently never match."""
    rules = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        tok = line.split()[0].lower()
        exception = tok.startswith("!")
        if exception:
            tok = tok[1:]
        wildcard = tok.startswith("*.")
        if wildcard:
            tok = tok[2:]
        if not tok or "*" in tok or (exception and wildcard):
            # interior wildcards never occur in the published list; skip
            # loudly rather than mis-match
            raise ValueError(f"unsupported PSL rule: {line!r}")
        labels = []
        for lab in tok.split("."):
            if not lab.isascii():
                try:
                    lab = lab.encode("idna").decode("ascii")
                except UnicodeError as e:
                    raise ValueError(
                        f"un-encodable IDN PSL rule: {line!r}") from e
            labels.append(lab)
        rules.append(PslRule(tuple(labels), wildcard, exception))
    return PslRules(rules)


def load_psl(path: str | None = None) -> PslRules:
    """Load rules from a publicsuffix.org dat file, or the vendored
    snapshot (psl_data.PSL_SNAPSHOT) when ``path`` is None."""
    if path is None:
        from .psl_data import PSL_SNAPSHOT
        return parse_psl(PSL_SNAPSHOT)
    with open(path, encoding="utf-8") as f:
        return parse_psl(f.read())


def py_registrable_domain_psl(host: str | None,
                              rules: PslRules) -> str | None:
    """Pure-Python full-PSL matcher — the sequential oracle's twin of
    :func:`with_registrable_domain` (independent logic: a rule loop vs
    the join cascade). Same host normalization: lowercase, strip one
    trailing dot, IPv4 → None."""
    if host is None:
        return None
    h = host.lower()
    if h.endswith("."):
        h = h[:-1]
    if re.match(_IPV4, h):
        return None
    labels = h.split(".")
    n = len(labels)
    best = None  # (is_exception, rule_label_count, eff_suffix_len)
    for r in rules.rules:
        k = len(r.labels)
        if n < k or tuple(labels[n - k:]) != r.labels:
            continue
        if r.exception:
            cand = (1, k, k - 1)
        elif r.wildcard:
            if n <= k:
                continue
            cand = (0, k + 1, k + 1)
        else:
            cand = (0, k, k)
        if best is None or cand[:2] > best[:2]:
            best = cand
    eff = 1 if best is None else best[2]
    if n <= eff:
        return None
    return ".".join(labels[n - eff - 1:])


def with_registrable_domain(df: DataFrame, rules: PslRules,
                            host_col: str = "host",
                            out_col: str = "site") -> DataFrame:
    """Append ``out_col`` = full-PSL registrable domain of ``host_col``.

    One broadcast left equi-join per rule depth k = 1..max_key_len
    (each against the tiny per-depth slice of the rules frame — map-side
    only, no shuffle, no Python), then a pure-Column prevailing-rule
    cascade: candidates rank by (exception, rule-label-count) exactly as
    the spec's "exception wins, else most labels"; no match falls back
    to the prevailing-``*`` rule (eff = 1)."""
    spark = df.sparkSession
    rules_frame = rules.frame(spark)
    h = F.lower(F.regexp_replace(F.col(host_col), r"\.$", ""))
    df = (df.withColumn("_psl_labels", F.split(h, r"\."))
            .withColumn("_psl_n", F.size("_psl_labels")))
    tmp_cols = ["_psl_labels", "_psl_n"]
    cands = []
    for k in range(1, rules.max_key_len + 1):
        kt = (rules_frame.where(F.col("key_len") == k)
              .select(F.col("key").alias(f"_psl_k{k}"),
                      F.col("has_exc").alias(f"_psl_e{k}"),
                      F.col("has_wild").alias(f"_psl_w{k}"),
                      F.col("has_norm").alias(f"_psl_m{k}")))
        df = (df.withColumn(
                  f"_psl_c{k}",
                  F.when(F.col("_psl_n") >= k,
                         F.array_join(F.slice("_psl_labels", -k, k), ".")))
              .join(F.broadcast(kt),
                    F.col(f"_psl_c{k}") == F.col(f"_psl_k{k}"), "left"))
        tmp_cols += [f"_psl_c{k}", f"_psl_k{k}", f"_psl_e{k}",
                     f"_psl_w{k}", f"_psl_m{k}"]
        hit = lambda c: F.coalesce(c, F.lit(False))  # noqa: E731
        cands.append(
            F.when(hit(F.col(f"_psl_e{k}")),
                   F.struct(F.lit(1).alias("p"),
                            F.lit(k).alias("labels"),
                            F.lit(k - 1).alias("eff")))
             .when(hit(F.col(f"_psl_w{k}")) & (F.col("_psl_n") > k),
                   F.struct(F.lit(0).alias("p"),
                            F.lit(k + 1).alias("labels"),
                            F.lit(k + 1).alias("eff")))
             .when(hit(F.col(f"_psl_m{k}")),
                   F.struct(F.lit(0).alias("p"),
                            F.lit(k).alias("labels"),
                            F.lit(k).alias("eff"))))
    best = F.array_max(F.filter(F.array(*cands),
                                lambda c: c.isNotNull()))
    eff = F.coalesce(best["eff"], F.lit(1))
    site = F.when(h.rlike(_IPV4) | (F.col("_psl_n") <= eff),
                  F.lit(None).cast("string")).otherwise(
        F.array_join(F.slice("_psl_labels", (eff + 1) * -1, eff + 1),
                     "."))
    return df.withColumn(out_col, site).drop(*tmp_cols)
