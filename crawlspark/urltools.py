"""URL resolution + canonicalization — the key function of the URL-seen set.

Reference semantics being re-expressed (not ported):
  - relative-URL resolution against the page base: ``Page.ResolveLink``
    (/root/reference/page.go:34-40) = RFC-3986 join, here ``urljoin``.
  - ``<head base href>`` overrides the document URL as the base, and only when
    exactly one such element exists (/root/reference/response.go:86-94);
    callers pass ``coalesce(base_href, page_url)`` as ``base``.
  - meta-refresh targets are resolved against the same base
    (/root/reference/page.go:18-31).

The canonical normal form (engine + oracle share this exact definition —
crawl-order/URL-seen "exact match" in BASELINE.json depends on it):
  1. resolve ``url`` against ``base`` (RFC 3986)
  2. lowercase scheme and host
  3. drop the fragment
  4. drop default ports (http:80, https:443)
  5. empty path -> "/"
  6. query keys sorted (stable for duplicate keys, preserving their relative
     order), re-encoded as k=v&...; blank values kept
  7. fragment-only / empty hrefs resolve to the base itself — callers filter
     those out *before* enqueueing (a self-link is not a discovery)

Everything is pure-Python string work → executed as an Arrow-batched pandas
UDF (no per-row Python from Spark's perspective: one Python invocation per
~10k-row batch; the per-row loop is unavoidable because RFC-3986 resolution
has no Spark builtin, cf. SURVEY.md §2.8 C10).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit, parse_qsl, urlencode

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _canon_parts(url: str, base: str | None = None):
    """(canon, netloc, path) of the canonical form, or None for unusable
    hrefs. The single parse shared by canonicalize() and the fused UDF:
    netloc/path here are BY CONSTRUCTION identical to re-splitting the
    canon string (host_of/path_of), which the fused-vs-chained parity test
    pins."""
    if url is None:
        return None
    url = url.strip()
    if not url or url.startswith("#"):
        return None
    absolute = urljoin(base, url) if base else url
    try:
        parts = urlsplit(absolute)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    if not host.isascii():
        # IDN → punycode (RFC 3490, stdlib "idna" codec): the seen-set
        # key, politeness host, and robots lookup must all use the
        # ASCII-compatible form a resolver sees. Unencodable hosts are
        # unusable hrefs, same as a bad scheme.
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = parts.query
    if query:
        pairs = parse_qsl(query, keep_blank_values=True)
        pairs.sort(key=lambda kv: kv[0])  # stable → duplicate keys keep order
        query = urlencode(pairs)
    return urlunsplit((scheme, netloc, path, query, "")), netloc, path


def canonicalize(url: str, base: str | None = None) -> str | None:
    """Resolve ``url`` against ``base`` and return the canonical normal form.

    Returns None for unusable hrefs (empty, fragment-only, non-http(s)
    schemes like mailto:/javascript:) — callers drop those rows, mirroring
    the reference's attr-missing skip semantics (unmarshal.go:104-109).
    """
    p = _canon_parts(url, base)
    return None if p is None else p[0]


def host_of(canon: str) -> str:
    """Host (incl. non-default port) of an already-canonical URL."""
    return urlsplit(canon).netloc


def path_of(canon: str) -> str:
    """Path of an already-canonical URL (for robots prefix matching)."""
    return urlsplit(canon).path


@pandas_udf(StringType())
def canonicalize_udf(url: pd.Series, base: pd.Series) -> pd.Series:
    """Arrow-batched canonicalization: (href, base) -> canonical URL or null."""
    return pd.Series(
        [canonicalize(u, b) for u, b in zip(url, base)], dtype="object"
    )


@pandas_udf(StringType())
def host_udf(canon: pd.Series) -> pd.Series:
    return canon.map(lambda c: host_of(c) if c is not None else None)


@pandas_udf(StringType())
def path_udf(canon: pd.Series) -> pd.Series:
    return canon.map(lambda c: path_of(c) if c is not None else None)


# a DataType OBJECT, not a DDL string: module-level @pandas_udf with a DDL
# string needs an active SparkContext at import time (session.py gotcha)
_URL_PARTS_TYPE = StructType([StructField("canon", StringType()),
                              StructField("host", StringType()),
                              StructField("path", StringType())])


@pandas_udf(_URL_PARTS_TYPE)
def url_parts_udf(url: pd.Series, base: pd.Series) -> pd.DataFrame:
    """Fused (href, base) → struct(canon, host, path): ONE Arrow round-trip
    and ONE urlsplit where the chained canonicalize_udf → host_udf/path_udf
    pipeline paid three Python stages and re-parsed the canon string twice.
    This is the hot path of frontier expansion (O(k·fanout) rows/round).
    Unusable hrefs yield a null struct — filter on ``col.canon``."""
    rows = [_canon_parts(u, b) for u, b in zip(url, base)]
    return pd.DataFrame(
        [(None, None, None) if r is None else r for r in rows],
        columns=["canon", "host", "path"], dtype="object")


# The four kernels above are PURE functions, but they are registered
# nondeterministic on purpose: Catalyst inlines deterministic expressions
# through project/filter collapse, so the ubiquitous
#   .withColumn("_u", url_parts_udf(...)).filter(_u.canon.isNotNull())
# pattern compiled to TWO ArrowEvalPython stages — the kernel ran once for
# the filter and AGAIN for every downstream field extract, doubling the
# Arrow traffic on the engine's largest Python input (O(k·fanout)
# children/round). Nondeterministic expressions are pulled into ONE
# projection and never duplicated; since the functions are pure, retry
# semantics are unchanged. (Trade-off: unrelated filters cannot be pushed
# below the projection — every call site filters ON the kernel's output,
# so there is nothing to push.)
#
# CALLER CONTRACT (round-3 ADVICE): nondeterministic expressions are
# restricted to Project/Filter operators — using these UDFs directly
# inside a join condition, groupBy key, orderBy, or aggregate fails
# analysis. Materialize first (select/withColumn the kernel output into a
# named column, as with_canonical does), then join/group on that column.
# Every in-repo call site follows this pattern.
canonicalize_udf = canonicalize_udf.asNondeterministic()
host_udf = host_udf.asNondeterministic()
path_udf = path_udf.asNondeterministic()
url_parts_udf = url_parts_udf.asNondeterministic()


def with_canonical(df, url_col: str, base_col: str | None = None,
                   out: str = "canon"):
    """Attach canonical URL + url_hash + host + path columns.

    ``url_hash = xxhash64(canon)`` is computed JVM-side (codegen) — identical
    to the oracle's pure-Python xxh64 (crawlspark.hashing, verified in tests).
    """
    base = F.col(base_col) if base_col else F.lit(None).cast("string")
    df = df.withColumn("_u", url_parts_udf(F.col(url_col), base))
    return (
        df.withColumn(out, F.col("_u.canon"))
        .withColumn("url_hash", F.xxhash64(F.col(out)))
        .withColumn("host", F.col("_u.host"))
        .withColumn("path", F.col("_u.path"))
        .drop("_u")
    )


def surt_key(canon) -> "F.Column":
    """SURT (Sort-friendly URI Reordering Transform) key of a CANONICAL
    url — the CDX-index sort key of the web-archive toolchain (Heritrix /
    OpenWayback / CommonCrawl cdxj, public convention):

        http://www.example.com/p?b=2&a=1  →  com,example,www)/p?a=1&b=2

    scheme dropped, host labels reversed and comma-joined (so one host's —
    and one registrable domain's — captures sort adjacent), explicit
    non-default port kept after the reversed host, query params sorted
    bytewise. Input must already be in the canonical normal form above
    (lowercased host, default ports dropped, path non-empty) — this is a
    pure Column expression layered on it, zero Python, scan speed."""
    c = canon if not isinstance(canon, str) else F.col(canon)
    rest = F.regexp_replace(c, r"^[a-z][a-z0-9+.-]*://", "")
    hostport = F.substring_index(rest, "/", 1)
    pathq = F.substr(rest, F.length(hostport) + F.lit(1))
    host = F.substring_index(hostport, ":", 1)
    port = F.nullif(F.substr(hostport, F.length(host) + F.lit(2)),
                    F.lit(""))
    rhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.substring_index(pathq, "?", 1)
    query = F.nullif(F.substr(pathq, F.length(path) + F.lit(2)), F.lit(""))
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rhost,
        F.coalesce(F.concat(F.lit(":"), port), F.lit("")),
        F.lit(")"), path,
        F.coalesce(F.concat(F.lit("?"), sorted_q), F.lit("")))



#: static extension -> fetch-routing class (image pipeline vs HTML parse
#: vs bulk download), the scheduler signal available BEFORE any fetch
URL_CLASS_EXTS = {
    "image": ("jpg", "jpeg", "png", "gif", "webp", "bmp", "ico", "svg"),
    "media": ("mp4", "webm", "avi", "mp3", "ogg", "wav", "mov"),
    "doc": ("pdf", "doc", "docx", "ppt", "pptx", "xls", "xlsx"),
    "data": ("json", "xml", "csv", "rss", "atom", "gz", "zip", "warc"),
}


def url_feature_cols(url=None) -> dict:
    """Pure-Column crawl-prioritization features of a canonical URL:

      ext            lowercased final path extension (1-5 alnum), '' if none
      depth          non-empty path segments
      n_params       query parameters (0 for no query)
      n_digits       decimal digits in the path (the trap detector's
                     session-id/calendar smell, frontier/traps.py)
      path_len       path length in chars (ratio against n_digits stays
                     exact-integer on any engine)
      url_class      ext bucket: image/media/doc/data/page — routes a
                     fetch (image pipeline vs HTML parse) before any body
                     arrives

    All whole-stage-codegen string ops, zero Python — usable as an
    insert-time frontier projection at any scale. Returns a name->Column
    dict so callers select the subset they need.
    """
    from pyspark.sql import functions as F
    u = F.col(url) if isinstance(url, str) else (
        F.col("url") if url is None else url)
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,5})$", 1))
    depth = F.size(F.filter(F.split(path, "/"),
                            lambda s: s != "")).cast("int")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))).cast("int")
    n_digits = (F.length(path)
                - F.length(F.regexp_replace(path, "[0-9]", ""))).cast("int")
    klass = F.lit("page")
    for name, exts in reversed(URL_CLASS_EXTS.items()):
        klass = F.when(ext.isin(*exts), F.lit(name)).otherwise(klass)
    return {"ext": ext, "depth": depth, "n_params": n_params,
            "n_digits": n_digits,
            "path_len": F.length(path).cast("int"),
            "url_class": klass}


#: Registrable-domain suffix subset (public knowledge: the Mozilla Public
#: Suffix List's most common entries — publicsuffix.org, MPL-licensed
#: data). A deployment broadcasts the FULL list as a table; the grouping
#: algorithm below is list-size independent (longest-match over 1/2/3
#: label suffixes, unknown TLDs fall back to the prevailing-* rule =
#: last label). Kept small here so the driver oracle can carry the same
#: literal list.
PSL_SUBSET_2 = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk", "plc.uk",
    "net.uk", "sch.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.za", "org.za", "net.za", "web.za", "gov.za",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.my", "co.id", "co.th",
    # PSL private-domain section (same matching semantics)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "cloudfront.net", "appspot.com", "netlify.app", "vercel.app",
    "web.app", "pages.dev", "workers.dev", "wordpress.com",
)
PSL_SUBSET_3 = ("s3.amazonaws.com", "blogspot.co.uk")


def py_registrable_domain(host: str | None) -> str | None:
    """Pure-Python twin of :func:`registrable_domain` (bit-identical over
    the same PSL subset) — the sequential oracle's mirror for RFC 6265
    cookie Domain-attribute validation and for site rollups. Same
    semantics: a host that IS a public suffix / bare TLD / IPv4 literal
    → None; unknown TLD → prevailing-* rule (last label is the suffix)."""
    if host is None:
        return None
    import re as _re
    if _re.match(r"^\d+\.\d+\.\d+\.\d+$", host):
        return None
    labels = host.split(".")
    n = len(labels)
    if n >= 3 and ".".join(labels[-3:]) in PSL_SUBSET_3:
        return ".".join(labels[-4:]) if n > 3 else None
    if n >= 2 and ".".join(labels[-2:]) in PSL_SUBSET_2:
        return ".".join(labels[-3:]) if n > 2 else None
    return ".".join(labels[-2:]) if n > 1 else None


def registrable_domain(host=None) -> "F.Column":
    """eTLD+1 (PSL registrable domain) of a lowercased host — the
    per-SITE rollup key a crawler budgets and dedups by (host-level
    politeness under-counts: img1.cdn.example.co.uk and
    www.example.co.uk are one site).

    Longest-match over the suffix tiers, PSL semantics:
      * a host that IS a public suffix (or a bare TLD) → NULL;
      * unknown TLD → prevailing-* rule (the last label is the suffix);
      * IPv4 literals → NULL (no registrable domain).

    Pure Column expression (split + negative-index slice + literal IN
    lists), whole-stage codegen, zero Python — an insert-time frontier
    projection at any scale. For the FULL PSL a deployment swaps the IN
    lists for a broadcast join on the same candidate-suffix columns; the
    longest-match cascade is unchanged.
    """
    from pyspark.sql import functions as F
    h = F.col(host) if isinstance(host, str) else (
        F.col("host") if host is None else host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last = lambda k: F.array_join(F.slice(labels, -k, k), ".")  # noqa: E731
    s2, s3 = last(2), last(3)
    is_ip = h.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    return F.when(is_ip, F.lit(None).cast("string")).otherwise(
        F.when((n >= 3) & s3.isin(*PSL_SUBSET_3),
               F.when(n > 3, last(4)))
         .when((n >= 2) & s2.isin(*PSL_SUBSET_2),
               F.when(n > 2, last(3)))
         .otherwise(F.when(n > 1, last(2))))
