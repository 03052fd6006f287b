"""Charset-detect chain + body decode (SURVEY.md §2.3 U4).

Reference semantics (/root/reference/response.go:27-141), re-derived:
  precedence: forced session encoding
            > <head meta> — meta[charset] first, then
              meta[http-equiv='Content-Type'] content OVERRIDES it
            > Content-Type header `charset=` parameter
  Only the Japanese encodings are actively transformed
  (shift_jis / windows-31j / x-sjis / sjis / cp932 / shift-jis → Shift_JIS;
  euc-jp; iso-2022-jp — response.go:129-141); any other / missing charset
  passes the bytes through (they are treated as UTF-8 downstream).
  The charset= extraction regex is `.*\\bcharset=(.*)` (response.go:120-127).

The precedence resolution is pure Column logic (coalesce); only the byte
decode itself is a pandas UDF (Python codecs — vectorized per Arrow batch).
The caption-equality invariant (BASELINE.json input_hint) rides on this
decode being faithful.
"""

from __future__ import annotations

import codecs

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..charsets import CHARSET_RE as _CHARSET_RE
from ..charsets import JP_CODECS as _JP_CODECS


def charset_from_content_type(ct: Column) -> Column:
    return F.when(ct.rlike(_CHARSET_RE), F.regexp_extract(ct, _CHARSET_RE, 1))


def effective_charset(forced: Column, meta_charset: Column,
                      meta_http_equiv_ct: Column, header_ct: Column) -> Column:
    """Resolve the charset the decode will use (may be null ⇒ passthrough)."""
    head = F.coalesce(charset_from_content_type(meta_http_equiv_ct),
                      meta_charset)
    return F.coalesce(forced, head, charset_from_content_type(header_ct))


@pandas_udf(StringType())
def decode_body_udf(body: pd.Series, charset: pd.Series) -> pd.Series:
    """bytes + resolved charset → text. Unknown/missing charset ⇒ UTF-8
    (passthrough semantics); undecodable bytes ⇒ replacement chars (the
    dead-letter-not-exception policy)."""
    out = []
    for raw, cs in zip(body, charset):
        if raw is None:
            out.append(None)
            continue
        codec = _JP_CODECS.get((cs or "").strip().lower(), "utf-8")
        try:
            codecs.lookup(codec)
        except LookupError:
            codec = "utf-8"
        out.append(bytes(raw).decode(codec, errors="replace"))
    return pd.Series(out, dtype="object")


def decode_page(df, body_col: str = "body", forced_col: str | None = None,
                meta_charset_col: str | None = None,
                meta_http_equiv_col: str | None = None,
                header_ct_col: str | None = None, out: str = "text"):
    """Attach the decode-chain columns: effective_charset + decoded text."""
    def c(name):
        return F.col(name) if name else F.lit(None).cast("string")

    df = df.withColumn("effective_charset", effective_charset(
        c(forced_col), c(meta_charset_col), c(meta_http_equiv_col),
        c(header_ct_col)))
    return df.withColumn(
        out, decode_body_udf(F.col(body_col), F.col("effective_charset")))
