"""Tag-spec extraction operators → Column expressions (SURVEY.md §2.2/2.8).

Each builder re-derives the semantics of one reference operator from its
cited behavior and test vectors; none ports Go code. Errors become NULLs or
filtered rows (dead-letter rows, never exceptions) — the DataFrame analog of
the reference's error returns.

Operators:
  extract_number  — ExtractNumber (/root/reference/unmarshal.go:58-71,
                    vectors UNMARSHAL_REFERENCE.md:183-188): first
                    digits/commas(/decimals) group, strip comma + NBSP
                    (U+00A0) + ideographic space (U+3000), parse float;
                    unparseable → null (the reference errors).
  comma_int       — int path (/root/reference/unmarshal.go:254-264, vectors
                    unmarshal_test.go:77-123): trim, strip commas, integer
                    scan that REJECTS trailing garbage ("12abc" errors in Go
                    ⇒ null here, unlike a bare Spark cast which accepts
                    "12.5").
  comma_uint      — unsigned variant (/root/reference/unmarshal.go:266-276):
                    additionally rejects negatives.
  go_time         — time.ParseInLocation with a Go reference layout
                    (/root/reference/unmarshal.go:171-181; vectors
                    unmarshal_test.go:240-304). The Go layout is translated
                    to a JDK DateTimeFormatter pattern; Go's 12-hour "03"
                    with no AM/PM marker keeps the literal hour (12:34
                    parses to hour 12), so hour tokens map to HH/H when the
                    layout has no PM token.
  regex_capture   — `re` tag (/root/reference/unmarshal.go:116-130): exactly
                    one capture group (validated at BUILD time, mirroring
                    the reference's plan-time error), non-matching rows are
                    SKIPPED (use regex_matches to filter), matched rows
                    yield group 1.
  ignore_zero     — `ignore` tag (/root/reference/unmarshal.go:161-166,
                    vectors unmarshal_test.go:506-550): text equal to the
                    ignore literal produces the type's ZERO VALUE (0, "",
                    not null).
  attr_projection — attr text with missing-attr ⇒ row SKIPPED, not null
                    (/root/reference/unmarshal.go:104-109).
  text/html       — text vs inner-HTML projection; `html` overrides `attr`
                    (/root/reference/unmarshal.go:95-102).
  exactly_one     — scalar-cardinality assertion `length(n) != 1`
                    (/root/reference/unmarshal.go:157-159); emits an error
                    column instead of raising.
  anchor_text_match — FollowAnchorText selection: anchor text equals target
                    (optionally trimmed) OR a child img[alt] equals it
                    (/root/reference/session.go:399-427).
  meta_refresh_url — content attr → `(?i)url=(.*)$` capture
                    (/root/reference/page.go:18-31).
  charset_of_content_type — `.*\\bcharset=(.*)` (/root/reference/response.go:120-127).
  glob_to_regex   — filepath.Match glob → anchored regex
                    (/root/reference/chrome.go:363,442,487).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

NBSP = " "
IDEOGRAPHIC_SPACE = "　"

_NUMBER_RE = r"([0-9, 　]+([.][0-9]*)?)"


def extract_number(c: Column) -> Column:
    """First number in the string → double; none → null.

    "￥1,234.56円" → 1234.56, "$12.34 USD" → 12.34, "1 234円" (NBSP) → 1234,
    "test" → null.
    """
    grabbed = F.regexp_extract(c, _NUMBER_RE, 1)
    cleaned = F.translate(grabbed, "," + NBSP + IDEOGRAPHIC_SPACE, "")
    return F.when(grabbed != "", cleaned.cast("double"))


def comma_int(c: Column) -> Column:
    """'123,456' → 123456L; trailing garbage / decimals → null (Go %d errors)."""
    stripped = F.regexp_replace(F.trim(c), ",", "")
    return F.when(stripped.rlike(r"^[+-]?[0-9]+$"), stripped.cast("long"))


def comma_uint(c: Column) -> Column:
    stripped = F.regexp_replace(F.trim(c), ",", "")
    return F.when(stripped.rlike(r"^\+?[0-9]+$"), stripped.cast("long"))


# Go reference-layout token → JDK pattern. Longest tokens first (the
# translator scans greedily); see go_time docstring for the 03→HH choice.
_GO_TOKENS = [
    ("2006", "yyyy"), ("January", "MMMM"), ("Jan", "MMM"),
    ("Monday", "EEEE"), ("Mon", "EEE"),
    ("15", "HH"), ("03", "HH12"), ("3", "H12"),
    ("04", "mm"), ("4", "m"), ("05", "ss"), ("5", "s"),
    ("01", "MM"), ("1", "M"), ("02", "dd"), ("2", "d"),
    ("PM", "a"), ("pm", "a"),
    ("-0700", "Z"), ("Z07:00", "XXX"), ("MST", "zzz"),
    (".000", ".SSS"),
]


def go_layout_to_jdk(layout: str) -> str:
    """Translate a Go reference layout ('2006/1/2 03:04') to a JDK pattern."""
    has_pm = "PM" in layout or "pm" in layout
    out = []
    i = 0
    while i < len(layout):
        for tok, jdk in _GO_TOKENS:
            if layout.startswith(tok, i):
                if jdk == "HH12":
                    jdk = "hh" if has_pm else "HH"
                elif jdk == "H12":
                    jdk = "h" if has_pm else "H"
                out.append(jdk)
                i += len(tok)
                break
        else:
            ch = layout[i]
            # JDK patterns treat letters as pattern chars — quote them.
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def go_time(c: Column, layout: str) -> Column:
    """Parse with a Go layout; unparseable → null (reference errors)."""
    return F.try_to_timestamp(c, F.lit(go_layout_to_jdk(layout)))


def validate_capture_re(pattern: str) -> None:
    """Build-time check: `re` must contain exactly one capture group —
    mirrors the reference's error (unmarshal.go:122-128)."""
    n = _re.compile(pattern).groups
    if n != 1:
        raise ValueError(f"re must contain exactly 1 capture group, got {n}")


def regex_matches(c: Column, pattern: str) -> Column:
    """Row-skip predicate for regex_capture (0 matches ⇒ skip row)."""
    validate_capture_re(pattern)
    return c.rlike(pattern)


def regex_capture(c: Column, pattern: str) -> Column:
    validate_capture_re(pattern)
    return F.when(c.rlike(pattern), F.regexp_extract(c, pattern, 1))


def ignore_zero(c: Column, ignore: str, zero=""):
    """Text equal to the ignore literal → the type's ZERO value (not null)."""
    return F.when(c == F.lit(ignore), F.lit(zero)).otherwise(c)


def attr_projection(elem: Column, attr: str) -> Column:
    """element.attrs[attr]; pair with `.filter(col.isNotNull())` — missing
    attr skips the row (unmarshal.go:104-109), it does not produce null."""
    return elem.getField("attrs").getItem(attr)


def exactly_one(matches: Column) -> Column:
    """Error column for the `length(n) != 1` cardinality contract."""
    n = F.size(matches)
    return F.when(n != 1, F.concat(F.lit("length("), n.cast("string"),
                                   F.lit(") != 1")))


def anchor_text_match(text: Column, img_alt: Column, target: str,
                      trim_space: bool = False) -> Column:
    t = F.trim(text) if trim_space else text
    return (t == F.lit(target)) | (img_alt == F.lit(target))


def meta_refresh_url(content: Column) -> Column:
    """meta[http-equiv=refresh] content → target URL (case-insensitive)."""
    pat = r"(?i)url=(.*)$"
    return F.when(content.rlike(pat), F.regexp_extract(content, pat, 1))


def charset_of_content_type(ct: Column) -> Column:
    pat = r".*\bcharset=(.*)"
    return F.when(ct.rlike(pat), F.regexp_extract(ct, pat, 1))


def glob_to_regex(glob: str) -> str:
    """filepath.Match-style glob → anchored Java regex ('*.csv' → '^[^/]*\\.csv$')."""
    out = ["^"]
    i = 0
    while i < len(glob):
        ch = glob[i]
        if ch == "*":
            out.append("[^/]*")
        elif ch == "?":
            out.append("[^/]")
        elif ch == "[":
            j = glob.index("]", i)
            out.append(glob[i : j + 1])
            i = j
        else:
            out.append(_re.escape(ch))
        i += 1
    out.append("$")
    return "".join(out)


def name_from_selector(c: Column) -> Column:
    """P11 — extractNameFromSelector (/root/reference/session.go:693-703):
    pull the ``name`` attribute out of a CSS selector string
    (``input[name=username]`` → ``username``, ``[name="password"]`` →
    ``password``); no ``[name=...]`` part → "" (the reference's zero
    value). Pure Column expression (regexp_extract yields "" on no match,
    matching Go's FindStringSubmatch-empty branch)."""
    return F.regexp_extract(c, "\\[name=[\"']?([^\"'\\]]+)[\"']?\\]", 1)
