"""nth-of-type arithmetic — array indexing over element arrays (SURVEY.md §2.9).

The reference rewrites CSS `:nth-of-type(odd|even|An+B)` selectors into
per-slice-index absolute selectors because its browser backend can't hold a
DOM (/root/reference/chrome_unmarshal.go:16-101; test vectors
chrome_unmarshal_test.go:152-307). For a columnar engine the same semantics
are pure array arithmetic on a pre-projected element array. Semantics
re-derived from the cited functions:

  parse (parseNthOfTypeParam, :16-40): the LAST space-separated selector is
    matched against `(.*):nth-of-type\\((odd|even|(?:(\\d+)n)?\\+?(\\d+)?)\\)$`;
    odd → (2,1), even → (2,0), 'An+B' → (a,b) with unsigned ints only;
    no match → the selector passes through with (a,b)=(0,0).
  resolve (resolveNthOfType, :42-59), for 0-based slice index n → 1-based x:
    a==0 and b==0        → x = n+1    (plain selector: element n+1)
    a==0 or a==1         → x = b      (fixed index; 1n+b pins b)
    else, b<1 → b=a; x = n*a + b      (3n → 3,6,9,…)
  The rewrite ALWAYS appends `:nth-of-type(x)` to the last selector — even
  when the original had none.
  first-child/last-child selectors bypass rewriting (:75-86, :99-101);
  nth-child / nth-last-child / nth-last-of-type are REJECTED for slice
  fields at plan-build time (:61-73, :88-94) — here a ValueError, the
  build-time analog of the reference's error return.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_NTH_RE = re.compile(r"(.*):nth-of-type\((odd|even|(?:(\d+)n)?\+?(\d+)?)\)$")

_REJECTED = (":nth-child(", ":nth-last-child(", ":nth-last-of-type(")
_BYPASS = (":first-child", ":last-child")


def parse_nth_param(selector: str) -> tuple[str, int, int]:
    """selector → (prefix, a, b); no nth-of-type suffix → (selector, 0, 0)."""
    m = _NTH_RE.match(selector)
    if not m:
        return selector, 0, 0
    a = int(m.group(3)) if m.group(3) else 0
    b = int(m.group(4)) if m.group(4) else 0
    if m.group(2) == "even":
        a, b = 2, 0
    elif m.group(2) == "odd":
        a, b = 2, 1
    return m.group(1), a, b


def resolve_index(n: int, a: int, b: int) -> int:
    """1-based absolute index for 0-based slice element n."""
    if a == 0 and b == 0:
        return n + 1
    if a == 0 or a == 1:
        return b
    if b < 1:
        b = a
    return n * a + b


def rewrite_selector(selector: str, n: int) -> str:
    """Per-slice-index selector rewrite, with build-time validation."""
    for bad in _REJECTED:
        if bad in selector:
            raise ValueError(
                f"unsupported selector {selector!r} for slice fields. "
                "nth-child, nth-last-child, nth-last-of-type selectors are "
                "not supported for slice fields")
    if any(p in selector for p in _BYPASS):
        return selector
    parts = selector.split(" ")
    prefix, a, b = parse_nth_param(parts[-1])
    parts[-1] = prefix
    return f"{' '.join(parts)}:nth-of-type({resolve_index(n, a, b)})"


def nth_element(elements: Column, n: int, a: int, b: int) -> Column:
    """element_at for slice index n under an An+B selector (null if OOB) —
    the columnar form of the rewrite: the DOM query becomes array access."""
    idx = resolve_index(n, a, b)
    return F.when(F.size(elements) >= idx, F.element_at(elements, idx))


def nth_of_type_filter(elements: Column, a: int, b: int) -> Column:
    """All elements an An+B selector selects, as an array (set semantics)."""
    if a == 0 and b == 0:
        return elements
    if a == 0 or a == 1:
        return F.slice(elements, b, 1)  # [] when b is out of range
    bb = a if b < 1 else b
    return F.filter(elements,
                    lambda e, i: ((i + 1 >= bb)
                                  & ((i + 1 - bb) % a == 0)))
