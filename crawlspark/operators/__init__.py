"""Extraction operator library — the reference's unmarshal/form/charset
semantics re-expressed as Column expression builders (never per-row Python
unless genuinely unavoidable)."""

from . import charset, extract, forms, nth  # noqa: F401
