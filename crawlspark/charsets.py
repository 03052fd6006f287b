"""Pure-Python charset tables shared by the decode-chain Column operators
(operators.charset), the page-parse kernel (operators.parse), and the
synthetic HTML renderer (synth) — no Spark imports here so the sequential
oracle side can use it too.

Reference semantics (/root/reference/response.go:120-141): only the three
Japanese encodings are actively transformed; matching is case-insensitive
over a fixed alias list; any other / missing charset passes bytes through
(treated as UTF-8 downstream). The charset= extraction regex is
``.*\\bcharset=(.*)`` (response.go:121).
"""

from __future__ import annotations

import re

#: lowercase charset alias -> Python codec (response.go:129-141)
JP_CODECS = {
    "shift_jis": "shift_jis", "windows-31j": "cp932", "x-sjis": "shift_jis",
    "sjis": "shift_jis", "cp932": "cp932", "shift-jis": "shift_jis",
    "euc-jp": "euc_jp", "iso-2022-jp": "iso2022_jp",
}

CHARSET_RE = r".*\bcharset=(.*)"
_CHARSET_CRE = re.compile(CHARSET_RE)


def charset_from_content_type(content_type: str | None) -> str | None:
    """`text/html; charset=X` -> `X` (the reference's exact regex,
    response.go:120-127); no charset parameter -> None."""
    if not content_type:
        return None
    m = _CHARSET_CRE.match(content_type)
    return m.group(1) if m else None


def codec_for(charset: str | None) -> str:
    """Resolved charset -> Python codec name; unknown/missing -> utf-8
    passthrough (the reference returns a nil Encoding, response.go:27-38)."""
    return JP_CODECS.get((charset or "").strip().lower(), "utf-8")
