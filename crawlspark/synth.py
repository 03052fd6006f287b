"""Deterministic synthetic tables (FIXTURES.md; seed=42, no external data).

Every generator is a pure function of (seed, row index) — no wall-clock, no
shared RNG state — so Spark-distributed generation (``spark.range`` →
``mapInPandas``) and plain-Python generation produce byte-identical tables.
The crawl-order golden tests feed the *same* generated tables to both the
PySpark engine and the sequential oracle (crawlspark.oracle).

Tables (FIXTURES.md §§1-3):
  images(image_id, bytes, w, h, fmt, caption, phash)      — input_hint shape
  pages(url, host, base_href, meta_refresh_url, links, image_id, status)
  robots(host, disallow_prefixes, crawl_delay_ms)
  seeds(url, seed_pos)

Tiers (FIXTURES.md §6): t1 smoke 1k/2k/8 hosts; t2 correctness 20k/50k/64
hosts (one hot host owns 90%); bench 2M/5M/1024. At the bench tier image
``bytes`` are not materialized (null) — a real crawl receives bytes at fetch
time, so the fetch stage synthesizes them from image_id via the same pure
function (crawlspark.imaging.make_pixels) when validation samples a row.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .hashing import xxh64
from .imaging import encode, make_pixels, phash64

SEED = 42

_JP_TOKENS = ["日本語", "テスト", "画像", "見出し", "説明文"]
_TOKENS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
           "theta", "iota", "kappa"]


def _h(*parts: int) -> int:
    """Deterministic 64-bit mix of integer parts (pure, order-sensitive)."""
    acc = SEED
    for p in parts:
        acc = xxh64(int(p).to_bytes(8, "little", signed=False), acc & 0xFFFF)
    return acc


@dataclass(frozen=True)
class Tier:
    name: str
    n_images: int
    n_pages: int
    n_hosts: int
    hot_host: bool          # host0 owns 90% of pages
    materialize_bytes: bool


TIERS = {
    "t1": Tier("t1", 1_000, 2_000, 8, False, True),
    "t2": Tier("t2", 20_000, 50_000, 64, True, True),
    "bench": Tier("bench", 2_000_000, 5_000_000, 1024, True, False),
}


# --- images ------------------------------------------------------------------

def gen_caption(i: int) -> str:
    toks = [_TOKENS[_h(i, 7, j) % len(_TOKENS)] for j in range(4)]
    cap = f"caption {i} " + " ".join(toks)
    if _h(i, 8) % 10 == 0:  # ~10%: NBSP + ideographic space + Japanese
        jp = _JP_TOKENS[_h(i, 9) % len(_JP_TOKENS)]
        cap += f" {jp}　¥{(i % 900) + 100},{(i % 90) * 11:02d}0円"
    return cap


def gen_image_row(i: int, materialize_bytes: bool = True) -> dict:
    w = 32 + (i % 7) * 16
    h = 32 + (i % 5) * 16
    fmt = "png" if i % 3 else "jpeg"
    # ~1% duplicated pixel content across row pairs (phash-dedup fodder):
    # rows with i % 101 == 100 reuse the pixels of i-1.
    src = i - 1 if (i % 101 == 100 and i > 0) else i
    if src != i:
        w = 32 + (src % 7) * 16
        h = 32 + (src % 5) * 16
    px = make_pixels(src, w, h)
    return {
        "image_id": f"img{i:010d}",
        "bytes": encode(px, fmt) if materialize_bytes else None,
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": gen_caption(i),
        "phash": np.int64(phash64(px)),
    }


def gen_images_pdf(lo: int, hi: int, materialize_bytes: bool = True
                   ) -> pd.DataFrame:
    return pd.DataFrame([gen_image_row(i, materialize_bytes)
                         for i in range(lo, hi)])


# --- web graph ---------------------------------------------------------------

def page_counts(tier: Tier) -> list[int]:
    """Pages per host; host0 hot (90%) when tier.hot_host."""
    if not tier.hot_host:
        base = tier.n_pages // tier.n_hosts
        counts = [base] * tier.n_hosts
        counts[0] += tier.n_pages - base * tier.n_hosts
        return counts
    hot = int(tier.n_pages * 0.9)
    rest = tier.n_pages - hot
    base = rest // (tier.n_hosts - 1)
    counts = [hot] + [base] * (tier.n_hosts - 1)
    counts[1] += rest - base * (tier.n_hosts - 1)
    return counts


def page_url(h: int, k: int) -> str:
    return f"http://host{h}.test/p/{k}"


def _link_href(h: int, k: int, j: int, counts: list[int]) -> tuple[str, str]:
    """(href, resolved canonical target) for link j of page (h, k).

    href forms mix absolute/relative/fragment/uppercase/port-80/query to
    exercise canonicalization; duplicates arise naturally from the modular
    target choice (seen-set fodder).
    """
    hv = _h(h, k, j, 1)
    cross = hv % 5 == 0  # ~20% cross-host
    th = (h + (hv % (len(counts) - 1)) + 1) % len(counts) if cross else h
    tk = (k * 7 + j * 13 + 1 + (hv % 11)) % max(counts[th], 1)
    target = page_url(th, tk)
    v = _h(h, k, j, 2) % 8
    if v == 0:
        href = target
    elif v == 1 and not cross:
        href = f"/p/{tk}"
    elif v == 2 and not cross:
        href = f"../p/{tk}"
    elif v == 3:
        href = target + "#frag"
    elif v == 4:
        href = f"http://host{th}.test:80/p/{tk}"
    elif v == 5:
        href = f"HTTP://HOST{th}.TEST/p/{tk}"
    elif v == 6:
        href = target + "?b=2&a=1"
        target = target + "?a=1&b=2"  # canonical: sorted query
    else:
        href = "#top"  # fragment-only -> dropped by canonicalization
        target = ""
    return href, target


#: declared-charset spellings per codec family (exercises the reference's
#: case-insensitive alias table, response.go:129-141)
_SJIS_NAMES = ["Shift_JIS", "shift-jis", "x-sjis", "sjis", "cp932",
               "windows-31j"]
_EUC_NAMES = ["EUC-JP", "euc-jp"]
_ISO_NAMES = ["ISO-2022-JP", "iso-2022-jp"]


def page_charset_decl(h: int, k: int) -> tuple[str | None, str, str]:
    """(declared_charset, channel, python_codec) for page (h, k).

    channel ∈ {meta_charset, http_equiv, header, none} — the three
    precedence sources of the U4 decode chain (response.go:27-38, 106-127)
    plus undeclared (UTF-8 passthrough). ~30% of pages are Japanese-encoded.
    """
    v = _h(h, k, 20) % 10
    if v == 0:
        name = _SJIS_NAMES[_h(h, k, 22) % len(_SJIS_NAMES)]
        codec = {"cp932": "cp932", "windows-31j": "cp932"}.get(
            name.lower(), "shift_jis")
    elif v == 1:
        name, codec = _EUC_NAMES[_h(h, k, 22) % 2], "euc_jp"
    elif v == 2:
        name, codec = _ISO_NAMES[_h(h, k, 22) % 2], "iso2022_jp"
    else:
        if _h(h, k, 21) % 2 == 0:
            return None, "none", "utf-8"
        name, codec = ("utf-8", "utf-8") if _h(h, k, 22) % 2 else \
                      ("UTF-8", "utf-8")
    channel = ["meta_charset", "http_equiv", "header"][_h(h, k, 21) % 3]
    return name, channel, codec


def gen_page_title(h: int, k: int) -> str:
    tok = _TOKENS[_h(h, k, 23) % len(_TOKENS)]
    title = f"Page {k} of host{h} - {tok}"
    _, _, codec = page_charset_decl(h, k)
    if codec != "utf-8" or _h(h, k, 24) % 5 == 0:
        title += " " + _JP_TOKENS[_h(h, k, 25) % len(_JP_TOKENS)]
    return title


def gen_cookie_cols(h: int, k: int, status: int) -> tuple:
    """Deterministic cookie behavior for page (h, k) — the Session cookie-jar
    analog (reference: /root/reference/session.go:67-110, a cookiejar on the
    HTTP client so cookies set by one response ride on every later request).

    Returns (set_cookies, require_cookie):
      * set_cookies: ~1/6 of 2xx pages set the host session cookie
        ``sess=tok<h>`` (a Set-Cookie response header, modeled out-of-band
        of the body like the real header channel). RFC 6265 attribute
        variants (round-4): ~1/8 of setters use a dot-form Domain
        (normalizes + rides subdomain scope), ~1/8 set a path-scoped
        cookie (rides only its path subtree), ~1/8 are short-lived
        (Max-Age = 1 round), ~1/8 carry an INVALID Domain not covering
        the host (must be ignored by jar and oracle alike);
      * require_cookie: ~3/16 of pages are GATED — served only when the
        request carries a satisfying cookie, else the fetch is a 403.
        Encodes ``name=value`` (exact match) or bare ``name`` (presence).
    """
    set_cookies = None
    if status == 200 and _h(h, k, 40) % 6 == 0:
        cv = _h(h, k, 42) % 8
        c = {"name": "sess", "value": f"tok{h}", "domain": None,
             "path": None, "max_age": None}
        if cv == 1:
            c["domain"] = f".host{h}.test"     # dot form, valid scope
        elif cv == 2:
            c = {"name": "psc", "value": f"pv{h}",
                 "domain": None, "path": f"/p/{k}", "max_age": None}
        elif cv == 3:
            c["max_age"] = 1                   # rides next round only
        elif cv == 4:
            c["domain"] = "other.test"         # invalid: ignored
        set_cookies = [c]
    rv = _h(h, k, 41) % 16
    require = (f"sess=tok{h}" if rv == 0
               else "sess" if rv == 8
               else f"psc=pv{h}" if rv == 4 else None)
    return set_cookies, require


def gen_page_row(h: int, k: int, counts: list[int], n_images: int,
                 global_idx: int, cookies: bool = False) -> dict:
    hv = _h(h, k, 3)
    status = 200 if hv % 25 else (404 if hv % 2 else 500)  # ~96% 2xx
    degree = _h(h, k, 4) % 9  # 0..8 out-links
    links = []
    for j in range(degree):
        href, _ = _link_href(h, k, j, counts)
        tv = _h(h, k, j, 5)
        links.append({
            "href": href,
            "text": f"link {j}" if tv % 3 else f"goto p{j}",
            "img_alt": f"thumb {j}" if tv % 4 == 0 else None,
            "pos": np.int32(j),
        })
    base_href = (f"http://host{h}.test/sub/dir/"
                 if _h(h, k, 6) % 20 == 0 else None)  # ~5%
    refresh = None
    if _h(h, k, 7) % 33 == 0:  # ~3%
        rk = (k + 1) % max(counts[h], 1)
        refresh = (f"/p/{rk}" if _h(h, k, 8) % 2 else page_url(h, rk))
    form_action, form_inputs = gen_page_form(h, k, status)
    row = {
        "url": page_url(h, k),
        "host": f"host{h}.test",
        "base_href": base_href,
        "meta_refresh_url": refresh,
        "links": links,
        "title": gen_page_title(h, k),
        "image_id": (f"img{(global_idx * 2654435761) % n_images:010d}"
                     if status == 200 else None),
        "status": np.int32(status),
        "form_action": form_action,
        # `is not None`, NOT truthiness: action="" is a legal form
        "form_method": "get" if form_action is not None else None,
        "form_inputs": form_inputs,
    }
    if cookies:
        row["set_cookies"], row["require_cookie"] = gen_cookie_cols(
            h, k, status)
    return row


def gen_page_form(h: int, k: int, status: int):
    """~10% of 2xx pages carry ONE GET form (the crawl auto-submit target,
    S3 — /root/reference/form.go:338-401). Elements exercise the F1-F4
    defaulting matrix: text value, a radio group (second-checked / none ⇒
    first wins), a select (selected / first, plus a valueless decoy
    option), a checkbox that only contributes when checked. Two edge
    shapes the round-3 goldens had a hole at (VERDICT #3): an empty
    action="" (legal submit-to-current-URL form) and a MIXED-TYPE name
    group (per-element ranking decides, not the first element's type)."""
    if status != 200 or _h(h, k, 30) % 10 != 0:
        return None, None
    fv = _h(h, k, 31)
    action = ("" if fv % 7 == 2 else
              f"/search/{k % 5}" if fv % 3 else
              f"http://host{h}.test/find")
    inputs = [
        {"name": "q", "type": None, "value": f"t{k % 97}",
         "checked": False, "selected": False, "pos": 0},
        {"name": "mode", "type": "radio", "value": "a",
         "checked": False, "selected": False, "pos": 1},
        {"name": "mode", "type": "radio", "value": "b",
         "checked": fv % 4 == 0, "selected": False, "pos": 2},
        {"name": "cat", "type": "select", "value": None,   # valueless decoy
         "checked": False, "selected": False, "pos": 3},
        {"name": "cat", "type": "select", "value": "c1",
         "checked": False, "selected": False, "pos": 4},
        {"name": "cat", "type": "select", "value": "c2",
         "checked": False, "selected": fv % 5 == 0, "pos": 5},
    ]
    if fv % 2 == 0:
        inputs.append({"name": "flag", "type": "checkbox", "value": "yes",
                       "checked": fv % 8 == 0, "selected": False, "pos": 6})
    if fv % 5 == 1:
        # mixed-type name group: a checkbox sharing the text input's name
        # "q" — when checked (rank 0) it beats the earlier text default
        # (rank 1); unchecked (rank 2) the text value stands
        inputs.append({"name": "q", "type": "checkbox",
                       "value": f"qq{k % 7}", "checked": fv % 2 == 0,
                       "selected": False, "pos": inputs[-1]["pos"] + 1})
    # nameless submit button: parsed but contributes no param
    inputs.append({"name": None, "type": "submit", "value": "go",
                   "checked": False, "selected": False,
                   "pos": inputs[-1]["pos"] + 1})
    return action, inputs


def render_page_html(h: int, k: int, counts: list[int]) -> tuple[bytes, str]:
    """(body_bytes, content_type) for page (h, k): real HTML whose parse
    (operators.parse.parse_page) round-trips EXACTLY to gen_page_row's
    structured fields (the golden-oracle contract for the raw-body path —
    pinned by tests/test_parse.py over every t1 page).

    Structure exercised: charset declared via all three precedence channels
    (or undeclared), decoy first <meta> (the goquery first-element Attr
    semantics), double-<base> edge (≠1 ⇒ ignored), href-less anchors
    (skipped), entity-escaped hrefs, case-varied url= in meta refresh."""
    from html import escape

    row = gen_page_row(h, k, counts, 1, 0)  # image/global idx irrelevant here
    declared, channel, codec = page_charset_decl(h, k)

    head = []
    if channel != "meta_charset" and _h(h, k, 26) % 2 == 0:
        # decoy FIRST meta without a charset attr: the head-sniff must not
        # find a charset on it (goquery Attr reads the first element only)
        head.append('<meta name="generator" content="crawlspark-synth">')
    if channel == "meta_charset":
        head.append(f'<meta charset="{declared}">')
    elif channel == "http_equiv":
        head.append('<meta http-equiv="Content-Type" '
                    f'content="text/html; charset={declared}">')
    if row["base_href"]:
        head.append(f'<base href="{escape(row["base_href"], quote=True)}">')
    elif _h(h, k, 27) % 50 == 0:
        # two <base> tags: Length()!=1 ⇒ no override (response.go:86-94)
        head.append('<base href="/wrong/a/"><base href="/wrong/b/">')
    head.append(f'<title>{escape(row["title"])}</title>')
    if row["meta_refresh_url"]:
        u = "URL" if _h(h, k, 28) % 2 else "url"
        head.append('<meta http-equiv="refresh" content="5; '
                    f'{u}={escape(row["meta_refresh_url"], quote=True)}">')

    body = [f'<h1>{escape(row["title"])}</h1>',
            f'<p>synthetic page body for {escape(row["url"])}</p>']
    if _h(h, k, 29) % 7 == 0:
        body.append(f'<a name="s{k}">section anchor without href</a>')
    body.append("<ul>")
    for ln in row["links"]:
        img = (f'<img src="/t/{ln["pos"]}.png" '
               f'alt="{escape(ln["img_alt"], quote=True)}">'
               if ln["img_alt"] is not None else "")
        body.append(f'<li><a href="{escape(ln["href"], quote=True)}">'
                    f'{escape(ln["text"])}{img}</a></li>')
    body.append("</ul>")

    if row["form_action"] is not None:   # action="" still renders a form
        body.append(f'<form action="{escape(row["form_action"], quote=True)}"'
                    ' method="get">')
        in_select = False
        for el in row["form_inputs"]:
            if el["type"] == "select":
                if not in_select:
                    body.append(f'<select name="{el["name"]}">')
                    in_select = True
                val = ('' if el["value"] is None
                       else f' value="{escape(el["value"], quote=True)}"')
                sel = " selected" if el["selected"] else ""
                body.append(f'<option{val}{sel}>opt {el["pos"]}</option>')
            else:
                if in_select:
                    body.append("</select>")
                    in_select = False
                nm = (f' name="{el["name"]}"' if el["name"] is not None
                      else "")
                typ = f' type="{el["type"]}"' if el["type"] else ""
                chk = " checked" if el["checked"] else ""
                body.append(f'<input{nm}{typ} '
                            f'value="{escape(el["value"], quote=True)}"{chk}>')
        if in_select:
            body.append("</select>")
        body.append("</form>")

    html = ("<!DOCTYPE html>\n<html>\n<head>\n" + "\n".join(head)
            + "\n</head>\n<body>\n" + "\n".join(body) + "\n</body>\n</html>\n")
    content_type = (f"text/html; charset={declared}"
                    if channel == "header" else "text/html")
    return html.encode(codec), content_type


def gen_raw_pages_pdf(lo: int, hi: int, counts: list[int], n_images: int,
                      cookies: bool = False) -> pd.DataFrame:
    """Raw-body page corpus rows (url, host, body, content_type, image_id,
    status): fetch-level fields stay structured (they model the HTTP
    response envelope); the page content is real HTML bytes. Cookie columns
    (when ``cookies``) also stay structured — Set-Cookie and the gate are
    HEADER-channel facts, out-of-band of the body."""
    starts = page_index_bounds(counts)
    rows = []
    for g in range(lo, hi):
        h, k = locate_page(g, starts)
        row = gen_page_row(h, k, counts, n_images, g, cookies=cookies)
        body, ct = render_page_html(h, k, counts)
        out = {
            "url": row["url"], "host": row["host"], "body": body,
            "content_type": ct, "image_id": row["image_id"],
            "status": row["status"],
        }
        if cookies:
            out["set_cookies"] = row["set_cookies"]
            out["require_cookie"] = row["require_cookie"]
        rows.append(out)
    return pd.DataFrame(rows)


def page_index_bounds(counts: list[int]) -> list[int]:
    """Cumulative start index per host (global page index space)."""
    starts = [0]
    for c in counts:
        starts.append(starts[-1] + c)
    return starts


def locate_page(g: int, starts: list[int]) -> tuple[int, int]:
    """Global page index -> (host, k). starts from page_index_bounds."""
    import bisect

    h = bisect.bisect_right(starts, g) - 1
    return h, g - starts[h]


def gen_pages_pdf(lo: int, hi: int, counts: list[int], n_images: int,
                  cookies: bool = False) -> pd.DataFrame:
    starts = page_index_bounds(counts)
    rows = []
    for g in range(lo, hi):
        h, k = locate_page(g, starts)
        rows.append(gen_page_row(h, k, counts, n_images, g, cookies=cookies))
    return pd.DataFrame(rows)


# --- audio (real WAV corpus) --------------------------------------------------

AUDIO_RATES = [8000, 16000, 22050]
AUDIO_BITS = [8, 16, 24, 32]


def gen_audio_signal(i: int):
    """Ground-truth float64 samples for audio clip ``i`` (pure function):
    two sinusoids + a linear fade, mono or stereo. Returns
    (x (n, ch), rate, bits, float_pcm) — the encode parameters the WAV
    corpus row uses, so oracles can re-derive features codec-free."""
    h = _h(i, 50)
    n = 800 + (h % 5) * 400
    rate = AUDIO_RATES[_h(i, 51) % len(AUDIO_RATES)]
    ch = 1 + (_h(i, 52) % 2)
    f1 = 110.0 + (h % 37) * 13.0
    f2 = 430.0 + (_h(i, 53) % 29) * 17.0
    t = np.arange(n, dtype=np.float64) / rate
    fade = np.linspace(1.0, 0.25, n)
    base = 0.6 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(
        2 * np.pi * f2 * t)
    x = np.stack([base * fade] + (
        [0.5 * np.sin(2 * np.pi * (f1 * 1.5) * t) * fade] if ch == 2
        else []), axis=1)
    float_pcm = _h(i, 54) % 5 == 0
    bits = 32 if float_pcm else AUDIO_BITS[_h(i, 55) % len(AUDIO_BITS)]
    return x, rate, bits, float_pcm


def gen_audio_pdf(lo: int, hi: int) -> pd.DataFrame:
    """Real-WAV media rows (media_id, kind, bytes, fmt, meta) covering
    8/16/24/32-bit integer PCM and IEEE-float32, mono and stereo."""
    from .audiocodec import wav_encode

    rows = []
    for i in range(lo, hi):
        x, rate, bits, float_pcm = gen_audio_signal(i)
        rows.append({
            "media_id": f"aud{i:06d}", "kind": "audio",
            "bytes": wav_encode(x, rate, bits, float_pcm=float_pcm),
            "fmt": "wav",
            "meta": {"rate": str(rate), "bits": str(bits),
                     "float": str(int(float_pcm))},
        })
    return pd.DataFrame(rows)


# --- video (real AVI corpus) --------------------------------------------------

VIDEO_FPS = [8, 12, 24]
VIDEO_SIZES = [(24, 16), (32, 24), (40, 16)]


def gen_video_frame_seed(i: int, f: int) -> int:
    """Seed for clip i's frame f — the ground-truth-pixel handle oracles
    use (imaging.make_pixels(seed, w, h) IS the frame)."""
    return 100_000 + i * 97 + f


def gen_video_signal(i: int):
    """Clip parameters for video ``i`` (pure function): returns
    (n_frames, w, h, fps, codec). Every 3rd clip is MJPG (lossy, like the
    image corpus); the rest are DIB (uncompressed — decode is exact)."""
    h_ = _h(i, 60)
    n_frames = 6 + (h_ % 9)
    w, h = VIDEO_SIZES[_h(i, 61) % len(VIDEO_SIZES)]
    fps = VIDEO_FPS[_h(i, 62) % len(VIDEO_FPS)]
    codec = "MJPG" if i % 3 == 0 else "DIB"
    return n_frames, w, h, fps, codec


def gen_video_pdf(lo: int, hi: int) -> pd.DataFrame:
    """Real-AVI media rows (media_id, kind, bytes, fmt, meta) — DIB and
    MJPG clips, frames from imaging.make_pixels."""
    from .imaging import make_pixels
    from .videocodec import avi_encode

    rows = []
    for i in range(lo, hi):
        n_frames, w, h, fps, codec = gen_video_signal(i)
        frames = [make_pixels(gen_video_frame_seed(i, f), w, h)
                  for f in range(n_frames)]
        rows.append({
            "media_id": f"vid{i:06d}", "kind": "video",
            "bytes": avi_encode(frames, fps=fps, codec=codec),
            "fmt": "avi",
            "meta": {"fps": str(fps), "codec": codec,
                     "n_frames": str(n_frames)},
        })
    return pd.DataFrame(rows)


def spark_video(spark, n_clips: int, parallelism: int = 8):
    """Distributed real-AVI media table (bytes encoded executor-side)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield gen_video_pdf(int(ids.min()), int(ids.max()) + 1)

    return (spark.range(0, n_clips, 1, parallelism)
            .mapInPandas(gen, AUDIO_SCHEMA))


# --- animated GIF (real gifcodec corpus) --------------------------------------

GIF_SIZES = [(20, 14), (28, 20), (36, 12)]
GIF_COLORS = [16, 64, 250]


def gen_gif_frame_seed(i: int, f: int) -> int:
    """Seed for clip i's frame f — ground-truth handle for the oracle
    (imaging.make_palette_pixels(i, seed, w, h, n) IS the frame)."""
    return 200_000 + i * 89 + f


def gen_gif_signal(i: int):
    """Clip parameters for GIF ``i`` (pure function): returns
    (n_frames, w, h, n_colors, duration_cs, interlace). Frames share one
    clip palette (≤ n_colors distinct RGB) so encode→decode is exact —
    the lossless role DIB plays in the AVI corpus."""
    h_ = _h(i, 70)
    n_frames = 1 + (h_ % 8)
    w, h = GIF_SIZES[_h(i, 71) % len(GIF_SIZES)]
    n_colors = GIF_COLORS[_h(i, 72) % len(GIF_COLORS)]
    duration = 4 + (_h(i, 73) % 20)
    interlace = i % 4 == 0
    return n_frames, w, h, n_colors, duration, interlace


def gen_gif_pdf(lo: int, hi: int) -> pd.DataFrame:
    """Real animated-GIF media rows (media_id, kind, bytes, fmt, meta) —
    palette-exact clips from imaging.make_palette_pixels."""
    from .gifcodec import gif_encode
    from .imaging import make_palette_pixels

    rows = []
    for i in range(lo, hi):
        n_frames, w, h, n_colors, duration, interlace = gen_gif_signal(i)
        frames = [make_palette_pixels(i, gen_gif_frame_seed(i, f), w, h,
                                      n_colors)
                  for f in range(n_frames)]
        rows.append({
            "media_id": f"gif{i:06d}", "kind": "gif",
            "bytes": gif_encode(frames, duration_cs=duration,
                                interlace=interlace),
            "fmt": "gif",
            "meta": {"n_frames": str(n_frames), "colors": str(n_colors),
                     "interlace": str(int(interlace))},
        })
    return pd.DataFrame(rows)


def spark_gif(spark, n_clips: int, parallelism: int = 8):
    """Distributed real animated-GIF media table (bytes encoded
    executor-side)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield gen_gif_pdf(int(ids.min()), int(ids.max()) + 1)

    return (spark.range(0, n_clips, 1, parallelism)
            .mapInPandas(gen, AUDIO_SCHEMA))


AUDIO_SCHEMA = ("media_id string, kind string, bytes binary, fmt string, "
                "meta map<string,string>")


def spark_audio(spark, n_clips: int, parallelism: int = 8):
    """Distributed real-WAV media table (one row per clip, bytes encoded
    executor-side — the driver never holds the corpus)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield gen_audio_pdf(int(ids.min()), int(ids.max()) + 1)

    return (spark.range(0, n_clips, 1, parallelism)
            .mapInPandas(gen, AUDIO_SCHEMA))


# --- robots + seeds ----------------------------------------------------------

_PREFIX_POOL = ["/admin", "/p/9", "/private", "/tmp"]
_DELAYS = [0, 250, 1000, 5000]


def gen_robots_row(h: int) -> dict:
    n = _h(h, 10) % 4  # 0-3 prefixes
    prefixes = sorted({_PREFIX_POOL[_h(h, 11, j) % len(_PREFIX_POOL)]
                       for j in range(n)})
    return {
        "host": f"host{h}.test",
        "disallow_prefixes": prefixes,
        "crawl_delay_ms": np.int64(_DELAYS[_h(h, 12) % len(_DELAYS)]),
    }


def gen_robots_pdf(n_hosts: int) -> pd.DataFrame:
    return pd.DataFrame([gen_robots_row(h) for h in range(n_hosts)])


def gen_robots_body(h: int) -> str:
    """Raw robots.txt text equivalent to gen_robots_row(h) for agent '*',
    with a decoy group for an unrelated agent (exercises RFC 9309 group
    selection in the parser). Round-trips exactly through
    frontier.robots.parse_robots."""
    row = gen_robots_row(h)
    lines = ["# synthetic robots.txt (seed=42, host %d)" % h,
             "User-agent: unrelatedbot", "Disallow: /decoy", "",
             "User-agent: *"]
    lines += [f"Disallow: {p}" for p in row["disallow_prefixes"]]
    if row["crawl_delay_ms"]:
        lines.append("Crawl-delay: %g" % (row["crawl_delay_ms"] / 1000))
    return "\n".join(lines) + "\n"


def gen_seeds_pdf(tier: Tier, n_seeds: int | None = None) -> pd.DataFrame:
    """Seeds: page 0 of each host, then page 1 of each host, ... (list order
    = seed_pos, the reference's program order of the initial GetPage calls)."""
    counts = page_counts(tier)
    n = n_seeds if n_seeds is not None else min(tier.n_hosts * 2, 64)
    rows = []
    for s in range(n):
        h = s % tier.n_hosts
        k = s // tier.n_hosts
        if k < counts[h]:
            rows.append({"url": page_url(h, k), "seed_pos": np.int32(len(rows))})
    return pd.DataFrame(rows)


# --- Spark-distributed generation -------------------------------------------

PAGES_SCHEMA = (
    "url string, host string, base_href string, meta_refresh_url string, "
    "links array<struct<href:string,text:string,img_alt:string,pos:int>>, "
    "title string, image_id string, status int, "
    "form_action string, form_method string, "
    "form_inputs array<struct<name:string,type:string,value:string,"
    "checked:boolean,selected:boolean,pos:int>>"
)
RAW_PAGES_SCHEMA = ("url string, host string, body binary, "
                    "content_type string, image_id string, status int")
# header-channel cookie columns, appended when cookies=True (the Session
# cookie-jar analog — see gen_cookie_cols)
COOKIE_COLS_SCHEMA = (", set_cookies array<struct<name:string,value:string,"
                      "domain:string,path:string,max_age:int>>"
                      ", require_cookie string")
IMAGES_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                 "caption string, phash long")
ROBOTS_SCHEMA = "host string, disallow_prefixes array<string>, crawl_delay_ms long"
SEEDS_SCHEMA = "url string, seed_pos int"


def spark_images(spark, tier: Tier, parallelism: int = 32):
    mat = tier.materialize_bytes

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield gen_images_pdf(int(ids.min()), int(ids.max()) + 1, mat)

    return (spark.range(0, tier.n_images, 1, parallelism)
            .mapInPandas(gen, IMAGES_SCHEMA))


def spark_pages(spark, tier: Tier, parallelism: int = 32,
                cookies: bool = False):
    counts = page_counts(tier)
    n_images = tier.n_images

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield gen_pages_pdf(int(ids.min()), int(ids.max()) + 1,
                                counts, n_images, cookies=cookies)

    schema = PAGES_SCHEMA + (COOKIE_COLS_SCHEMA if cookies else "")
    return (spark.range(0, tier.n_pages, 1, parallelism)
            .mapInPandas(gen, schema))


def spark_raw_pages(spark, tier: Tier, parallelism: int = 32,
                    cookies: bool = False):
    """The raw-body page corpus, Spark-distributed (same pure generator as
    gen_raw_pages_pdf — byte-identical regardless of partitioning)."""
    counts = page_counts(tier)
    n_images = tier.n_images

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield gen_raw_pages_pdf(int(ids.min()), int(ids.max()) + 1,
                                    counts, n_images, cookies=cookies)

    schema = RAW_PAGES_SCHEMA + (COOKIE_COLS_SCHEMA if cookies else "")
    return (spark.range(0, tier.n_pages, 1, parallelism)
            .mapInPandas(gen, schema))


def spark_robots(spark, tier: Tier):
    return spark.createDataFrame(gen_robots_pdf(tier.n_hosts), ROBOTS_SCHEMA)


def spark_robots_bodies(spark, tier: Tier):
    """Raw robots.txt bodies per host (host string, body string) — input to
    frontier.robots.robots_cache_from_bodies for the parse-at-crawl path."""
    rows = [(f"host{h}.test", gen_robots_body(h))
            for h in range(tier.n_hosts)]
    return spark.createDataFrame(rows, "host string, body string")


def spark_seeds(spark, tier: Tier, n_seeds: int | None = None):
    return spark.createDataFrame(gen_seeds_pdf(tier, n_seeds), SEEDS_SCHEMA)
