"""EXIF (JPEG APP1) metadata: builder + wild-envelope parser, pure bytes.

Training pipelines over an archived image corpus need the EXIF
orientation (rotate-before-train normalization), capture timestamp, and
pixel-dimension cross-checks straight from the payload bytes.  The
reference archives fetched payloads verbatim (koizuka/scraper
scraper.go SavePage/SaveFile, session.go invoke → body bytes), so this
is a corpus-side header walk over the saved `bytes` column — entropy
data is never touched.

Format notes (public spec: CIPA DC-008 / TIFF 6.0):
  * APP1 segment = marker FFE1, big-endian length, "Exif\\0\\0", then a
    self-contained TIFF file: byte-order mark (II/MM), magic 42, IFD0
    offset. All TIFF offsets are relative to the TIFF header start.
  * An IFD is count(2) + count*12-byte entries + next-IFD offset(4).
    Entry = tag(2) type(2) count(4) value-or-offset(4); values whose
    encoded size is <= 4 bytes are inline, else the 4 bytes are an
    offset into the segment.
  * IFD0 tag 0x8769 points at the Exif sub-IFD (DateTimeOriginal,
    PixelX/YDimension live there).

Wild-envelope rules (same posture as jpegcodec/gifcodec): unknown tags
and unknown APPn segments are skipped; either byte order; inline and
out-of-line values; missing APP1-Exif yields None; STRUCTURAL damage
(truncated IFD, offset outside the segment, bad magic) raises
ValueError loudly instead of returning silently wrong metadata.
"""

from __future__ import annotations

import struct

# tag ids (TIFF 6.0 / Exif)
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_X_RESOLUTION = 0x011A
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_DT_ORIGINAL = 0x9003
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

#: EXIF orientation 1..8 → (clockwise rotation deg, flip horizontally)
#: applied AFTER rotation to reach upright pixels. Public mapping from
#: TIFF 6.0 fig. "Orientation".
ORIENT_ROT_DEG = [0, 0, 180, 180, 90, 90, 270, 270]
ORIENT_FLIP_H = [False, True, False, True, True, False, True, False]


class _IfdWriter:
    """Accumulates (tag, type, count, payload_bytes) entries; serializes
    with out-of-line data placed in a shared blob after all IFDs."""

    def __init__(self, endian: str):
        self.e = endian
        self.entries: list[tuple[int, int, int, bytes]] = []

    def add(self, tag: int, typ: int, count: int, payload: bytes) -> None:
        self.entries.append((tag, typ, count, payload))

    def add_short(self, tag: int, v: int) -> None:
        self.add(tag, 3, 1, struct.pack(self.e + "H", v))

    def add_long(self, tag: int, v: int) -> None:
        self.add(tag, 4, 1, struct.pack(self.e + "I", v))

    def add_ascii(self, tag: int, s: str) -> None:
        b = s.encode("ascii") + b"\x00"
        self.add(tag, 2, len(b), b)

    def add_rational(self, tag: int, num: int, den: int) -> None:
        self.add(tag, 5, 1, struct.pack(self.e + "II", num, den))

    def size(self) -> int:
        return 2 + 12 * len(self.entries) + 4

    def serialize(self, my_off: int, data_off: int,
                  next_ifd: int = 0) -> tuple[bytes, bytes]:
        """Returns (ifd_bytes, data_blob); out-of-line values are placed
        at data_off, data_off+..., padded to 2-byte alignment."""
        out = [struct.pack(self.e + "H", len(self.entries))]
        blob = bytearray()
        for tag, typ, count, payload in sorted(self.entries):
            head = struct.pack(self.e + "HHI", tag, typ, count)
            if len(payload) <= 4:
                out.append(head + payload.ljust(4, b"\x00"))
            else:
                off = data_off + len(blob)
                out.append(head + struct.pack(self.e + "I", off))
                blob += payload
                if len(blob) % 2:
                    blob += b"\x00"
        out.append(struct.pack(self.e + "I", next_ifd))
        return b"".join(out), bytes(blob)


def build_exif_app1(orientation: int | None = None,
                    make: str | None = None,
                    model: str | None = None,
                    x_res: tuple[int, int] | None = None,
                    dt_original: str | None = None,
                    pixel_xy: tuple[int, int] | None = None,
                    big_endian: bool = False,
                    unknown_tag: int | None = None) -> bytes:
    """Build a complete APP1 segment (FFE1 marker + length + Exif TIFF).

    ``unknown_tag`` injects a private LONG tag into IFD0 so tests can
    prove the parser's skip path on bytes it does not understand.
    """
    e = ">" if big_endian else "<"
    ifd0 = _IfdWriter(e)
    if make is not None:
        ifd0.add_ascii(TAG_MAKE, make)
    if model is not None:
        ifd0.add_ascii(TAG_MODEL, model)
    if orientation is not None:
        ifd0.add_short(TAG_ORIENTATION, orientation)
    if x_res is not None:
        ifd0.add_rational(TAG_X_RESOLUTION, x_res[0], x_res[1])
    if unknown_tag is not None:
        ifd0.add_long(unknown_tag, 0xDEADBEEF)

    exif = _IfdWriter(e)
    if dt_original is not None:
        exif.add_ascii(TAG_DT_ORIGINAL, dt_original)
    if pixel_xy is not None:
        exif.add_long(TAG_PIXEL_X, pixel_xy[0])
        exif.add_long(TAG_PIXEL_Y, pixel_xy[1])

    have_exif_ifd = bool(exif.entries)
    if have_exif_ifd:
        ifd0.add_long(TAG_EXIF_IFD, 0)  # placeholder, patched below

    ifd0_off = 8
    exif_off = ifd0_off + ifd0.size()
    data_off = exif_off + (exif.size() if have_exif_ifd else 0)
    if have_exif_ifd:  # patch the pointer now that layout is known
        ifd0.entries = [(t, ty, c, struct.pack(e + "I", exif_off))
                        if t == TAG_EXIF_IFD else (t, ty, c, p)
                        for t, ty, c, p in ifd0.entries]

    # two-pass: serialize IFD0 first to learn its blob size, then exif
    ifd0_b, blob0 = ifd0.serialize(ifd0_off, data_off)
    if have_exif_ifd:
        exif_b, blob1 = exif.serialize(exif_off, data_off + len(blob0))
    else:
        exif_b, blob1 = b"", b""

    tiff = (("MM" if big_endian else "II").encode()
            + struct.pack(e + "HI", 42, ifd0_off)
            + ifd0_b + exif_b + blob0 + blob1)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def inject_app1(jpeg: bytes, app1_segment: bytes) -> bytes:
    """Splice an APP1 segment immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    return jpeg[:2] + app1_segment + jpeg[2:]


def _read_value(tiff: bytes, e: str, typ: int, count: int,
                raw: bytes, base_len: int):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None  # unknown type — caller skips
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(e + "I", raw)
        if off + total > base_len:
            raise ValueError(
                f"EXIF value offset {off}+{total} outside TIFF block "
                f"({base_len} bytes)")
        buf = tiff[off:off + total]
    if typ == 2:  # ASCII, NUL-terminated
        return buf.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ == 3:
        return struct.unpack(e + f"{count}H", buf)
    if typ == 4:
        return struct.unpack(e + f"{count}I", buf)
    if typ == 5:
        vals = struct.unpack(e + f"{2 * count}I", buf)
        return tuple(zip(vals[::2], vals[1::2]))
    if typ == 1:
        return tuple(buf)
    return None


def _parse_ifd(tiff: bytes, e: str, off: int) -> dict[int, object]:
    n_len = len(tiff)
    if off + 2 > n_len:
        raise ValueError(f"EXIF IFD offset {off} outside TIFF block")
    (count,) = struct.unpack_from(e + "H", tiff, off)
    end = off + 2 + 12 * count + 4
    if end > n_len:
        raise ValueError(
            f"EXIF IFD at {off} truncated ({count} entries, block {n_len})")
    out: dict[int, object] = {}
    for k in range(count):
        ent = off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, ent)
        val = _read_value(tiff, e, typ, cnt, tiff[ent + 8:ent + 12], n_len)
        if val is not None:
            out[tag] = val
    return out


def find_app1_exif(jpeg: bytes) -> bytes | None:
    """Marker walk to the first APP1 segment whose payload starts with
    Exif\\0\\0; returns the TIFF block or None. Stops at SOS."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", jpeg[pos + 2:pos + 4])
        if seg_len < 2 or pos + 2 + seg_len > n:
            raise ValueError(f"truncated segment at {pos}")
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == b"Exif\x00\x00":
            return jpeg[pos + 10:pos + 2 + seg_len]
        if marker == 0xDA:  # SOS — no more headers
            return None
        pos += 2 + seg_len
    return None


def parse_exif(jpeg: bytes) -> dict | None:
    """Parse EXIF from a JPEG. Returns None when no APP1-Exif segment
    exists; raises ValueError on structural damage. Keys (missing tags
    → absent): byte_order ('II'/'MM'), orientation, make, model,
    x_resolution (num, den), datetime, dt_original, pixel_x, pixel_y.
    """
    tiff = find_app1_exif(jpeg)
    if tiff is None:
        return None
    if len(tiff) < 8:
        raise ValueError("EXIF TIFF block truncated")
    order = tiff[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte-order mark {order!r}")
    magic, ifd0_off = struct.unpack_from(e + "HI", tiff, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    ifd0 = _parse_ifd(tiff, e, ifd0_off)
    out: dict[str, object] = {"byte_order": order.decode()}
    if TAG_ORIENTATION in ifd0:
        out["orientation"] = ifd0[TAG_ORIENTATION][0]
    if TAG_MAKE in ifd0:
        out["make"] = ifd0[TAG_MAKE]
    if TAG_MODEL in ifd0:
        out["model"] = ifd0[TAG_MODEL]
    if TAG_X_RESOLUTION in ifd0:
        out["x_resolution"] = ifd0[TAG_X_RESOLUTION][0]
    if TAG_DATETIME in ifd0:
        out["datetime"] = ifd0[TAG_DATETIME]
    if TAG_EXIF_IFD in ifd0:
        sub = _parse_ifd(tiff, e, ifd0[TAG_EXIF_IFD][0])
        if TAG_DT_ORIGINAL in sub:
            out["dt_original"] = sub[TAG_DT_ORIGINAL]
        if TAG_PIXEL_X in sub:
            out["pixel_x"] = sub[TAG_PIXEL_X][0]
        if TAG_PIXEL_Y in sub:
            out["pixel_y"] = sub[TAG_PIXEL_Y][0]
    return out


def strip_exif(jpeg: bytes) -> tuple[bytes, bool]:
    """Remove every APP1-Exif segment (privacy scrub — the image-side
    analog of text PII masking: GPS position, serial numbers, and
    capture timestamps all live in EXIF, and public image-text corpus
    builds strip it before release). Non-Exif APP1 (XMP), all other
    APPn, and the entropy stream are byte-preserved, so decoded pixels
    are provably unchanged. Returns (clean_bytes, had_exif).

    Same wild-envelope posture as find_app1_exif: the walk stops at SOS
    (EXIF is only legal before it) and structural damage raises."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    out = bytearray(jpeg[:2])
    pos, n, had = 2, len(jpeg), False
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            out += jpeg[pos:pos + 2]
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", jpeg[pos + 2:pos + 4])
        if seg_len < 2 or pos + 2 + seg_len > n:
            raise ValueError(f"truncated segment at {pos}")
        is_exif = (marker == 0xE1
                   and jpeg[pos + 4:pos + 10] == b"Exif\x00\x00")
        if is_exif:
            had = True
        else:
            out += jpeg[pos:pos + 2 + seg_len]
        if marker == 0xDA:      # SOS: rest is entropy data + EOI
            out += jpeg[pos + 2 + seg_len:]
            return bytes(out), had
        pos += 2 + seg_len
    return bytes(out), had
