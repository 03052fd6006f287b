"""EXIF builder/parser (crawlspark/exif.py) + the exif_meta operator.

Parity model: build→parse must be the identity over the field envelope
(both byte orders, inline + out-of-line values, unknown tags present),
missing EXIF yields None, structural damage raises — the same
wild-envelope posture the jpeg/gif codecs pin.
"""

import struct

import pandas as pd
import pytest

from crawlspark.exif import (ORIENT_FLIP_H, ORIENT_ROT_DEG,
                             build_exif_app1, find_app1_exif, inject_app1,
                             parse_exif)

# a minimal structurally-valid JPEG shell: SOI + DQT-ish segment + SOS
_SHELL = b"\xff\xd8\xff\xdb\x00\x04\x00\x00\xff\xda\x00\x02"


def _jpeg(**kw) -> bytes:
    return inject_app1(_SHELL, build_exif_app1(**kw))


@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_all_fields(big_endian):
    d = parse_exif(_jpeg(
        orientation=6, make="CAMERA-LONGNAME", model="M1", x_res=(300, 2),
        dt_original="2026:01:05 12:00:00", pixel_xy=(48, 32),
        big_endian=big_endian, unknown_tag=0x9999))
    assert d == {
        "byte_order": "MM" if big_endian else "II", "orientation": 6,
        "make": "CAMERA-LONGNAME", "model": "M1", "x_resolution": (300, 2),
        "dt_original": "2026:01:05 12:00:00", "pixel_x": 48, "pixel_y": 32}


def test_sparse_fields_and_short_inline_ascii():
    # 3-byte ASCII ("ab\0") stays inline; no Exif sub-IFD is emitted
    d = parse_exif(_jpeg(make="ab", orientation=2))
    assert d == {"byte_order": "II", "make": "ab", "orientation": 2}


def test_no_exif_returns_none():
    assert parse_exif(_SHELL) is None
    # APP1 that is NOT Exif (e.g. XMP) is skipped, not misparsed
    xmp = b"\xff\xe1" + struct.pack(">H", 12) + b"http://ns."
    assert parse_exif(b"\xff\xd8" + xmp + _SHELL[2:]) is None


def test_structural_damage_raises():
    seg = build_exif_app1(orientation=3, make="CAMERA-LONGNAME")
    # truncate the TIFF block but keep the segment length honest
    cut = seg[10:30]
    bad = b"\xff\xe1" + struct.pack(">H", len(cut) + 8) + b"Exif\x00\x00" + cut
    with pytest.raises(ValueError):
        parse_exif(b"\xff\xd8" + bad + _SHELL[2:])
    with pytest.raises(ValueError):
        parse_exif(b"\x00\x00")  # no SOI
    # out-of-line offset pointing outside the block (hand-built IFD)
    hand = (b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHII", 0x010F, 2, 64, 9999)  # offset way out
            + struct.pack("<I", 0))
    app1 = (b"\xff\xe1" + struct.pack(">H", len(hand) + 8)
            + b"Exif\x00\x00" + hand)
    with pytest.raises(ValueError):
        parse_exif(b"\xff\xd8" + app1 + _SHELL[2:])


def test_marker_walk_skips_padding_and_rst():
    # stray 0xFF01 (TEM) and RSTn markers before APP1 are stand-alone
    seg = build_exif_app1(orientation=5)
    data = b"\xff\xd8" + b"\xff\x01" + b"\xff\xd0" + seg + _SHELL[2:]
    assert parse_exif(data)["orientation"] == 5
    assert find_app1_exif(data) is not None


def test_orientation_tables_are_the_public_mapping():
    # TIFF 6.0: 1 normal, 2 flipH, 3 rot180, 4 flipV, 5 transpose,
    # 6 rot90CW, 7 transverse, 8 rot270CW — expressed as rot-then-flipH
    assert ORIENT_ROT_DEG == [0, 0, 180, 180, 90, 90, 270, 270]
    assert ORIENT_FLIP_H == [False, True, False, True, True, False,
                             True, False]


def test_exif_meta_operator(spark):
    from crawlspark.functions.curation import exif_meta
    rows = [
        ("a", _jpeg(orientation=6, make="CAMERA-X", x_res=(72, 1),
                    pixel_xy=(10, 20), dt_original="2026:02:03 04:05:06",
                    big_endian=True)),
        ("b", _SHELL),                       # no EXIF
        ("c", _jpeg(orientation=2)),         # sparse, little-endian
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id",
                                                           "bytes"]),
                               "image_id string, bytes binary")
    got = {r.image_id: r.asDict() for r in exif_meta(df).collect()}
    assert got["a"] == {
        "image_id": "a", "has_exif": True, "byte_order": "MM",
        "orientation": 6, "make": "CAMERA-X", "x_res_num": 72,
        "x_res_den": 1, "pix_x": 10, "pix_y": 20,
        "dt_original": "2026:02:03 04:05:06", "rot_deg": 90,
        "flip_h": False}
    assert got["b"]["has_exif"] is False
    assert got["b"]["orientation"] is None
    assert got["b"]["rot_deg"] is None
    assert got["c"]["rot_deg"] == 0 and got["c"]["flip_h"] is True


def test_strip_exif_removes_only_exif_app1():
    from crawlspark.exif import (build_exif_app1, inject_app1, parse_exif,
                                 strip_exif)
    from crawlspark.imaging import make_pixels
    from crawlspark.jpegcodec import jpeg_decode, jpeg_encode
    base = jpeg_encode(make_pixels(3, 48, 32), quality=80)
    seg = build_exif_app1(orientation=6, make="M", dt_original=None)
    tagged = inject_app1(base, seg)
    assert parse_exif(tagged)["orientation"] == 6
    clean, had = strip_exif(tagged)
    assert had and parse_exif(clean) is None
    assert (jpeg_decode(clean) == jpeg_decode(tagged)).all()
    # idempotent + honest flag on exif-free input
    clean2, had2 = strip_exif(clean)
    assert not had2 and clean2 == clean
    # non-Exif APP1 (XMP) is preserved
    import struct
    xmp = b"http://ns.adobe.com/xap/1.0/\x00<x/>"
    xmp_seg = b"\xff\xe1" + struct.pack(">H", len(xmp) + 2) + xmp
    both = inject_app1(inject_app1(base, xmp_seg), seg)
    clean3, had3 = strip_exif(both)
    assert had3 and xmp in clean3 and parse_exif(clean3) is None


def test_strip_exif_damage_raises():
    import pytest

    from crawlspark.exif import strip_exif
    with pytest.raises(ValueError):
        strip_exif(b"\x00\x01not a jpeg")
    from crawlspark.imaging import make_pixels
    from crawlspark.jpegcodec import jpeg_encode
    data = bytearray(jpeg_encode(make_pixels(0, 32, 32)))
    data[2] = 0x00  # clobber the first marker byte
    with pytest.raises(ValueError):
        strip_exif(bytes(data))
