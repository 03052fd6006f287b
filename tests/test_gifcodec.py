"""Real GIF codec (crawlspark/gifcodec.py): exact palette round-trip
(stills + animations, interlace, LZW table-reset boundary), compositing
semantics (sub-rect frames, transparency, disposal 1/2/3), the wild decode
envelope (87a, comment/app/unknown extensions, missing trailer, local
color tables), loud failures on structural damage, and the Spark
video_features(kind='gif') pipeline vs ground-truth pixels.

Reference parity note: the reference treats downloaded media as opaque
payloads; GIF is new first-class pipeline surface per the round brief
(multimodal image columns), completing the still/animated image set next
to png/jpeg (imaging.py, jpegcodec.py) and AVI (videocodec.py).
"""
import struct

import numpy as np
import pytest

from crawlspark.gifcodec import (GifReader, _lzw_decode, _lzw_encode,
                                 gif_decode, gif_decode_first, gif_encode,
                                 sample_indices)
from crawlspark.imaging import make_palette_pixels, phash64


def test_still_roundtrip_exact_all_palette_sizes():
    for n_colors in (2, 16, 64, 250, 256):
        px = make_palette_pixels(n_colors, 7, 33, 21, n_colors)  # odd w
        data = gif_encode([px])
        assert data[:6] == b"GIF87a"          # still, no extensions
        assert np.array_equal(gif_decode_first(data), px)


def test_animation_roundtrip_exact_and_delays():
    frames = [make_palette_pixels(5, f, 24, 18, 64) for f in range(6)]
    data = gif_encode(frames, duration_cs=7)
    assert data[:6] == b"GIF89a"
    out, delays = gif_decode(data)
    assert delays == [7] * 6
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))


def test_interlace_roundtrip_exact():
    for h in (1, 2, 5, 8, 17):                # cover every pass boundary
        px = make_palette_pixels(9, h, 13, h, 32)
        plain = gif_encode([px], interlace=False)
        laced = gif_encode([px], interlace=True)
        assert laced != plain
        assert np.array_equal(gif_decode_first(laced), px)


def test_lzw_table_reset_boundary_roundtrip():
    """Noisy indices overflow the 4096-entry LZW table several times —
    the clear/reset path and every width bump must round-trip."""
    rng = (np.arange(120_000, dtype=np.uint64) * 2654435761) % 256
    idx = rng.astype(np.uint8)
    for mcs in (2, 5, 8):
        sub = (idx % (1 << mcs)).astype(np.uint8)
        back = _lzw_decode(_lzw_encode(sub, mcs), mcs, len(sub))
        assert np.array_equal(back, sub)


def _gce(disposal: int, transparent: int | None, delay: int = 0) -> bytes:
    flags = (disposal << 2) | (0x01 if transparent is not None else 0)
    return b"\x21\xf9\x04" + struct.pack(
        "<BHB", flags, delay, transparent or 0) + b"\x00"


def _image_block(left, top, idx: np.ndarray, mcs: int = 2) -> bytes:
    h, w = idx.shape
    body = _lzw_encode(idx.ravel(), mcs)
    out = bytearray(b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0))
    out.append(mcs)
    for i in range(0, len(body), 255):
        chunk = body[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _hand_gif(frames_blocks: bytes, w=6, h=4, palette=None) -> bytes:
    pal = palette if palette is not None else np.array(
        [[250, 0, 0], [0, 250, 0], [0, 0, 250], [40, 40, 40]], np.uint8)
    head = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x01, 3, 0)
            + pal.tobytes())
    return head + frames_blocks + b"\x3b"


def test_compositing_subrect_transparency_disposal():
    """Hand-built 3-frame GIF: full frame 0, then a transparent-holed
    sub-rect with disposal 2 (restore bg), then disposal 3 (restore
    previous) — composited canvases must match a numpy mirror."""
    f0 = np.zeros((4, 6), np.uint8)                      # all color 0
    patch = np.array([[1, 3, 1], [3, 1, 3]], np.uint8)   # 3 = transparent
    f2 = np.full((2, 2), 2, np.uint8)
    blocks = (_image_block(0, 0, f0)
              + _gce(disposal=2, transparent=3) + _image_block(2, 1, patch)
              + _gce(disposal=3, transparent=None) + _image_block(4, 2, f2)
              + _image_block(0, 0, f0))
    r = GifReader(_hand_gif(blocks))
    assert r.n_frames == 4
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [40, 40, 40]],
                   np.uint8)
    bg = pal[3]                                          # bg index 3

    canvas0 = pal[f0]
    assert np.array_equal(r.frame(0), canvas0)

    canvas1 = canvas0.copy()                             # transparent holes
    canvas1[1, 2] = pal[1]
    canvas1[2, 2] = canvas0[2, 2]                        # transparent
    canvas1[1, 3] = canvas0[1, 3]
    canvas1[2, 3] = pal[1]
    canvas1[1, 4] = pal[1]
    canvas1[2, 4] = canvas0[2, 4]
    assert np.array_equal(r.frame(1), canvas1)

    canvas2 = canvas0.copy()                             # disposal 2 wiped
    canvas2[1:3, 2:5] = bg                               # ...the rect to bg
    canvas2[2:4, 4:6] = pal[2]                           # then frame 2 drew
    assert np.array_equal(r.frame(2), canvas2)

    canvas3 = canvas0.copy()                             # disposal 3: frame
    canvas3[1:3, 2:5] = bg                               # 2 undone entirely
    expected3 = pal[f0]
    # frame 3 is full-screen color 0 over the restored canvas:
    assert np.array_equal(r.frame(3), expected3)
    # one-pass sampling agrees with per-frame compositing
    s = r.sample([0, 2, 3])
    assert np.array_equal(s[0], canvas0)
    assert np.array_equal(s[1], canvas2)
    assert np.array_equal(s[2], expected3)


def test_wild_envelope_extensions_and_missing_trailer():
    px = make_palette_pixels(3, 1, 10, 8, 16)
    data = gif_encode([px, px])
    # splice comment + plain-text + unknown extensions after the header
    gct_end = 13 + 3 * 256
    comment = b"\x21\xfe\x05hello\x00"
    plain = b"\x21\x01\x0c" + b"\x00" * 12 + b"\x03abc\x00"
    unknown = b"\x21\xab\x02\x01\x02\x00"
    wild = data[:gct_end] + comment + plain + unknown + data[gct_end:]
    out, _ = gif_decode(wild)
    assert np.array_equal(out[0], px)
    # trailer dropped → still decodes (EOF-tolerant)
    out2, _ = gif_decode(wild[:-1])
    assert np.array_equal(out2[1], px)


def test_local_color_table_and_no_gct():
    """87a-style file with NO global table, one image with a local one."""
    pal = np.array([[9, 9, 9], [200, 10, 30]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    body = _lzw_encode(idx.ravel(), 2)
    img = bytearray(b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80))
    img += np.vstack([pal, np.zeros((0, 3), np.uint8)]).tobytes()  # 2 entries
    img.append(2)
    img.append(len(body))
    img += body
    img.append(0)
    data = (b"GIF87a" + struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)
            + bytes(img) + b"\x3b")
    assert np.array_equal(gif_decode_first(data), pal[idx])


def test_structural_damage_raises():
    px = make_palette_pixels(2, 0, 8, 8, 8)
    data = gif_encode([px])
    with pytest.raises(ValueError, match="not a GIF"):
        GifReader(b"JIF89a" + data[6:])
    with pytest.raises(ValueError, match="truncated"):
        GifReader(data[:20])
    # corrupt the LZW stream length mid-image
    with pytest.raises(ValueError):
        GifReader(data[:-10] + b"\x3b").frame(0)
    with pytest.raises(ValueError, match="> 256"):
        from crawlspark.imaging import make_pixels
        gif_encode([make_pixels(1, 64, 64)])   # gradient+noise: >256 colors
    with pytest.raises(ValueError, match="no frames"):
        gif_encode([])


def test_sample_indices_matches_video_spec():
    from crawlspark.videocodec import sample_indices as vsi
    for total, n in ((10, 4), (3, 4), (1, 4), (1000, 2)):
        assert sample_indices(total, n) == vsi(total, n)


def test_spark_gif_frames_match_ground_truth_oracle(spark):
    """End-to-end differential: executor-side gif_encode → sequential-pass
    sampling → features must equal features from ground-truth pixels with
    the mirrored sampling formula — the contract the gif_frames driver
    entry pins. Every clip counts (the whole corpus is lossless)."""
    from crawlspark import synth
    from crawlspark.functions.multimodal import video_features

    n = 24
    media = synth.spark_gif(spark, n, parallelism=4)
    got = {(r["media_id"], r["frame_idx"]): r.asDict()
           for r in video_features(media, n_frames=4, kind="gif").collect()}
    expected = 0
    for i in range(n):
        n_frames, w, h, n_colors, _dur, _il = synth.gen_gif_signal(i)
        for j in sample_indices(n_frames, 4):
            expected += 1
            px = make_palette_pixels(i, synth.gen_gif_frame_seed(i, j),
                                     w, h, n_colors)
            g = got[(f"gif{i:06d}", j)]
            assert (g["w"], g["h"]) == (w, h)
            assert g["mean_r"] == px[..., 0].mean()
            assert g["mean_g"] == px[..., 1].mean()
            assert g["phash"] == phash64(px)
            luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            hist = np.histogram(luma, bins=16, range=(0, 256))[0]
            assert g["luma_hist"] == hist.astype(int).tolist()
    assert len(got) == expected
