"""Real AVI container codec (crawlspark/videocodec.py): exact DIB
round-trip, MJPG PSNR gate, index random access, the wild decode envelope
(JUNK chunks, interleaved audio stream, missing idx1, absolute-offset
idx1), and the Spark video_features pipeline vs ground-truth pixels.

Reference parity note: the reference treats downloaded media as opaque
payloads; the container codec is new first-class pipeline surface per the
round brief (multimodal columns), completing the image/audio/video set.
"""
import struct

import numpy as np
import pytest

from crawlspark.imaging import make_pixels, phash64, psnr
from crawlspark.videocodec import (AviReader, avi_decode, avi_encode,
                                   sample_indices)


def test_dib_roundtrip_exact_odd_stride():
    frames = [make_pixels(i, 31, 17) for i in range(7)]  # 31*3 not mult of 4
    out, fps = avi_decode(avi_encode(frames, fps=12, codec="DIB"))
    assert fps == 12 and len(out) == 7
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_mjpg_roundtrip_psnr_above_gate():
    frames = [make_pixels(i + 50, 48, 32) for i in range(4)]
    out, fps = avi_decode(avi_encode(frames, fps=8, codec="MJPG"))
    assert fps == 8
    assert all(psnr(a, b) >= 40.0 for a, b in zip(frames, out))


def test_index_random_access_decodes_only_target():
    frames = [make_pixels(i, 20, 20) for i in range(9)]
    r = AviReader(avi_encode(frames, codec="DIB"))
    assert r.n_frames == 9
    assert np.array_equal(r.frame(5), frames[5])
    assert np.array_equal(r.frame(0), frames[0])


def test_sample_indices_spec():
    assert sample_indices(10, 4) == [0, 2, 5, 7]
    assert sample_indices(3, 4) == [0, 1, 2]
    assert sample_indices(4, 4) == [0, 1, 2, 3]
    assert sample_indices(1000, 2) == [0, 500]


def _rechunk(data: bytes, insert: bytes, at_fourcc: bytes) -> bytes:
    """Splice a chunk immediately before the top-level chunk whose id (or
    LIST kind) matches, fixing the RIFF size."""
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        kind = data[pos + 8:pos + 12] if cid == b"LIST" else cid
        if cid == at_fourcc or kind == at_fourcc:
            out = data[:pos] + insert + data[pos:]
            return (out[:4] + struct.pack("<I", len(out) - 8) + out[8:])
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        pos += 8 + size + (size % 2)
    raise AssertionError("fourcc not found")


def test_wild_envelope_junk_chunk_and_missing_idx1():
    frames = [make_pixels(i + 9, 24, 16) for i in range(5)]
    base = avi_encode(frames, fps=10, codec="DIB")
    # JUNK (odd size → padded) before the movi list
    junk = b"JUNK" + struct.pack("<I", 7) + b"padme!!" + b"\x00"
    wild = _rechunk(base, junk, b"movi")
    out, _ = avi_decode(wild)
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))
    # idx1 stripped entirely → sequential movi fallback
    i1 = base.index(b"idx1")
    noidx = base[:4] + struct.pack("<I", i1 - 8) + base[8:i1]
    out, _ = avi_decode(noidx)
    assert len(out) == 5
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))


def test_wild_envelope_interleaved_audio_chunks():
    frames = [make_pixels(i + 30, 24, 16) for i in range(3)]
    base = avi_encode(frames, fps=10, codec="DIB")
    # splice an audio chunk '01wb' into movi, then strip idx1 so the
    # sequential scan must SKIP it by stream-chunk id
    movi_fourcc = base.index(b"movi")
    first_ck = movi_fourcc + 4
    audio = b"01wb" + struct.pack("<I", 6) + b"\x01" * 6
    spliced = base[:first_ck] + audio + base[first_ck:]
    # fix movi LIST size + RIFF size, drop idx1 (its offsets are now stale)
    lsz_pos = movi_fourcc - 4
    lsz = struct.unpack("<I", base[lsz_pos:movi_fourcc])[0] + len(audio)
    spliced = (spliced[:lsz_pos] + struct.pack("<I", lsz)
               + spliced[movi_fourcc:])
    i1 = spliced.index(b"idx1")
    spliced = spliced[:4] + struct.pack("<I", i1 - 8) + spliced[8:i1]
    out, _ = avi_decode(spliced)
    assert len(out) == 3
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))


def test_unsupported_compression_and_malformed_raise():
    frames = [make_pixels(1, 16, 16)]
    base = avi_encode(frames, codec="DIB")
    # swap BI_RGB compression dword for 'XVID'
    strf = base.index(b"strf")
    comp_pos = strf + 8 + 16
    bad = base[:comp_pos] + b"XVID" + base[comp_pos + 4:]
    with pytest.raises(ValueError, match="compression"):
        AviReader(bad)
    with pytest.raises(ValueError):
        AviReader(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError):
        avi_encode([], codec="DIB")


def test_spark_video_features_match_ground_truth_oracle(spark):
    """End-to-end differential on the DIB subset: executor-side encode →
    demux → index-sampled frames → features must equal features computed
    from ground-truth pixels with the mirrored sampling formula — the same
    contract the video_features driver entry pins."""
    from crawlspark import synth
    from crawlspark.functions.multimodal import video_features

    n = 30
    media = (synth.spark_video(spark, n, parallelism=4)
             .filter("element_at(meta, 'codec') = 'DIB'"))
    got = {(r["media_id"], r["frame_idx"]): r.asDict()
           for r in video_features(media, n_frames=4).collect()}
    expected = 0
    for i in range(n):
        if i % 3 == 0:          # MJPG — excluded
            continue
        n_frames, w, h, _fps, _codec = synth.gen_video_signal(i)
        for j in sample_indices(n_frames, 4):
            expected += 1
            px = make_pixels(synth.gen_video_frame_seed(i, j), w, h)
            g = got[(f"vid{i:06d}", j)]
            assert (g["w"], g["h"]) == (w, h)
            assert g["mean_r"] == px[..., 0].mean()
            assert g["phash"] == phash64(px)
            luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            hist = np.histogram(luma, bins=16, range=(0, 256))[0]
            assert g["luma_hist"] == hist.astype(int).tolist()
    assert len(got) == expected
