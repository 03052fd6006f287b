"""Baseline JPEG codec (crawlspark.jpegcodec) — spec structure, round-trip
fidelity vs the 40 dB payload gate, decoder robustness, legacy CSJL sniff.

No image library exists in the container, so correctness is pinned by
(a) independent recomputation of the spec's fixed structures (zigzag walk,
canonical Huffman code properties, DCT orthonormality), (b) container-level
marker checks, and (c) encode→decode differential against ground-truth
pixels — the same differential contract the driver applies to the png path.
"""

import numpy as np
import pytest

from crawlspark import jpegcodec as jc
from crawlspark.imaging import decode, encode, lossy_encode, make_pixels, psnr


# --- fixed spec structures ----------------------------------------------------

def test_zigzag_is_permutation_with_known_walk():
    # first 10 entries of the T.81 Figure 5 walk, natural (row*8+col) index
    assert list(jc.ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(jc.ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(jc.ZIGZAG) == list(range(64))
    assert np.array_equal(jc.ZIGZAG[jc.UNZIGZAG], np.arange(64))


def test_dct_matrix_is_orthonormal_and_idct_inverts():
    eye = jc._D8 @ jc._D8.T
    assert np.allclose(eye, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(7)
    blocks = rng.uniform(-128, 127, (5, 8, 8))
    assert np.allclose(jc.idct2_blocks(jc.dct2_blocks(blocks)), blocks,
                       atol=1e-9)


def test_canonical_huffman_codes_are_prefix_free():
    for key, codes in jc._STD_CODES.items():
        by_len = sorted((ln, code) for code, ln in codes.values())
        seen = []
        for ln, code in by_len:
            for pln, pcode in seen:
                assert code >> (ln - pln) != pcode, (key, ln, code)
            seen.append((ln, code))
        # every code fits its declared bit length
        for code, ln in codes.values():
            assert 0 < ln <= 16 and code < (1 << ln)


def test_quality_scale_endpoints():
    assert np.all(jc.quality_scale(jc._Q_LUMA, 100) == 1)
    assert np.array_equal(jc.quality_scale(jc._Q_LUMA, 50), jc._Q_LUMA)
    assert np.all(jc.quality_scale(jc._Q_LUMA, 1) >= jc._Q_LUMA)


# --- container structure --------------------------------------------------------

def test_marker_layout():
    b = jc.jpeg_encode(make_pixels(3, 32, 32))
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in b
    # SOF0 carries the true (pre-padding) dimensions
    sof = b.index(b"\xff\xc0")
    h, w = int.from_bytes(b[sof+5:sof+7], "big"), int.from_bytes(
        b[sof+7:sof+9], "big")
    assert (h, w) == (32, 32)


def test_scan_bytes_are_stuffed():
    # after SOS, any 0xFF inside the entropy stream must be followed by 0x00
    b = jc.jpeg_encode(make_pixels(11, 64, 64))
    sos = b.index(b"\xff\xda")
    seglen = int.from_bytes(b[sos+2:sos+4], "big")
    scan = b[sos + 2 + seglen:-2]
    i = 0
    while i < len(scan) - 1:
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00
            i += 2
        else:
            i += 1


# --- round trip -------------------------------------------------------------------

@pytest.mark.parametrize("w,h", [(8, 8), (32, 32), (48, 80), (100, 52),
                                 (1, 1), (7, 13)])
def test_roundtrip_psnr_above_gate(w, h):
    px = make_pixels(3, w, h)
    out = jc.jpeg_decode(jc.jpeg_encode(px))
    assert out.shape == px.shape
    p = psnr(px, out)
    assert p == float("inf") or p >= 42.0  # 40 dB gate + margin


def test_flat_image_roundtrips_exactly():
    px = np.full((16, 24, 3), 77, np.uint8)
    assert np.array_equal(jc.jpeg_decode(jc.jpeg_encode(px)), px)


def test_encode_is_deterministic():
    px = make_pixels(5, 64, 64)
    assert jc.jpeg_encode(px) == jc.jpeg_encode(px)


def test_quality_tradeoff_monotone():
    px = make_pixels(9, 48, 48)
    sizes, psnrs = [], []
    for q in (50, 80, 95, 100):
        b = jc.jpeg_encode(px, q)
        sizes.append(len(b))
        psnrs.append(psnr(px, jc.jpeg_decode(b)))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


# --- integration with the imaging dispatch ----------------------------------------

def test_imaging_jpeg_is_real_jfif_and_legacy_csjl_still_decodes():
    px = make_pixels(4, 32, 48)
    b = encode(px, "jpeg")
    assert b[:2] == b"\xff\xd8"
    assert psnr(px, decode(b, "jpeg")) >= 40.0
    legacy = lossy_encode(px)
    assert legacy[:4] == b"CSJL"
    assert psnr(px, decode(legacy, "jpeg")) >= 40.0


# --- robustness --------------------------------------------------------------------

def test_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        jc.jpeg_decode(b"not a jpeg")
    with pytest.raises(ValueError):
        jc.jpeg_decode(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF/SOS


# --- 4:2:0 subsampling and restart intervals ---------------------------------------

def _smooth(w, h):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack([(ys * 2) % 256, (xs * 3) % 256, (ys + xs) % 256],
                    axis=-1).astype(np.uint8)


@pytest.mark.parametrize("w,h", [(48, 64), (15, 9), (17, 33)])
def test_420_roundtrip_on_smooth_content(w, h):
    px = _smooth(w, h)
    b = jc.jpeg_encode(px, 95, subsampling="420")
    sof = b.index(b"\xff\xc0")
    assert b[sof + 11] == 0x22  # Y sampling 2x2
    out = jc.jpeg_decode(b)
    assert out.shape == px.shape
    assert psnr(px, out) >= 35.0  # chroma subsampled: below the 444 gate


def test_420_is_smaller_than_444():
    px = _smooth(64, 64)
    assert len(jc.jpeg_encode(px, 95, subsampling="420")) < len(
        jc.jpeg_encode(px, 95, subsampling="444"))


@pytest.mark.parametrize("dri", [1, 3, 7])
def test_restart_interval_stream_decodes_identically(dri):
    px = make_pixels(3, 100, 52)
    b = jc.jpeg_encode(px, restart_interval=dri)
    assert b"\xff\xdd" in b  # DRI marker present
    assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
    assert np.array_equal(jc.jpeg_decode(b),
                          jc.jpeg_decode(jc.jpeg_encode(px)))


def test_420_with_restarts():
    px = _smooth(48, 48)
    b = jc.jpeg_encode(px, 95, subsampling="420", restart_interval=2)
    assert psnr(px, jc.jpeg_decode(b)) >= 35.0


def test_unknown_subsampling_rejected():
    with pytest.raises(ValueError):
        jc.jpeg_encode(make_pixels(1, 8, 8), subsampling="411")


def test_decoder_survives_corrupted_streams():
    # a crawler feeds the decoder arbitrary bytes: every corruption must
    # either decode (benign bit damage) or raise — bounded time, no hangs.
    base = bytearray(jc.jpeg_encode(make_pixels(7, 48, 32)))
    rng = np.random.default_rng(23)
    outcomes = {"ok": 0, "err": 0}
    for _ in range(200):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            buf[int(rng.integers(2, len(buf)))] = int(rng.integers(0, 256))
        try:
            out = jc.jpeg_decode(bytes(buf))
            assert isinstance(out, np.ndarray) and out.ndim == 3
            outcomes["ok"] += 1
        except Exception:
            outcomes["err"] += 1
    assert outcomes["ok"] + outcomes["err"] == 200


def test_decoder_truncation_never_hangs():
    b = jc.jpeg_encode(make_pixels(2, 32, 32))
    for cut in range(2, len(b), max(1, len(b) // 64)):
        try:
            jc.jpeg_decode(b[:cut])
        except Exception:
            pass


def test_decoder_rejects_implausible_dimensions():
    # hand-build SOI + SOF0 declaring 65535x65535
    import struct as _s
    sof = (b"\x08" + b"\xff\xff\xff\xff" + b"\x03"
           + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    data = (b"\xff\xd8\xff\xc0" + _s.pack(">H", len(sof) + 2) + sof
            + b"\xff\xd9")
    with pytest.raises(ValueError):
        jc.jpeg_decode(data)


def test_grayscale_single_component_roundtrip():
    gray = (make_pixels(6, 40, 24).astype(np.float64)
            @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    b = jc.jpeg_encode_gray(gray)
    sof = b.index(b"\xff\xc0")
    assert b[sof + 9] == 1  # 1 component
    out = jc.jpeg_decode(b)
    assert out.shape == (24, 40, 3)
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 0], out[..., 2])
    assert psnr(np.repeat(gray[..., None], 3, -1), out) >= 40.0


# --- progressive (SOF2) --------------------------------------------------------------

@pytest.mark.parametrize("w,h,seed", [(8, 8, 1), (32, 32, 3), (48, 80, 5),
                                      (100, 52, 9), (7, 13, 2), (1, 1, 0)])
def test_progressive_decodes_identically_to_baseline(w, h, seed):
    # same quantized coefficients, different entropy layout => bit-equal
    # pixels. This single equivalence exercises the whole progressive
    # machinery: DC first/refine, AC spectral bands, EOBRUN, ZRL splits,
    # correction bits at two successive-approximation levels.
    px = make_pixels(seed, w, h)
    prog = jc.jpeg_encode_progressive(px)
    assert b"\xff\xc2" in prog  # SOF2
    assert np.array_equal(jc.jpeg_decode(prog),
                          jc.jpeg_decode(jc.jpeg_encode(px)))


def test_progressive_has_many_scans():
    prog = jc.jpeg_encode_progressive(make_pixels(4, 32, 32))
    assert prog.count(b"\xff\xda") == len(jc._PROG_SCRIPT)


def test_progressive_is_deterministic():
    px = make_pixels(5, 40, 24)
    assert jc.jpeg_encode_progressive(px) == jc.jpeg_encode_progressive(px)


def test_progressive_survives_corruption():
    base = bytearray(jc.jpeg_encode_progressive(make_pixels(7, 48, 32)))
    rng = np.random.default_rng(31)
    for _ in range(150):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            buf[int(rng.integers(2, len(buf)))] = int(rng.integers(0, 256))
        try:
            out = jc.jpeg_decode(bytes(buf))
            assert isinstance(out, np.ndarray)
        except Exception:
            pass


def test_progressive_truncation_never_hangs():
    b = jc.jpeg_encode_progressive(make_pixels(2, 32, 32))
    for cut in range(2, len(b), max(1, len(b) // 80)):
        try:
            jc.jpeg_decode(b[:cut])
        except Exception:
            pass


def test_progressive_decoder_accepts_aggregated_eobn_runs():
    # Our encoder flushes EOB runs per block (standard tables lack EOBn),
    # but wild progressive files aggregate runs under custom tables. Hand-
    # assemble one: 8x24 grayscale, DC scan all-zero, AC scan placing +1 at
    # zigzag k=1 of block 0 then EOB1(ext=1) covering blocks 0(rest),1,2.
    import struct as _s
    # custom tables: DC = {0: 1-bit code}, AC = {0x01, 0x10: 2-bit codes}
    dc_bits, dc_vals = [1] + [0] * 15, [0]
    ac_bits, ac_vals = [0, 2] + [0] * 14, [0x01, 0x10]

    def pack(bits):  # MSB-first, 1-padded
        out, acc, n = bytearray(), 0, 0
        for b in bits:
            acc = (acc << 1) | b
            n += 1
            if n == 8:
                out.append(acc)
                acc, n = 0, 0
        if n:
            out.append((acc << (8 - n)) | ((1 << (8 - n)) - 1))
        return bytes(out)

    head = bytearray(b"\xff\xd8")
    q = bytes([0]) + bytes([1] * 64)  # quant table 0: all ones
    head += b"\xff\xdb" + _s.pack(">H", len(q) + 2) + q
    sof = b"\x08" + _s.pack(">HH", 24, 8) + b"\x01" + bytes([1, 0x11, 0])
    head += b"\xff\xc2" + _s.pack(">H", len(sof) + 2) + sof
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        p = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        head += b"\xff\xc4" + _s.pack(">H", len(p) + 2) + p
    # scan 1: DC first — 3 blocks x DC table symbol 0 ("0", 1 bit each)
    sos1 = b"\x01" + bytes([1, 0x00]) + bytes([0, 0, 0])
    head += b"\xff\xda" + _s.pack(">H", len(sos1) + 2) + sos1
    head += pack([0, 0, 0])
    # scan 2: AC first band 1-63 — block0: sym 0x01 ("01") + value bit 1;
    # then EOB1 ("10") + 1 ext bit (1) => eobrun covers blocks 0..2
    sos2 = b"\x01" + bytes([1, 0x00]) + bytes([1, 63, 0])
    head += b"\xff\xda" + _s.pack(">H", len(sos2) + 2) + sos2
    head += pack([0, 1, 1, 1, 0, 1])
    head += b"\xff\xd9"

    out = jc.jpeg_decode(bytes(head))
    assert out.shape == (24, 8, 3)
    # expected: block 0 = IDCT of coefficient +1 at natural position
    # ZIGZAG[1] (=1), blocks 1,2 flat 128 (DC 0 + level shift)
    coefs = np.zeros((1, 8, 8))
    coefs[0].flat[int(jc.ZIGZAG[1])] = 1.0
    exp0 = np.clip(np.round(jc.idct2_blocks(coefs)[0] + 128), 0, 255)
    assert np.array_equal(out[:8, :, 0].astype(float), exp0)
    assert np.all(out[8:, :, :] == 128)


# --- optimized Huffman tables (T.81 K.2) ---------------------------------------------

@pytest.mark.parametrize("kwargs", [
    {"optimize_tables": True},
    {"optimize_tables": True, "subsampling": "420"},
    {"optimize_tables": True, "restart_interval": 3},
])
def test_optimized_tables_decode_identically_and_shrink(kwargs):
    px = make_pixels(9, 64, 48)
    std = jc.jpeg_encode(px, 95, **{k: v for k, v in kwargs.items()
                                    if k != "optimize_tables"})
    opt = jc.jpeg_encode(px, 95, **kwargs)
    assert np.array_equal(jc.jpeg_decode(std), jc.jpeg_decode(opt))
    assert len(opt) < len(std)


def test_optimized_progressive_aggregates_eob_runs():
    # with per-image tables the encoder defers EOB runs, emitting EOBn
    # (r>=1) symbols — our decoder's aggregated-run path, now exercised by
    # our own encoder as well as the hand-built stream
    px = make_pixels(3, 100, 52)
    opt = jc.jpeg_encode_progressive(px, optimize_tables=True)
    std = jc.jpeg_encode_progressive(px)
    assert len(opt) < len(std)
    assert np.array_equal(jc.jpeg_decode(opt),
                          jc.jpeg_decode(jc.jpeg_encode(px)))


def test_optimal_table_is_prefix_free_and_complete():
    rng = np.random.default_rng(5)
    freq = np.zeros(257, np.int64)
    idx = rng.integers(0, 256, 40)
    freq[idx] += rng.integers(1, 1000, 40)
    bits, vals = jc._optimal_table(freq)
    assert sum(bits) == len(vals) == len({int(i) for i in idx})
    codes = jc._canonical_codes(bits, vals)
    assert set(codes) == {int(i) for i in idx}  # every used symbol coded
    lens = sorted((ln, c) for c, ln in codes.values())
    for i, (ln, c) in enumerate(lens):
        assert ln <= 16
        for pln, pc in lens[:i]:
            assert c >> (ln - pln) != pc  # prefix-free


def test_multiscan_baseline_duplicate_component_rejected():
    """Multi-scan baseline now DECODES (see the multiscan tests below),
    but a scan set where a component appears twice is still illegal
    (T.81 B.2.3) and must fail loudly — e.g. a doctored file whose first
    interleaved scan is duplicated wholesale."""
    import re

    import numpy as np
    import pytest

    from crawlspark import jpegcodec

    img = (np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3))
    buf = jpegcodec.jpeg_encode(img, quality=90)
    # craft a second scan by duplicating everything from the first SOS
    # marker up to (not including) EOI, then re-appending EOI
    sos = buf.find(b"\xff\xda")
    assert sos > 0 and buf.endswith(b"\xff\xd9")
    body = buf[sos:-2]
    doctored = buf[:-2] + body + b"\xff\xd9"
    with pytest.raises(ValueError, match=re.escape("repeated")):
        jpegcodec.jpeg_decode(doctored)


# --- multi-scan baseline (T.81 A.2.2 non-interleaved layout) ------------------

def test_multiscan_baseline_decodes_bit_equal_to_interleaved():
    """Three single-component full-band scans carry the same quantized
    coefficients as the one interleaved scan, so decoded pixels must be
    bit-equal (round-3 VERDICT #4: this legal layout used to fail)."""
    for seed, w, h in ((3, 48, 32), (11, 33, 17)):
        px = make_pixels(seed, w, h)
        inter = jc.jpeg_decode(jc.jpeg_encode(px, quality=90))
        multi = jc.jpeg_decode(jc.jpeg_encode_multiscan(px, quality=90))
        assert np.array_equal(inter, multi)


def test_multiscan_with_restart_interval():
    px = make_pixels(5, 40, 24)
    inter = jc.jpeg_decode(jc.jpeg_encode(px, quality=92))
    multi = jc.jpeg_decode(
        jc.jpeg_encode_multiscan(px, quality=92, restart_interval=4))
    assert np.array_equal(inter, multi)


def test_multiscan_incomplete_cover_raises_loudly():
    """Dropping the trailing Cr scan must raise, not silently decode with
    zero chroma coefficients (the silent-wrong-colors failure mode)."""
    b = jc.jpeg_encode_multiscan(make_pixels(7, 32, 32))
    # cut at the LAST SOS marker (0xFFDA), keep the EOI so the container
    # still terminates cleanly — a structurally plausible truncation
    last_sos = b.rfind(b"\xff\xda")
    assert last_sos > 0
    with pytest.raises(ValueError):
        jc.jpeg_decode(b[:last_sos] + b"\xff\xd9")


def test_multiscan_corruption_fuzz_never_hangs():
    base = bytearray(jc.jpeg_encode_multiscan(make_pixels(9, 32, 24)))
    rng = np.random.default_rng(41)
    for _ in range(100):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            buf[int(rng.integers(2, len(buf)))] = int(rng.integers(0, 256))
        try:
            out = jc.jpeg_decode(bytes(buf))
            assert isinstance(out, np.ndarray) and out.ndim == 3
        except Exception:
            pass
