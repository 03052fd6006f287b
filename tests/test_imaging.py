"""Codecs, phash, PSNR, and the FIXTURES.md §1 fidelity invariant."""
import numpy as np
import pytest

from crawlspark.imaging import (decode, encode, hamming64, lossy_decode,
                                lossy_encode, make_pixels, phash64,
                                png_decode, png_encode, psnr)


def test_png_roundtrip_exact():
    px = make_pixels(7, 48, 64)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_lossy_roundtrip_psnr_above_gate():
    px = make_pixels(11, 64, 32)
    out = lossy_decode(lossy_encode(px))
    assert out.shape == px.shape
    p = psnr(px, out)
    assert p >= 40.0, p  # BASELINE.json input_hint gate


def test_make_pixels_pure():
    assert np.array_equal(make_pixels(3, 32, 32), make_pixels(3, 32, 32))
    assert not np.array_equal(make_pixels(3, 32, 32), make_pixels(4, 32, 32))


def test_phash_stability_and_duplicates():
    a = make_pixels(5, 64, 64)
    assert phash64(a) == phash64(a)
    # same content, mild lossy degradation → tiny hamming distance
    b = lossy_decode(lossy_encode(a))
    assert hamming64(phash64(a), phash64(b)) <= 4
    # different content → far
    c = make_pixels(99, 64, 64)
    assert hamming64(phash64(a), phash64(c)) > 10


def test_psnr_identical_inf():
    px = make_pixels(1, 32, 32)
    assert psnr(px, px) == float("inf")


def test_encode_dispatch():
    px = make_pixels(2, 32, 32)
    assert decode(encode(px, "png"), "png").shape == px.shape
    assert decode(encode(px, "jpeg"), "jpeg").shape == px.shape
    with pytest.raises(ValueError):
        encode(px, "bmp")
