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


def test_image_patches_spark_matches_ground_truth(spark):
    """Patch tiles over real encoded PNG bytes == tiles computed from the
    ground-truth pixel generator (decode identity + kernel, bit-exact),
    including the edge-remainder drop on non-multiple sizes."""
    import numpy as np
    import pandas as pd
    from crawlspark import synth
    from crawlspark.functions.multimodal import image_patches
    from crawlspark import imaging
    rows = [synth.gen_image_row(i) for i in range(30) if i % 3]  # png only
    pdf = pd.DataFrame(rows)[["image_id", "bytes", "w", "h", "fmt"]]
    df = spark.createDataFrame(pdf)
    got = {(r["media_id"], r["patch_row"], r["patch_col"]):
           (r["n_px"], r["sum_r"], r["sum_g"], r["sum_b"])
           for r in image_patches(df, patch=16).collect()}
    want = {}
    P = 16
    for row in rows:
        i = int(row["image_id"][3:])
        src = i - 1 if (i % 101 == 100 and i > 0) else i
        px = imaging.make_pixels(src, int(row["w"]),
                                 int(row["h"])).astype(np.int64)
        gh, gw = px.shape[0] // P, px.shape[1] // P
        t = px[:gh * P, :gw * P].reshape(gh, P, gw, P, 3).sum(axis=(1, 3))
        for r_ in range(gh):
            for c_ in range(gw):
                want[(row["image_id"], r_, c_)] = (
                    P * P, int(t[r_, c_, 0]), int(t[r_, c_, 1]),
                    int(t[r_, c_, 2]))
    assert got == want
    assert len(got) > 30   # multiple patches per image
