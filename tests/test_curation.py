"""Image+caption curation operators (functions/curation.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlspark import synth
from crawlspark.functions.curation import (
    DEFAULT_BUCKETS, aspect_buckets, caption_token_count, images_clean,
    jpeg_quality)
from crawlspark.jpegcodec import _Q_LUMA, quality_scale


def _images_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "w", "h", "fmt",
                                    "caption", "phash"]),
        "image_id string, w int, h int, fmt string, caption string, "
        "phash long")


def test_images_clean_filters_and_dedup(spark):
    rows = [
        ("img0", 64, 64, "png", "a b c d", 10),       # keeper
        ("img1", 64, 64, "png", "e f g h", 10),       # dup of img0's phash
        ("img2", 32, 64, "png", "a b c d", 11),       # min side fails
        ("img3", 64, 256, "png", "a b c d", 12),      # aspect 1:4 fails
        ("img4", 64, 64, "png", "a  b", 13),          # 2 tokens fail
        ("img5", 128, 48, "jpeg", "a b c d e", 14),   # aspect 8:3 ok at 3:1
    ]
    out = (images_clean(_images_df(spark, rows), min_side=48,
                        aspect_num=3, aspect_den=1, min_caption_tokens=4)
           .orderBy("image_id").collect())
    assert [(r.image_id, r.phash, r.n_dups) for r in out] == [
        ("img0", 10, 2), ("img5", 14, 1)]
    assert out[0].caption == "a b c d"  # min-id row's attrs kept


def test_caption_token_count_multispace(spark):
    df = spark.createDataFrame(
        [("x", "a  b   c",), ("y", " lead trail ",), ("z", " ",)],
        "image_id string, caption string")
    got = {r.image_id: r.n for r in df.select(
        "image_id", caption_token_count().alias("n")).collect()}
    # NBSP is NOT a split boundary: the z row is one non-empty token
    assert got == {"x": 3, "y": 2, "z": 1}


def test_aspect_buckets_hand_vectors(spark):
    # buckets: (64,64) (64,96) (96,64) (48,128) (128,48)
    rows = [
        ("sq", 50, 50, "png", "c", 0),     # exact 1:1 -> (64,64)
        ("tall", 40, 60, "png", "c", 0),   # 2:3 exact -> (64,96)
        ("wide", 90, 60, "png", "c", 0),   # 3:2 exact -> (96,64)
        ("xtall", 32, 128, "png", "c", 0),  # 1:4 nearest 48:128
        ("xwide", 128, 32, "png", "c", 0),  # 4:1 nearest 128:48
    ]
    out = {r.image_id: (r.bucket_w, r.bucket_h) for r in
           aspect_buckets(_images_df(spark, rows)).collect()}
    assert out == {"sq": (64, 64), "tall": (64, 96), "wide": (96, 64),
                   "xtall": (48, 128), "xwide": (128, 48)}


def test_aspect_buckets_tie_breaks_to_lowest_index(spark):
    # w=h and buckets [(64,64),(128,128)] both score 0 -> index 0 wins
    rows = [("t", 80, 80, "png", "c", 0)]
    out = aspect_buckets(_images_df(spark, rows),
                         buckets=[(64, 64), (128, 128)]).collect()
    assert (out[0].bucket_w, out[0].bucket_h) == (64, 64)


def test_aspect_buckets_matches_brute_force_mirror(spark):
    from math import lcm
    d = lcm(*[bh for _, bh in DEFAULT_BUCKETS])
    meta = synth.gen_images_pdf(0, 400, materialize_bytes=False)
    df = spark.createDataFrame(
        meta.drop(columns=["bytes"]),
        "image_id string, w int, h int, fmt string, caption string, "
        "phash long")
    got = {r.image_id: (r.bucket_w, r.bucket_h)
           for r in aspect_buckets(df).collect()}
    for _, row in meta.iterrows():
        scores = [(abs(int(row.w) * bh - int(row.h) * bw) * (d // bh), i)
                  for i, (bw, bh) in enumerate(DEFAULT_BUCKETS)]
        bw, bh = DEFAULT_BUCKETS[min(scores)[1]]
        assert got[row.image_id] == (bw, bh), row.image_id


def test_quality_scale_unique_in_entry_envelope():
    # the driver entry inverts tables for q in 55..95 — they must be
    # pairwise distinct for exact-match inversion to be well-defined
    tables = {quality_scale(_Q_LUMA, q).tobytes() for q in range(50, 101)}
    assert len(tables) == 51


def test_jpeg_quality_inverts_encode(spark):
    from crawlspark.imaging import make_pixels
    from crawlspark.jpegcodec import jpeg_encode, jpeg_encode_progressive
    rows, expected = [], {}
    for i, q in enumerate([55, 70, 95]):
        px = make_pixels(i, 48, 32)
        rows.append((f"b{i}", jpeg_encode(px, quality=q)))
        rows.append((f"p{i}", jpeg_encode_progressive(px, quality=q)))
        expected[f"b{i}"] = expected[f"p{i}"] = q
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r.image_id: r.q_est for r in jpeg_quality(df).collect()}
    assert got == expected


def test_jpeg_quality_nonstandard_table_is_minus_one(spark):
    # splice a non-Annex-K luma table into an otherwise valid file
    from crawlspark.imaging import make_pixels
    from crawlspark.jpegcodec import jpeg_encode, quality_scale
    data = bytearray(jpeg_encode(make_pixels(0, 32, 32), quality=80))
    from crawlspark.jpegcodec import ZIGZAG, _parse_jpeg
    import struct
    pos = data.find(b"\xff\xdb")
    assert pos > 0
    (seglen,) = struct.unpack(">H", bytes(data[pos + 2:pos + 4]))
    # first table payload: precision/id byte then 64 zigzag entries
    tbl = np.asarray(quality_scale(_Q_LUMA, 80))[ZIGZAG].astype(np.uint8)
    tbl = tbl.copy()
    tbl[0] = 255  # not any IJG scaling of the Annex K table
    data[pos + 5:pos + 69] = tbl.tobytes()
    hdr = _parse_jpeg(bytes(data))  # still structurally valid
    assert hdr["qtabs"][0][0] == 255
    df = spark.createDataFrame([("x", bytes(data))],
                               "image_id string, bytes binary")
    assert jpeg_quality(df).collect()[0].q_est == -1


def test_image_exposure_exact_counts(spark):
    import numpy as np

    from crawlspark.functions.multimodal import image_exposure
    from crawlspark.imaging import png_encode
    # 4x2 image: 3 black px (luma 0), 2 white (luma 255), 3 mid gray
    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[0, 0] = px[0, 1] = px[1, 0] = 0
    px[0, 2] = px[0, 3] = 255
    px[1, 1] = px[1, 2] = px[1, 3] = 128
    df = spark.createDataFrame([("x", png_encode(px), "png")],
                               "image_id string, bytes binary, fmt string")
    r = image_exposure(df).collect()[0]
    # luma: 0 (dark), 255 (bright), (299+587+114)*128//1000 = 128
    assert (r.n_px, r.n_dark, r.n_bright) == (8, 3, 2)
    assert r.luma_sum == 255 * 2 + 128 * 3


def test_center_crop_dims_spec():
    from crawlspark.functions.curation import center_crop_dims
    # source wider than bucket aspect: crop width, keep height
    assert center_crop_dims(100, 50, 64, 64) == (50, 50, 25, 0)
    # source taller: crop height, keep width
    assert center_crop_dims(50, 100, 64, 64) == (50, 50, 0, 25)
    # exact aspect: identity crop
    assert center_crop_dims(90, 60, 96, 64) == (90, 60, 0, 0)
    # floor semantics + centered offsets
    assert center_crop_dims(101, 50, 64, 96) == (33, 50, 34, 0)
    # crop never exceeds the source
    for w in range(31, 140, 13):
        for h in range(31, 140, 17):
            for bw, bh in DEFAULT_BUCKETS:
                cw, ch, x0, y0 = center_crop_dims(w, h, bw, bh)
                assert 0 < cw <= w and 0 < ch <= h
                assert 0 <= x0 <= w - cw and 0 <= y0 <= h - ch
                # result aspect is the bucket's within one floor unit
                # (the floored side undershoots by < 1 scaled pixel)
                assert abs(cw * bh - ch * bw) < max(bw, bh)


def test_preprocess_to_bucket_exact_pipeline(spark):
    import numpy as np

    from crawlspark.functions.curation import (center_crop_dims,
                                               preprocess_to_bucket)
    from crawlspark.functions.multimodal import _resize_nn
    from crawlspark.imaging import make_pixels, png_encode
    rows, expect = [], {}
    for i, (w, h) in enumerate([(100, 50), (50, 100), (90, 60), (64, 64),
                                (33, 129)]):
        px = make_pixels(i, w, h)
        rows.append((f"im{i}", png_encode(px), w, h, "png", "cap", 0))
        # mirror: bucket argmin + crop + NN resize + integer luma
        from math import lcm
        d = lcm(*[bh for _, bh in DEFAULT_BUCKETS])
        _, bi = min((abs(w * bh - h * bw) * (d // bh), idx)
                    for idx, (bw, bh) in enumerate(DEFAULT_BUCKETS))
        bw, bh = DEFAULT_BUCKETS[bi]
        cw, ch, x0, y0 = center_crop_dims(w, h, bw, bh)
        out = _resize_nn(px[y0:y0 + ch, x0:x0 + cw], bw, bh).astype(
            np.int64)
        luma = (299 * out[..., 0] + 587 * out[..., 1]
                + 114 * out[..., 2]) // 1000
        expect[f"im{i}"] = (bw, bh, cw, ch, x0, y0, int(luma.size),
                            int(luma.sum()))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    got = {r.image_id: (r.bucket_w, r.bucket_h, r.crop_w, r.crop_h,
                        r.x0, r.y0, r.n_px, r.luma_sum)
           for r in preprocess_to_bucket(df).collect()}
    assert got == expect


def test_clip_score_gate_matches_numpy(spark):
    import numpy as np

    from crawlspark.functions.curation import clip_score_gate
    rng = [(i, [float(((i * 7 + j * 13) % 19) - 9) / 10
                for j in range(8)],
            [float(((i * 11 + j * 5) % 17) - 8) / 10 for j in range(8)])
           for i in range(20)]
    df = spark.createDataFrame(
        rng, "pair_id long, img_emb array<float>, txt_emb array<float>")
    out = {r.pair_id: (r.clip_score, r.keep)
           for r in clip_score_gate(df, threshold=0.1).collect()}
    for pid, a, b in rng:
        av = np.asarray(a, dtype=np.float32).astype(np.float64)
        bv = np.asarray(b, dtype=np.float32).astype(np.float64)
        cos = float(av @ bv / (np.sqrt(av @ av) * np.sqrt(bv @ bv)))
        assert abs(out[pid][0] - round(cos, 6)) < 2e-6, pid
        assert out[pid][1] == (out[pid][0] >= 0.1)


def test_dominant_color_exact_and_tie_rule(spark):
    import numpy as np

    from crawlspark.functions.multimodal import dominant_color
    from crawlspark.imaging import png_encode
    # 2x3: three px of (16,0,0) -> bin 256; three of (0,16,0) -> bin 16:
    # tie -> LOWEST bin (16)
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[0, :, 0] = 16          # row 0: reddish
    px[1, :, 1] = 16          # row 1: greenish
    # and a clear-majority image: 5 of 6 px quantize to (15,15,15)
    px2 = np.full((2, 3, 3), 255, dtype=np.uint8)
    px2[0, 0] = 0
    df = spark.createDataFrame(
        [("tie", png_encode(px), "png"), ("maj", png_encode(px2), "png")],
        "image_id string, bytes binary, fmt string")
    got = {r.media_id: r for r in dominant_color(df).collect()}
    assert (got["tie"].dom_bin, got["tie"].n_dom) == (16, 3)
    assert (got["tie"].dom_r, got["tie"].dom_g, got["tie"].dom_b) == (0, 1, 0)
    assert (got["maj"].dom_bin, got["maj"].n_dom,
            got["maj"].dom_frac_ppm) == (0xFFF, 5, 5 * 1_000_000 // 6)


def test_caption_quality_flags(spark):
    from crawlspark.functions.curation import caption_quality
    rows = [
        ("f1", "IMG_1234.jpg"), ("f2", "dsc0042"), ("f3", "Screenshot 7"),
        ("u1", "see https://x.y/z now please"), ("u2", "go to www.foo.com"),
        ("s1", "a royalty-free stock photo of a dog"),
        ("d1", "1234567890"), ("short", "two words"),
        ("ok", "a lovely dog in the park"),
        ("okn", "room 42 with a view today"),
    ]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    got = {r.image_id: r for r in caption_quality(df).collect()}
    assert got["f1"].is_filename and got["f2"].is_filename
    assert got["f3"].is_filename
    assert got["u1"].has_url and got["u2"].has_url
    assert got["s1"].is_stock
    assert got["d1"].digit_ppm == 1_000_000 and not got["d1"].keep
    assert not got["short"].keep          # 2 tokens < 3
    assert got["ok"].keep and got["okn"].keep
    assert got["okn"].digit_ppm == 2 * 1_000_000 // len("room 42 with a view today")
    # keep rejects every junk class
    for k in ("f1", "f2", "f3", "u1", "u2", "s1"):
        assert not got[k].keep, k
