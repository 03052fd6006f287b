"""Image+caption corpus curation — the graft cell's image-payload axis.

LAION/DataComp-style curation over the north-rule images table
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)``:

  images_clean   — metadata filters (min side, aspect-ratio envelope,
                   caption token floor) + exact perceptual-hash dedup
                   with keep-min-id and absorbed-duplicate counts.
  aspect_buckets — SDXL-style training-bucket assignment: nearest
                   aspect-ratio bucket in EXACT integer arithmetic
                   (cross-multiplied, common-denominator scores — no
                   float ratios, so Spark and any SQL oracle agree
                   bit-for-bit).
  jpeg_quality   — IJG quality estimation from the parsed DQT luma
                   table (exact table-match inversion of the libjpeg
                   quality→table scaling).
  exif_meta      — EXIF (APP1/TIFF) metadata extraction + the
                   orientation→(rotate, flip) normalization transform
                   (crawlspark.exif parser; header walk only).
  clip_score_gate — CLIP-score-style image↔caption embedding alignment
                   gate (LAION keeps pairs with cosine ≥ τ): pure-Column
                   cosine over two array<float> columns, zero Python.
  preprocess_to_bucket — SDXL-style training preprocessing: assign the
                   nearest aspect bucket, center-crop to the bucket's
                   aspect (exact integer offsets), nearest-neighbor
                   resize to the bucket dims, png re-encode; emits
                   exact-integer exposure stats of the RE-DECODED
                   result so a ground-truth-pixel oracle pins the whole
                   decode→crop→resize→encode→decode chain.

Reference tie-in: koizuka/scraper validates and saves fetched payloads
per page (scraper.go download/save paths, session.go invoke); these are
the corpus-side curation passes a training pipeline runs over the
archived payload table afterwards.

100 TB shape: images_clean's filters are pure Column exprs evaluated in
whole-stage codegen at scan speed (pushable when the metadata columns
are authoritative, as input_hint declares); the only corpus shuffle is
the phash groupBy (64-bit uniform keys — no skew). aspect_buckets is
zero-shuffle row-local arithmetic. jpeg_quality is an Arrow-batched
header walk: only the leading marker segments of each payload are
touched, payload bytes never cross py4j.
"""

from __future__ import annotations

from math import lcm

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: (bucket_w, bucket_h) training buckets spanning the synth corpus's
#: 32..128 px envelope — square, 2:3, 3:2, and the extreme aspect pair.
DEFAULT_BUCKETS: list[tuple[int, int]] = [
    (64, 64), (64, 96), (96, 64), (48, 128), (128, 48)]


def caption_token_count(caption: str | F.Column = "caption") -> F.Column:
    """Space-separated token count, robust to repeated spaces.

    Splits on a single ASCII space only: NBSP/U+3000 inside captions are
    NOT boundaries in java.util.regex or RE2, so Spark and DuckDB agree.
    """
    col = F.col(caption) if isinstance(caption, str) else caption
    return F.size(F.filter(F.split(col, " "), lambda t: t != ""))


def curation_predicate(min_side: int = 48, aspect_num: int = 3,
                       aspect_den: int = 1, min_caption_tokens: int = 4
                       ) -> F.Column:
    """The keep-row predicate images_clean and the streaming ingest twin
    share (one definition so batch and stream cannot drift): min side,
    integer cross-multiplied aspect envelope, caption token floor."""
    w, h = F.col("w"), F.col("h")
    return ((F.least(w, h) >= min_side)
            & (w * aspect_den <= h * aspect_num)
            & (h * aspect_den <= w * aspect_num)
            & (caption_token_count("caption") >= min_caption_tokens))


def images_clean(images: DataFrame, min_side: int = 48,
                 aspect_num: int = 3, aspect_den: int = 1,
                 min_caption_tokens: int = 4) -> DataFrame:
    """Filter + dedup an image+caption corpus for training.

    Keeps rows whose min(w, h) >= ``min_side``, whose aspect ratio lies
    within [den/num, num/den] (checked by integer cross-multiplication),
    and whose caption has at least ``min_caption_tokens`` space tokens;
    then collapses exact perceptual-hash duplicates keeping the minimum
    image_id, with ``n_dups`` counting the collapsed group size.

    Output: (image_id, w, h, fmt, caption, phash, n_dups).
    """
    kept = images.filter(curation_predicate(
        min_side, aspect_num, aspect_den, min_caption_tokens))
    keep = F.min_by(F.struct("image_id", "w", "h", "fmt", "caption"),
                    F.col("image_id")).alias("keep")
    return (kept.groupBy("phash")
            .agg(keep, F.count(F.lit(1)).cast("int").alias("n_dups"))
            .select(F.col("keep.image_id").alias("image_id"),
                    F.col("keep.w").alias("w"),
                    F.col("keep.h").alias("h"),
                    F.col("keep.fmt").alias("fmt"),
                    F.col("keep.caption").alias("caption"),
                    "phash", "n_dups"))


def aspect_buckets(images: DataFrame,
                   buckets: list[tuple[int, int]] | None = None
                   ) -> DataFrame:
    """Assign each image to its nearest aspect-ratio training bucket.

    Nearest = argmin over buckets of |w/h - bw/bh|, computed EXACTLY:
    |w*bh - h*bw| / (h*bh) compared across buckets by scaling each
    numerator with D/bh (D = lcm of all bucket heights; h > 0 cancels).
    Ties break to the lowest bucket index. All integer — a SQL oracle
    reproduces the argmin bit-for-bit with a different algorithm
    (cross join + window).

    Output: (image_id, w, h, bucket_w, bucket_h).
    """
    bw_col, bh_col = bucket_choice_cols(buckets)
    return images.select(
        "image_id", "w", "h",
        bw_col.alias("bucket_w"), bh_col.alias("bucket_h"))


def bucket_choice_cols(buckets: list[tuple[int, int]] | None = None
                       ) -> tuple[F.Column, F.Column]:
    """(bucket_w, bucket_h) Columns for the exact-integer nearest-aspect
    argmin over ``w``/``h`` (the arithmetic aspect_buckets documents —
    one definition so the standalone rollup and preprocess_to_bucket
    cannot drift)."""
    buckets = DEFAULT_BUCKETS if buckets is None else buckets
    d = lcm(*[bh for _, bh in buckets])
    w, h = F.col("w"), F.col("h")
    scored = [F.struct(
        (F.abs(w * bh - h * bw) * (d // bh)).cast("long").alias("score"),
        F.lit(i).alias("idx"))
        for i, (bw, bh) in enumerate(buckets)]
    best = F.array_min(F.array(*scored))
    bw_arr = F.array(*[F.lit(bw) for bw, _ in buckets])
    bh_arr = F.array(*[F.lit(bh) for _, bh in buckets])
    return (F.element_at(bw_arr, best["idx"] + 1),
            F.element_at(bh_arr, best["idx"] + 1))


def center_crop_dims(w: int, h: int, bw: int, bh: int
                     ) -> tuple[int, int, int, int]:
    """The EXACT integer center-crop spec (pure function — the Spark
    kernel and any oracle call this same arithmetic): largest centered
    sub-rectangle of (w, h) with aspect ≤ the bucket's, floor division
    throughout. Returns (crop_w, crop_h, x0, y0)."""
    if w * bh >= h * bw:          # source wider than the bucket aspect
        crop_h, crop_w = h, (h * bw) // bh
    else:
        crop_w, crop_h = w, (w * bh) // bw
    return crop_w, crop_h, (w - crop_w) // 2, (h - crop_h) // 2


def preprocess_to_bucket(images: DataFrame,
                         buckets: list[tuple[int, int]] | None = None,
                         dark_max: int = 15, bright_min: int = 240
                         ) -> DataFrame:
    """SDXL-style training preprocessing of an image+caption corpus.

    Per image: nearest-aspect bucket (exact integer argmin, JVM-side) →
    decode → center crop to the bucket aspect (center_crop_dims) →
    nearest-neighbor resize to (bucket_w, bucket_h) (the ``(i*src)//dst``
    index spec shared with resize_images) → png re-encode → re-decode →
    exact-integer exposure stats of the result. Because every stage is
    an exact integer spec, a codec-free oracle over ground-truth pixels
    matches bit-for-bit — pinning decode, crop, resize, AND the png
    round-trip in one entry.

    Output: (image_id, bucket_w, bucket_h, crop_w, crop_h, x0, y0,
    n_px, n_dark, n_bright, luma_sum).

    100 TB shape: bucket assignment is whole-stage codegen; the pixel
    work is ONE Arrow-batched map pass, zero shuffles; training shards
    can then be written partitioned by (bucket_w, bucket_h) so each
    training task reads one homogeneous resolution.
    """
    from ..imaging import decode, png_decode, png_encode
    from .multimodal import _resize_nn

    def kern(batches):
        cols = ["image_id", "bucket_w", "bucket_h", "crop_w", "crop_h",
                "x0", "y0", "n_px", "n_dark", "n_bright", "luma_sum"]
        for pdf in batches:
            rows = []
            for mid, data, fmt, bw, bh in zip(
                    pdf["image_id"], pdf["bytes"], pdf["fmt"],
                    pdf["bucket_w"], pdf["bucket_h"]):
                if data is None:
                    continue
                bw, bh = int(bw), int(bh)
                px = decode(bytes(data), fmt)
                h, w = px.shape[:2]
                cw, ch, x0, y0 = center_crop_dims(w, h, bw, bh)
                out = _resize_nn(px[y0:y0 + ch, x0:x0 + cw], bw, bh)
                out = png_decode(png_encode(out)).astype(np.int64)
                luma = (299 * out[..., 0] + 587 * out[..., 1]
                        + 114 * out[..., 2]) // 1000
                rows.append({
                    "image_id": mid, "bucket_w": bw, "bucket_h": bh,
                    "crop_w": cw, "crop_h": ch, "x0": x0, "y0": y0,
                    "n_px": int(luma.size),
                    "n_dark": int((luma <= dark_max).sum()),
                    "n_bright": int((luma >= bright_min).sum()),
                    "luma_sum": int(luma.sum())})
            yield pd.DataFrame(rows, columns=cols)

    bw_col, bh_col = bucket_choice_cols(buckets)
    staged = images.select(
        "image_id", "bytes", "fmt",
        bw_col.alias("bucket_w"), bh_col.alias("bucket_h"))
    return staged.mapInPandas(
        kern, "image_id string, bucket_w int, bucket_h int, crop_w int, "
              "crop_h int, x0 int, y0 int, n_px int, n_dark int, "
              "n_bright int, luma_sum long")


#: Caption-junk regexes, java.util.regex ∩ RE2 common subset (the repo's
#: cross-engine discipline — see text.PII_PATTERNS): character classes,
#: alternation, anchors, (?i) only. No \b, no lookarounds.
CAPTION_FILENAME_RE = (r"(?i)^(img|dsc|dscn|image|photo|pic|untitled|"
                       r"screenshot|scan)[-_ ]?[0-9]*"
                       r"(\.(jpe?g|png|gif|webp|bmp))?$")
CAPTION_URL_RE = r"(?i)(https?://|www\.)"
CAPTION_STOCK_RE = (r"(?i)(stock (photo|image|vector)|royalty[- ]free|"
                    r"getty images|shutterstock|alamy|dreamstime|"
                    r"istockphoto|123rf|watermark)")


def caption_quality(images: DataFrame, caption_col: str = "caption",
                    min_tokens: int = 3, max_digit_ppm: int = 300_000
                    ) -> DataFrame:
    """Alt-text junk detection — the caption-side curation pass (LAION
    drops filename-like and boilerplate alt text before training).

    Flags per row, all pure Column (scan speed, zero Python):
      is_filename — the whole caption is a camera/filename pattern
                    ("IMG_1234.jpg", "DSC 0042").
      has_url     — contains an http(s):// or www. fragment.
      is_stock    — stock-agency boilerplate / watermark mentions.
      digit_ppm   — integer digit density (digits · 10^6 div chars).
      n_tokens    — space-token count (caption_token_count).
      keep        — none of the junk flags, ≥ min_tokens tokens, digit
                    density ≤ max_digit_ppm.

    Appends the columns; regexes live in the java-regex/RE2 common
    subset so any SQL twin finds the identical match set.
    """
    c = F.col(caption_col)
    n_digits = (F.length(c)
                - F.length(F.regexp_replace(c, r"[0-9]", ""))).cast("long")
    staged = images.withColumns({
        "_cq_digits": n_digits, "_cq_len": F.length(c).cast("long")})
    out = staged.withColumns({
        "is_filename": c.rlike(CAPTION_FILENAME_RE),
        "has_url": c.rlike(CAPTION_URL_RE),
        "is_stock": c.rlike(CAPTION_STOCK_RE),
        # exact integer division (div), matching SQL's // bit-for-bit
        "digit_ppm": F.expr("case when _cq_len > 0 then "
                            "(_cq_digits * 1000000) div _cq_len "
                            "else 0 end"),
        "n_tokens": caption_token_count(c).cast("int"),
    }).drop("_cq_digits", "_cq_len")
    return out.withColumn(
        "keep",
        ~F.col("is_filename") & ~F.col("has_url") & ~F.col("is_stock")
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("digit_ppm") <= max_digit_ppm))


def clip_score_gate(pairs: DataFrame, img_col: str = "img_emb",
                    txt_col: str = "txt_emb", threshold: float = 0.28,
                    id_col: str = "pair_id") -> DataFrame:
    """CLIP-score-style image↔caption alignment gate (LAION-5B keeps
    pairs whose image/text embedding cosine ≥ 0.28).

    Cosine is a pure Column expression (zip_with dot product + aggregate
    norms — dedup.cosine_sim, the same arithmetic the ANN entries pin
    against DuckDB's list_cosine_similarity), rounded to 6 dp BEFORE the
    threshold compare so the keep decision is reproducible across
    engines at the boundary.

    Output: (pair_id, clip_score double, keep boolean) — all pairs with
    the decision, so downstream can audit the rejected tail.

    100 TB shape: zero shuffles, whole-stage codegen scan pass; the
    filter is applied where the corpus lives.
    """
    from .dedup import cosine_sim
    score = F.round(cosine_sim(
        F.col(img_col).cast("array<double>"),
        F.col(txt_col).cast("array<double>")), 6)
    return pairs.select(
        F.col(id_col),
        score.alias("clip_score")).withColumn(
        "keep", F.col("clip_score") >= threshold)


def exif_meta(images: DataFrame, id_col: str = "image_id",
              bytes_col: str = "bytes") -> DataFrame:
    """Extract EXIF metadata + the orientation-normalization transform.

    Arrow-batched header walk (crawlspark.exif — marker scan to APP1,
    TIFF IFD parse, entropy data untouched; payload bytes never cross
    py4j). Missing APP1-Exif → has_exif=false with null fields;
    structurally damaged EXIF raises loudly (same posture as the
    codecs). The rotate/flip normalization columns are derived JVM-side
    from the parsed orientation via the public TIFF 6.0 mapping
    (ORIENT_ROT_DEG / ORIENT_FLIP_H).

    Output: (image_id, has_exif, byte_order, orientation, make,
    x_res_num, x_res_den, pix_x, pix_y, dt_original, rot_deg, flip_h).

    100 TB shape: one mapInPandas pass, zero shuffles; per-row work is
    bounded by the JPEG header (entropy segments are skipped by length
    fields, never scanned).
    """

    def walk(batches):
        from ..exif import parse_exif
        cols = ["image_id", "has_exif", "byte_order", "orientation",
                "make", "x_res_num", "x_res_den", "pix_x", "pix_y",
                "dt_original"]
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    continue
                d = parse_exif(bytes(data))
                xr = (d or {}).get("x_resolution")
                rows.append({
                    "image_id": mid, "has_exif": d is not None,
                    "byte_order": (d or {}).get("byte_order"),
                    "orientation": (d or {}).get("orientation"),
                    "make": (d or {}).get("make"),
                    "x_res_num": None if xr is None else xr[0],
                    "x_res_den": None if xr is None else xr[1],
                    "pix_x": (d or {}).get("pixel_x"),
                    "pix_y": (d or {}).get("pixel_y"),
                    "dt_original": (d or {}).get("dt_original")})
            pdf_out = pd.DataFrame(rows, columns=cols)
            for c in ("orientation", "x_res_num", "x_res_den",
                      "pix_x", "pix_y"):
                pdf_out[c] = pdf_out[c].astype("Int64")
            yield pdf_out

    from ..exif import ORIENT_FLIP_H, ORIENT_ROT_DEG
    parsed = (images.select(id_col, bytes_col).mapInPandas(
        walk,
        "image_id string, has_exif boolean, byte_order string, "
        "orientation int, make string, x_res_num int, x_res_den int, "
        "pix_x int, pix_y int, dt_original string"))
    rot = F.array(*[F.lit(d) for d in ORIENT_ROT_DEG])
    flip = F.array(*[F.lit(b) for b in ORIENT_FLIP_H])
    o = F.col("orientation")
    valid = o.isNotNull() & (o >= 1) & (o <= 8)
    return parsed.withColumns({
        "rot_deg": F.when(valid, F.element_at(rot, o)).cast("int"),
        "flip_h": F.when(valid, F.element_at(flip, o))})


def exif_scrub(images: DataFrame, id_col: str = "image_id",
               bytes_col: str = "bytes", verify_pixels: bool = False
               ) -> DataFrame:
    """Privacy scrub: drop every APP1-Exif segment from the payload
    (GPS, serial numbers, timestamps) while byte-preserving everything
    else — the image-side analog of text.scrub_pii, and what public
    image+caption corpus builds do before release.

    Output: (image_id, bytes, had_exif, n_bytes_before, n_bytes_after
    [, pixels_equal]). With ``verify_pixels`` the scrubbed payload is
    decoded against the original and compared exactly (differential
    self-check for audits — costs a double decode; leave off on the
    hot path, where byte-preservation outside APP1 already guarantees
    it).

    100 TB shape: one Arrow-batched header walk, zero shuffles; only
    leading marker segments are copied around, the entropy stream is
    a single slice."""

    def kern(batches):
        import numpy as np

        from ..exif import strip_exif
        from ..imaging import decode
        cols = ["image_id", "bytes", "had_exif", "n_bytes_before",
                "n_bytes_after"] + (["pixels_equal"] if verify_pixels
                                    else [])
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    continue
                data = bytes(data)
                clean, had = strip_exif(data)
                row = {"image_id": mid, "bytes": clean, "had_exif": had,
                       "n_bytes_before": len(data),
                       "n_bytes_after": len(clean)}
                if verify_pixels:
                    row["pixels_equal"] = bool(np.array_equal(
                        decode(data, "jpeg"), decode(clean, "jpeg")))
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    schema = ("image_id string, bytes binary, had_exif boolean, "
              "n_bytes_before int, n_bytes_after int")
    if verify_pixels:
        schema += ", pixels_equal boolean"
    return images.select(id_col, bytes_col).mapInPandas(kern, schema)


def jpeg_quality(images: DataFrame, id_col: str = "image_id",
                 bytes_col: str = "bytes") -> DataFrame:
    """Estimate the IJG encode quality of baseline/progressive JPEGs.

    Parses the DQT segment (header walk only — entropy data untouched)
    and inverts the libjpeg quality→table scaling by exact match against
    the 100 candidate scaled Annex K luma tables; the highest matching
    quality wins ties. Non-matching (non-Annex-K) tables yield -1.

    Output: (image_id, q_est int). Arrow-batched; the candidate table is
    built once per python worker.
    """

    def est(batches):
        from ..jpegcodec import _Q_LUMA, _parse_jpeg, quality_scale
        cand: dict[bytes, int] = {}
        for q in range(1, 101):  # ascending: max quality wins tie keys
            cand[quality_scale(_Q_LUMA, q).tobytes()] = q
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    continue
                hdr = _parse_jpeg(bytes(data))
                tbl = hdr["qtabs"][hdr["comp_q"][0]]
                key = np.ascontiguousarray(
                    tbl, dtype=np.int32).tobytes()
                rows.append({"image_id": mid,
                             "q_est": cand.get(key, -1)})
            yield pd.DataFrame(rows, columns=["image_id", "q_est"])

    return (images.select(id_col, bytes_col)
            .mapInPandas(est, "image_id string, q_est int"))
