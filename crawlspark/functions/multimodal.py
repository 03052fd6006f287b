"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery — schemas, partition-friendly layout, Arrow batch
shapes, mapInPandas signatures — is real and tested. Heavy codecs the
container lacks are stubbed deterministically and clearly marked:

  image decode   — REAL for 'png' and the deterministic fake-lossy 'jpeg'
                   stand-in (crawlspark.imaging, pure numpy); real JPEG via
                   PIL when importable.
  image resize   — REAL (nearest-neighbor, numpy).
  image features — REAL (mean RGB, luma histogram, phash).
  audio decode   — REAL for 'wav' (crawlspark.audiocodec: RIFF/PCM
                   8/16/24/32-bit + IEEE-float, mono/stereo, wild-chunk
                   tolerant); deterministic 'fakepcm' stand-in kept for
                   plumbing tests; compressed formats (mp3/ogg) raise.
  audio features — REAL (RMS, zero crossings, duration, spectral
                   centroid), differential-oracle checked at the driver.
  video frames   — REAL for 'avi' (crawlspark.videocodec: RIFF/AVI
                   demux, uncompressed BI_RGB exact + MJPG via the JPEG
                   codec, index-seek decodes only sampled frames);
                   'fakeframes' stand-in kept for plumbing tests;
                   mp4/webm raise.
  video features — REAL (per-sampled-frame image features), checked at
                   the driver vs ground-truth pixels (DIB subset).

Media table shape:
  media(media_id string, kind string, bytes binary, fmt string,
        meta map<string,string>)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..hashing import xxh64
from ..imaging import decode, phash64

MEDIA_SCHEMA = ("media_id string, kind string, bytes binary, fmt string, "
                "meta map<string,string>")

IMAGE_FEATURES_SCHEMA = ("media_id string, w int, h int, mean_r double, "
                         "mean_g double, mean_b double, phash long, "
                         "luma_hist array<int>")


def _resize_nn(px: np.ndarray, w: int, h: int) -> np.ndarray:
    sh, sw = px.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return px[np.ix_(ys, xs)]


def image_features(images: DataFrame, id_col: str = "image_id",
                   bytes_col: str = "bytes", fmt_col: str = "fmt"
                   ) -> DataFrame:
    """Decode → per-image features, one Arrow batch at a time."""

    def feats(batches):
        for pdf in batches:
            rows = []
            for mid, data, fmt in zip(pdf[id_col], pdf[bytes_col],
                                      pdf[fmt_col]):
                if data is None:
                    continue
                px = decode(bytes(data), fmt)
                luma = (px.astype(np.float64)
                        @ np.array([0.299, 0.587, 0.114]))
                hist = np.histogram(luma, bins=16, range=(0, 256))[0]
                rows.append({
                    "media_id": mid, "w": px.shape[1], "h": px.shape[0],
                    "mean_r": float(px[..., 0].mean()),
                    "mean_g": float(px[..., 1].mean()),
                    "mean_b": float(px[..., 2].mean()),
                    "phash": phash64(px),
                    "luma_hist": hist.astype(int).tolist(),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "w", "h", "mean_r", "mean_g", "mean_b",
                "phash", "luma_hist"])

    return (images.select(id_col, bytes_col, fmt_col)
            .mapInPandas(feats, IMAGE_FEATURES_SCHEMA))


def resize_images(images: DataFrame, w: int, h: int,
                  id_col: str = "image_id", bytes_col: str = "bytes",
                  fmt_col: str = "fmt") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (png). Real pipeline."""
    from ..imaging import png_encode

    def rsz(batches):
        for pdf in batches:
            rows = []
            for mid, data, fmt in zip(pdf[id_col], pdf[bytes_col],
                                      pdf[fmt_col]):
                if data is None:
                    continue
                px = _resize_nn(decode(bytes(data), fmt), w, h)
                rows.append({"media_id": mid, "bytes": png_encode(px),
                             "w": w, "h": h})
            yield pd.DataFrame(rows,
                               columns=["media_id", "bytes", "w", "h"])

    return (images.select(id_col, bytes_col, fmt_col)
            .mapInPandas(rsz, "media_id string, bytes binary, w int, h int"))


# --- audio (REAL for WAV — RIFF/PCM, crawlspark.audiocodec) ------------------

FAKE_AUDIO_FMT = "fakepcm"
FAKE_VIDEO_FMT = "fakeframes"


def decode_audio_batch(payloads: list, fmts: list) -> list:
    """Decode audio payloads → list of (mono float64 samples, sample_rate).

    REAL for fmt='wav' (pure-numpy RIFF/PCM codec — 8/16/24/32-bit integer
    and IEEE-float, mono/stereo mixed down by channel mean). The
    deterministic 'fakepcm' stand-in remains for plumbing tests; formats
    needing codecs this container lacks (mp3/ogg/flac) raise loudly."""
    from ..audiocodec import wav_decode

    out = []
    for data, fmt in zip(payloads, fmts):
        if fmt == "wav":
            x, rate = wav_decode(bytes(data))
            out.append((x.mean(axis=1), rate))
        elif fmt == FAKE_AUDIO_FMT:
            seed = xxh64(bytes(data))
            n = 1600  # 0.1 s at 16 kHz
            t = np.arange(n, dtype=np.float64)
            out.append((np.sin(2 * np.pi * (220 + seed % 220) * t / 16000.0),
                        16000))
        else:
            raise NotImplementedError(
                f"audio codec {fmt!r} unavailable in this environment; "
                "plug a real decoder here (same batch signature)")
    return out


def audio_feature_row(mono: np.ndarray, rate: int) -> dict:
    """Feature math shared by the Spark kernel — RMS, zero crossings,
    duration, spectral centroid (rfft magnitude-weighted mean frequency).
    The oracle (pyref.py_wav_features) re-derives the same values from the
    generator's ground-truth samples through an independent quantization
    mirror, so the differential check covers encode→decode→features."""
    n = int(mono.shape[0])
    mag = np.abs(np.fft.rfft(mono))
    tot = float(mag.sum())
    freqs = np.fft.rfftfreq(n, 1.0 / rate)
    return {
        "rms": float(np.sqrt(np.mean(mono ** 2))),
        "zero_crossings": int(np.sum(np.diff(np.sign(mono)) != 0)),
        "n_samples": n,
        "sample_rate": int(rate),
        "duration_s": n / rate,
        "centroid_hz": float((freqs * mag).sum() / tot) if tot > 0 else 0.0,
    }


def sample_video_frames(payloads: list, fmts: list, n_frames: int = 4
                        ) -> list:
    """Sample up to ``n_frames`` evenly spaced frames per clip → list of
    lists of (frame_idx, RGB array).

    REAL for fmt='avi' (crawlspark.videocodec — uncompressed BI_RGB and
    MJPG): the container index is parsed once and ONLY the sampled frames'
    payloads are decoded (random access via idx1), so sampling 4 frames of
    a 10k-frame clip never touches the rest. REAL for fmt='gif' (animated
    GIF, crawlspark.gifcodec): GIF's LZW stream has no random access and
    frames composite onto earlier state, so sampling decodes ONE
    sequential pass up to the highest sampled index and never past it.
    The deterministic 'fakeframes' stand-in remains for plumbing tests;
    containers needing codecs this environment lacks (mp4/webm) raise
    loudly."""
    from ..videocodec import AviReader, sample_indices

    out = []
    for data, fmt in zip(payloads, fmts):
        if fmt == "avi":
            r = AviReader(bytes(data))
            out.append([(j, r.frame(j))
                        for j in sample_indices(r.n_frames, n_frames)])
        elif fmt == "gif":
            from ..gifcodec import GifReader
            g = GifReader(bytes(data))
            idxs = sample_indices(g.n_frames, n_frames)
            out.append(list(zip(idxs, g.sample(idxs))))
        elif fmt == FAKE_VIDEO_FMT:
            seed = int(xxh64(bytes(data)) % 251)
            out.append([
                (f, ((np.indices((16, 16)).sum(axis=0) * (f + 1) + seed)
                     % 256).astype(np.uint8))
                for f in range(n_frames)])
        else:
            raise NotImplementedError(
                f"video container {fmt!r} unavailable in this environment; "
                "plug a real demuxer here (same batch signature)")
    return out


VIDEO_FEATURES_SCHEMA = ("media_id string, frame_idx int, w int, h int, "
                         "mean_r double, mean_g double, mean_b double, "
                         "phash long, luma_hist array<int>")


def video_features(media: DataFrame, n_frames: int = 4,
                   kind: str = "video") -> DataFrame:
    """Demux (REAL AVI, or animated GIF via ``kind='gif'``) → sample evenly
    spaced frames → per-frame image features (same kernel as
    image_features), one Arrow batch at a time."""

    def feats(batches):
        for pdf in batches:
            clips = sample_video_frames(list(pdf["bytes"]), list(pdf["fmt"]),
                                        n_frames)
            rows = []
            for mid, frames in zip(pdf["media_id"], clips):
                for j, px in frames:
                    if px.ndim == 2:            # fakeframes are grayscale
                        px = np.repeat(px[..., None], 3, axis=2)
                    luma = (px.astype(np.float64)
                            @ np.array([0.299, 0.587, 0.114]))
                    hist = np.histogram(luma, bins=16, range=(0, 256))[0]
                    rows.append({
                        "media_id": mid, "frame_idx": j,
                        "w": px.shape[1], "h": px.shape[0],
                        "mean_r": float(px[..., 0].mean()),
                        "mean_g": float(px[..., 1].mean()),
                        "mean_b": float(px[..., 2].mean()),
                        "phash": phash64(px),
                        "luma_hist": hist.astype(int).tolist(),
                    })
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "w", "h", "mean_r", "mean_g",
                "mean_b", "phash", "luma_hist"])

    return (media.filter(F.col("kind") == kind)
            .select("media_id", "bytes", "fmt")
            .mapInPandas(feats, VIDEO_FEATURES_SCHEMA))


AUDIO_FEATURES_SCHEMA = ("media_id string, rms double, zero_crossings int, "
                         "n_samples int, sample_rate int, duration_s double, "
                         "centroid_hz double")


def audio_features(media: DataFrame) -> DataFrame:
    """Decode (REAL WAV or fake PCM) → per-clip features, one Arrow batch
    at a time (no per-row Python at the DataFrame level)."""

    def feats(batches):
        for pdf in batches:
            pcm = decode_audio_batch(list(pdf["bytes"]), list(pdf["fmt"]))
            rows = []
            for mid, (mono, rate) in zip(pdf["media_id"], pcm):
                rows.append({"media_id": mid,
                             **audio_feature_row(mono, rate)})
            yield pd.DataFrame(rows, columns=[
                "media_id", "rms", "zero_crossings", "n_samples",
                "sample_rate", "duration_s", "centroid_hz"])

    return (media.filter(F.col("kind") == "audio")
            .select("media_id", "bytes", "fmt")
            .mapInPandas(feats, AUDIO_FEATURES_SCHEMA))


def image_exposure(images: DataFrame, id_col: str = "image_id",
                   bytes_col: str = "bytes", fmt_col: str = "fmt",
                   dark_max: int = 15, bright_min: int = 240) -> DataFrame:
    """Exposure statistics for curation filters, in EXACT integer
    arithmetic: per image (n_px, n_dark, n_bright, luma_sum) where luma =
    (299 R + 587 G + 114 B) div 1000 per pixel — no floats anywhere, so a
    ground-truth-pixel oracle matches bit-for-bit and the over/under-
    exposure decision (n_dark/n_px, n_bright/n_px thresholds) stays exact
    on any engine. Arrow-batched decode, zero shuffle."""

    def kern(batches):
        for pdf in batches:
            rows = []
            for mid, data, fmt in zip(pdf[id_col], pdf[bytes_col],
                                      pdf[fmt_col]):
                if data is None:
                    continue
                px = decode(bytes(data), fmt).astype(np.int64)
                luma = (299 * px[..., 0] + 587 * px[..., 1]
                        + 114 * px[..., 2]) // 1000
                rows.append({
                    "media_id": mid,
                    "n_px": int(luma.size),
                    "n_dark": int((luma <= dark_max).sum()),
                    "n_bright": int((luma >= bright_min).sum()),
                    "luma_sum": int(luma.sum()),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_px", "n_dark", "n_bright", "luma_sum"])

    return (images.select(id_col, bytes_col, fmt_col)
            .mapInPandas(kern, "media_id string, n_px int, n_dark int, "
                               "n_bright int, luma_sum long"))


def dominant_color(images: DataFrame, id_col: str = "image_id",
                   bytes_col: str = "bytes", fmt_col: str = "fmt"
                   ) -> DataFrame:
    """Dominant color by EXACT 4-bit/channel quantization: per image,
    bucket every pixel into bin = (r>>4)<<8 | (g>>4)<<4 | (b>>4) (4096
    bins), take the argmax with ties to the LOWEST bin id. All integer —
    a ground-truth-pixel oracle matches bit-for-bit. Used as a curation
    signal (flat-color/placeholder images have dom_frac_ppm ≈ 10^6).

    Output: (media_id, dom_bin, dom_r, dom_g, dom_b, n_dom, n_px,
    dom_frac_ppm) where dom_r/g/b are the 4-bit quantized channel values
    (0..15) and dom_frac_ppm = n_dom * 1_000_000 // n_px.

    100 TB shape: one Arrow-batched decode pass, zero shuffles; per-image
    work is one vectorized bincount."""

    def kern(batches):
        cols = ["media_id", "dom_bin", "dom_r", "dom_g", "dom_b",
                "n_dom", "n_px", "dom_frac_ppm"]
        for pdf in batches:
            rows = []
            for mid, data, fmt in zip(pdf[id_col], pdf[bytes_col],
                                      pdf[fmt_col]):
                if data is None:
                    continue
                px = decode(bytes(data), fmt)
                bins = ((px[..., 0].astype(np.int64) >> 4) << 8
                        | (px[..., 1].astype(np.int64) >> 4) << 4
                        | (px[..., 2].astype(np.int64) >> 4)).ravel()
                counts = np.bincount(bins, minlength=4096)
                b = int(counts.argmax())        # argmax → lowest bin on tie
                n_dom, n_px = int(counts[b]), int(bins.size)
                rows.append({
                    "media_id": mid, "dom_bin": b,
                    "dom_r": b >> 8, "dom_g": (b >> 4) & 0xF,
                    "dom_b": b & 0xF, "n_dom": n_dom, "n_px": n_px,
                    "dom_frac_ppm": n_dom * 1_000_000 // n_px})
            yield pd.DataFrame(rows, columns=cols)

    return (images.select(id_col, bytes_col, fmt_col)
            .mapInPandas(kern, "media_id string, dom_bin int, dom_r int, "
                               "dom_g int, dom_b int, n_dom int, "
                               "n_px int, dom_frac_ppm int"))


def image_patches(images: DataFrame, patch: int = 16,
                  id_col: str = "image_id", bytes_col: str = "bytes",
                  fmt_col: str = "fmt") -> DataFrame:
    """ViT-style patch grid over the native raster: decode, tile into
    (h div patch) x (w div patch) full patches (edge remainders dropped —
    the standard grid simplification), one row per patch with EXACT
    integer channel sums, so a ground-truth-pixel oracle matches
    bit-for-bit and downstream patch statistics (means, variance screens,
    masking ratios) can be computed engine-independently.

    Output: (media_id, patch_row, patch_col, n_px, sum_r, sum_g, sum_b).

    100 TB shape: one Arrow-batched decode pass, zero shuffle; the tile
    reshape+sum is a single vectorized numpy reduction per image (no
    per-patch Python). Output is ~wh/patch^2 narrow rows per image,
    partitionable by media_id for patch-sequence assembly."""

    def kern(batches):
        for pdf in batches:
            out = {k: [] for k in ("media_id", "patch_row", "patch_col",
                                   "n_px", "sum_r", "sum_g", "sum_b")}
            for mid, data, fmt in zip(pdf[id_col], pdf[bytes_col],
                                      pdf[fmt_col]):
                if data is None:
                    continue
                px = decode(bytes(data), fmt).astype(np.int64)
                gh, gw = px.shape[0] // patch, px.shape[1] // patch
                if gh == 0 or gw == 0:
                    continue
                tiles = (px[:gh * patch, :gw * patch]
                         .reshape(gh, patch, gw, patch, 3)
                         .sum(axis=(1, 3)))        # (gh, gw, 3)
                rr, cc = np.meshgrid(np.arange(gh), np.arange(gw),
                                     indexing="ij")
                out["media_id"].extend([mid] * (gh * gw))
                out["patch_row"].extend(rr.ravel().tolist())
                out["patch_col"].extend(cc.ravel().tolist())
                out["n_px"].extend([patch * patch] * (gh * gw))
                out["sum_r"].extend(tiles[..., 0].ravel().tolist())
                out["sum_g"].extend(tiles[..., 1].ravel().tolist())
                out["sum_b"].extend(tiles[..., 2].ravel().tolist())
            yield pd.DataFrame(out)

    return (images.select(id_col, bytes_col, fmt_col)
            .mapInPandas(kern, "media_id string, patch_row int, "
                               "patch_col int, n_px int, sum_r long, "
                               "sum_g long, sum_b long"))


def augment_images(images: DataFrame, seed: int = 0,
                   id_col: str = "image_id", bytes_col: str = "bytes",
                   fmt_col: str = "fmt") -> DataFrame:
    """Deterministic seeded augmentation — the vision-training
    augmentation stage (flip / crop / brightness) with REPRODUCIBLE
    per-image decisions: every random draw derives from
    xxh64(f"{seed}:{image_id}") in exact integer arithmetic, so the same
    (seed, corpus) always yields byte-identical augmented payloads on
    any engine (the property a resumable training pipeline needs — no
    RNG state to checkpoint).

    Ops (all exact-integer): horizontal flip on bit 0; a 7/8-fraction
    crop at a hash-chosen offset; brightness delta in [-16, 16]
    (saturating). The augmented pixels round-trip through the real PNG
    codec before feature extraction, so the entry differentially pins
    decode → augment → encode → decode against ground-truth-pixel
    arithmetic that never touches a codec.

    Output: (media_id, w, h, flip, dx, dy, delta, phash,
    mean_r/g/b rounded to 6dp). Arrow-batched; payload bytes never
    cross py4j.
    """
    from ..hashing import xxh64_str
    from ..imaging import phash64, png_decode, png_encode

    def kern(batches):
        for pdf in batches:
            rows = []
            for mid, data, fmt in zip(pdf[id_col], pdf[bytes_col],
                                      pdf[fmt_col]):
                if data is None:
                    continue
                px = decode(bytes(data), fmt)
                h0, w0 = px.shape[:2]
                hv = xxh64_str(f"{seed}:{mid}") & 0x7FFFFFFFFFFFFFFF
                flip = bool(hv & 1)
                cw = max(1, (w0 * 7) // 8)
                ch = max(1, (h0 * 7) // 8)
                dx = (hv >> 1) % (w0 - cw + 1)
                dy = (hv >> 8) % (h0 - ch + 1)
                delta = int((hv >> 16) % 33) - 16
                out = np.flip(px, axis=1) if flip else px
                out = out[dy:dy + ch, dx:dx + cw]
                out = np.clip(out.astype(np.int16) + delta,
                              0, 255).astype(np.uint8)
                rt = png_decode(png_encode(out))   # real codec round trip
                rows.append({
                    "media_id": mid, "w": int(rt.shape[1]),
                    "h": int(rt.shape[0]), "flip": flip,
                    "dx": int(dx), "dy": int(dy), "delta": delta,
                    "phash": phash64(rt),
                    "mean_r": round(float(rt[..., 0].mean()), 6),
                    "mean_g": round(float(rt[..., 1].mean()), 6),
                    "mean_b": round(float(rt[..., 2].mean()), 6),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "w", "h", "flip", "dx", "dy", "delta",
                "phash", "mean_r", "mean_g", "mean_b"])

    return (images.select(id_col, bytes_col, fmt_col)
            .mapInPandas(kern, "media_id string, w int, h int, "
                               "flip boolean, dx int, dy int, delta int, "
                               "phash long, mean_r double, "
                               "mean_g double, mean_b double"))
