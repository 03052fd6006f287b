"""Payload fidelity validation (BASELINE.json input_hint invariant).

For a deterministic sample of fetched rows, decode the image payload and
check, per row, against the ground-truth generator (crawlspark.synth /
crawlspark.imaging — the "reference pixels"):
  * decoded pixels: exact for png, PSNR >= 40 dB for the lossy format
  * phash: recomputed == stored
  * caption: string equality

Runs as one mapInPandas stage (Arrow batches; numpy decode per row inside the
batch — sampled, off the scheduling hot path). At the bench tier the images
table carries no bytes (a real crawl receives bytes at fetch time), so the
fetch is simulated by synthesizing the payload from image_id via the same
pure function — the validation still exercises decode+compare end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..imaging import decode, encode, make_pixels, phash64, psnr
from ..synth import gen_caption

PSNR_GATE_DB = 40.0

_VALIDATE_SCHEMA = "image_id string, ok boolean, psnr_db double"


def source_index(i: int) -> int:
    """Duplicate-payload rule from synth.gen_image_row (~1% reuse i-1)."""
    return i - 1 if (i % 101 == 100 and i > 0) else i


def expected_pixels(i: int) -> np.ndarray:
    src = source_index(i)
    w = 32 + (src % 7) * 16
    h = 32 + (src % 5) * 16
    return make_pixels(src, w, h)


def _check_batch(batches):
    for pdf in batches:
        out = []
        for image_id, data, fmt, caption, phash in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"],
                pdf["caption"], pdf["phash"]):
            i = int(image_id[3:])
            exp = expected_pixels(i)
            payload = bytes(data) if data is not None else encode(exp, fmt)
            try:
                px = decode(payload, fmt)
                p = psnr(exp, px)
                pixels_ok = (np.array_equal(exp, px) if fmt == "png"
                             else p >= PSNR_GATE_DB)
                ok = (pixels_ok
                      and phash64(exp) == int(phash)
                      and gen_caption(i) == caption)
            except Exception:
                ok, p = False, 0.0
            out.append({"image_id": image_id, "ok": ok,
                        "psnr_db": min(p, 1e9)})
        yield pd.DataFrame(out)


def validate_payloads(all_fetched, images, fraction: float) -> int:
    """Validate a deterministic sample; returns the number of bad rows."""
    gate = int(fraction * 1000)
    sample = (all_fetched
              .filter(F.col("image_id").isNotNull())
              .filter(F.pmod(F.col("url_hash"), F.lit(1000)) < gate)
              .select("image_id"))
    joined = sample.join(images, "image_id", "inner")
    # Decode is the expensive part (numpy per row, ~1.5 ms png / ~30 ms
    # jpeg). The sampled rows otherwise land in however few partitions the
    # images scan packs into (file-packing can collapse a small metadata
    # table to ONE task); spread the sample across the session's shuffle
    # width first — the shuffle moves only the sampled rows.
    width = int(all_fetched.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    checked = (joined.select("image_id", "bytes", "fmt", "caption", "phash")
               .repartition(width)
               .mapInPandas(_check_batch, _VALIDATE_SCHEMA))
    return checked.filter(~F.col("ok")).count()
