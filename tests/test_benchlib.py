"""Wide-bench fixtures: the scaling-evidence machinery itself is pinned —
the ground-truth images table, its cache, and the validated wide round
(the north-rule-complete job measured in BENCH_SCALING.json)."""
import os
import shutil
import tempfile

import numpy as np

from crawlspark.benchlib import (make_wide_corpus, make_wide_images,
                                 run_wide_round)
from crawlspark.frontier.validate import expected_pixels
from crawlspark.imaging import phash64
from crawlspark.synth import gen_caption

N = 50_000  # 5,000 corpus pages / images — seconds, not minutes


def test_make_wide_images_ground_truth(spark, tmp_path):
    """Every row's phash/caption equals the pure-function ground truth the
    validate stage recomputes from image_id — the invariant that makes a
    0-bad-rows validation meaningful rather than circular-by-luck."""
    imgs = make_wide_images(spark, N, parallelism=8,
                            cache_root=str(tmp_path))
    rows = imgs.orderBy("image_id").limit(40).collect()
    assert len(rows) == 40
    for r in rows:
        i = int(r["image_id"][3:])
        assert r["bytes"] is None           # payloads synthesized at fetch
        assert r["caption"] == gen_caption(i)
        assert r["phash"] == phash64(expected_pixels(i))   # already signed
    # ids line up with the corpus' every-10th rule
    corpus_ids = {r["image_id"] for r in
                  make_wide_corpus(spark, N, 8).select("image_id")
                  .limit(50).collect()}
    image_ids = {r["image_id"] for r in imgs.select("image_id").collect()}
    assert corpus_ids <= image_ids


def test_make_wide_images_cache_reused(spark, tmp_path):
    p1 = make_wide_images(spark, N, parallelism=8,
                          cache_root=str(tmp_path))
    path = os.path.join(str(tmp_path), f"crawlspark_wide_images_{N}")
    assert os.path.isdir(path)
    mtime = os.path.getmtime(path)
    p2 = make_wide_images(spark, N, parallelism=8,
                          cache_root=str(tmp_path))
    assert os.path.getmtime(path) == mtime      # not rebuilt
    assert p1.count() == p2.count() == N // 10


def test_validated_wide_round_passes_fidelity(spark):
    """run_wide_round with validate_fraction > 0 runs the decode/phash/
    caption stage against the cached ground-truth table and raises on any
    bad row — so a clean return IS the fidelity assertion. A high fraction
    makes the sample non-trivial at this tier."""
    store = tempfile.mkdtemp(prefix="widestore_",
                             dir="/dev/shm" if os.path.isdir("/dev/shm")
                             else None)
    try:
        r = run_wide_round(spark, N, 2_000, 8, store, rounds=1,
                           validate_fraction=0.5)
        assert r["fetched"] > 0
        assert r["validate_fraction"] == 0.5
    finally:
        shutil.rmtree(store, ignore_errors=True)
