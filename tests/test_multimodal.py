

def test_augment_images_deterministic_and_scoped(spark):
    """Seeded augmentation: same (seed, corpus) → identical rows across
    runs; different seeds → different decisions somewhere; crop bounds
    respected; brightness saturates (pixel values stay in [0,255] by
    construction of the clip)."""
    from crawlspark import synth
    from crawlspark.functions.multimodal import augment_images
    from pyspark.sql import functions as F
    tier = synth.TIERS["t1"]
    images = (synth.spark_images(spark, tier, parallelism=4)
              .filter((F.col("image_id") < "img0000000040")
                      & (F.col("fmt") == "png")).cache())
    a1 = sorted(map(tuple, augment_images(images, seed=7).collect()))
    a2 = sorted(map(tuple, augment_images(images, seed=7).collect()))
    assert a1 == a2 and a1
    b = sorted(map(tuple, augment_images(images, seed=8).collect()))
    assert b != a1
    meta = {r["image_id"]: (r["w"], r["h"]) for r in
            images.select("image_id", "w", "h").collect()}
    for row in augment_images(images, seed=7).collect():
        w0, h0 = meta[row["media_id"]]
        assert row["w"] == max(1, (w0 * 7) // 8)
        assert row["h"] == max(1, (h0 * 7) // 8)
        assert 0 <= row["dx"] <= w0 - row["w"]
        assert 0 <= row["dy"] <= h0 - row["h"]
        assert -16 <= row["delta"] <= 16
    images.unpersist()
