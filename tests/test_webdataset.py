"""WebDataset tar shard container (crawlspark/webdataset.py)."""

import tarfile
import tempfile
from io import BytesIO

import pandas as pd
import pytest

from crawlspark.webdataset import (build_tar, parse_tar,
                                   parse_webdataset_members,
                                   read_webdataset, split_key_ext,
                                   wds_samples, write_webdataset)


def test_build_tar_is_stdlib_readable():
    blob = build_tar([("000001.jpg", b"imgbytes"),
                      ("000001.txt", b"a caption")])
    with tarfile.open(fileobj=BytesIO(blob)) as tf:
        names = tf.getnames()
        assert names == ["000001.jpg", "000001.txt"]
        assert tf.extractfile("000001.txt").read() == b"a caption"
        # deterministic: mtime pinned to 0
        assert all(m.mtime == 0 for m in tf.getmembers())


def test_parse_tar_roundtrip_and_stdlib_parity():
    members = [(f"{i:06d}.{ext}", (f"payload-{i}-{ext}").encode() * i)
               for i in range(1, 9) for ext in ("jpg", "txt")]
    blob = build_tar(members)
    assert parse_tar(blob) == members
    # our reader also accepts stdlib-written archives (GNU/pax defaults)
    buf = BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, BytesIO(data))
    assert parse_tar(buf.getvalue()) == members


def test_parse_tar_wild_envelope():
    # pax global+local headers, a directory, and a GNU longname
    buf = BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT) as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ti = tarfile.TarInfo("dir/sample.jpg")
        ti.size = 3
        ti.pax_headers = {"comment": "x"}   # forces a pax 'x' record
        tf.addfile(ti, BytesIO(b"abc"))
    got = parse_tar(buf.getvalue())
    assert got == [("dir/sample.jpg", b"abc")]
    longname = "d/" + "n" * 120 + ".txt"    # >100 bytes -> GNU 'L'
    buf2 = BytesIO()
    with tarfile.open(fileobj=buf2, mode="w", format=tarfile.GNU_FORMAT) as tf:
        ti = tarfile.TarInfo(longname)
        ti.size = 2
        tf.addfile(ti, BytesIO(b"ok"))
    assert parse_tar(buf2.getvalue()) == [(longname, b"ok")]


def test_parse_tar_damage_raises():
    blob = bytearray(build_tar([("a.jpg", b"xyz")]))
    blob[130] ^= 0x01                        # corrupt the size field
    with pytest.raises(ValueError):
        parse_tar(bytes(blob))
    # payload truncated past EOF
    ok = build_tar([("a.jpg", b"x" * 600)])
    with pytest.raises(ValueError):
        parse_tar(ok[:BLOCK_AND_HALF()])


def BLOCK_AND_HALF():
    return 512 + 256


def test_build_tar_name_overflow_raises():
    with pytest.raises(ValueError):
        build_tar([("x" * 101, b"d")])


def test_split_key_ext_first_dot_rule():
    assert split_key_ext("000123.jpg") == ("000123", "jpg")
    assert split_key_ext("a/b.seg.jpg") == ("a/b", "seg.jpg")
    assert split_key_ext("noext") == ("noext", "")


def test_members_and_samples_spark(spark):
    shard = build_tar([
        ("000001.jpg", b"i1"), ("000001.txt", b"c1"),
        ("000002.jpg", b"i2"), ("000002.json", b"{}"),
        ("000002.txt", b"c2")])
    files = spark.createDataFrame([("s0", shard)],
                                  "src string, content binary")
    members = parse_webdataset_members(files)
    got = [(r.member_seq, r.name, r.key, r.ext, bytes(r.data), r.size)
           for r in members.orderBy("member_seq").collect()]
    assert got == [
        (0, "000001.jpg", "000001", "jpg", b"i1", 2),
        (1, "000001.txt", "000001", "txt", b"c1", 2),
        (2, "000002.jpg", "000002", "jpg", b"i2", 2),
        (3, "000002.json", "000002", "json", b"{}", 2),
        (4, "000002.txt", "000002", "txt", b"c2", 2)]
    samples = {r.key: (r.sample_seq, dict(r.exts))
               for r in wds_samples(members).collect()}
    assert samples["000001"] == (0, {"jpg": b"i1", "txt": b"c1"})
    assert samples["000002"][0] == 2
    assert set(samples["000002"][1]) == {"jpg", "json", "txt"}


def test_write_read_roundtrip_spark(spark):
    rows = [(i, f"{i:06d}",
             {"jpg": bytes([i % 251]) * (i + 1), "txt": f"cap {i}".encode()})
            for i in range(10)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["seq", "key", "exts"]),
        "seq long, key string, exts map<string,binary>")
    out = tempfile.mkdtemp(prefix="wds_")
    n = write_webdataset(df, out, samples_per_shard=4)
    assert n == 3                            # 10 samples / 4 per shard
    back = read_webdataset(spark, out)
    got = {(r.key, r.ext): bytes(r.data) for r in back.collect()}
    assert len(got) == 20
    for i, key, exts in rows:
        for ext, data in exts.items():
            assert got[(key, ext)] == data
    # shard membership follows seq div per: sample 4 is in shard-000001
    src_of = {r.key: r.src for r in back.collect()}
    assert src_of["000004"].endswith("shard-000001.tar")
    assert src_of["000003"].endswith("shard-000000.tar")


def test_images_to_webdataset_egress_e2e(spark):
    """The training-egress composite: synth image+caption corpus →
    images_clean curation → WebDataset shards on disk → read back and
    verify payload bytes, captions, and sample grouping survive."""
    from pyspark.sql import functions as F

    from crawlspark import synth
    from crawlspark.functions.curation import images_clean
    from crawlspark.plans.ordering import with_global_seq

    tier = synth.TIERS["t1"]
    images = (synth.spark_images(spark, tier, parallelism=4)
              .filter(F.col("image_id") < "img0000000120"))
    kept = images_clean(images, min_side=16, aspect_num=4,
                        min_caption_tokens=1)
    # rejoin payload bytes (images_clean works on metadata + phash)
    rows = kept.select("image_id", "caption").join(
        images.select("image_id", "bytes"), "image_id")
    seqd = with_global_seq(rows, [F.col("image_id")], out="seq")
    samples = seqd.select(
        "seq", F.col("image_id").alias("key"),
        F.map_from_entries(F.array(
            F.struct(F.lit("jpg").alias("k"), F.col("bytes").alias("v")),
            F.struct(F.lit("txt").alias("k"),
                     F.col("caption").cast("binary").alias("v"))))
        .alias("exts"))
    out = tempfile.mkdtemp(prefix="wds_egress_")
    n_shards = write_webdataset(samples, out, samples_per_shard=32)
    n_kept = kept.count()
    assert n_shards == -(-n_kept // 32)
    back = read_webdataset(spark, out)
    assert back.count() == 2 * n_kept
    # byte-exact payloads and captions after the full round trip
    orig = {r.image_id: (bytes(r.bytes), r.caption)
            for r in rows.collect()}
    got = {}
    for r in back.collect():
        got.setdefault(r.key, {})[r.ext] = bytes(r.data)
    assert set(got) == set(orig)
    for k, (b, cap) in orig.items():
        assert got[k]["jpg"] == b and got[k]["txt"].decode() == cap


def test_export_webdataset_atomic_commit(spark):
    import os

    from crawlspark.webdataset import export_webdataset
    rows = [(i, f"{i:06d}", {"txt": f"c{i}".encode()}) for i in range(6)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["seq", "key", "exts"]),
        "seq long, key string, exts map<string,binary>")
    root = tempfile.mkdtemp(prefix="wds_exp_")
    final = os.path.join(root, "ds")
    # a leftover scratch dir from a killed export is cleaned, not merged
    os.makedirs(final + ".__tmp__")
    open(os.path.join(final + ".__tmp__", "junk.tar"), "wb").close()
    n = export_webdataset(df, final, samples_per_shard=4)
    assert n == 2
    assert not os.path.exists(final + ".__tmp__")
    assert sorted(os.listdir(final)) == ["shard-000000.tar",
                                         "shard-000001.tar"]
    assert read_webdataset(spark, final).count() == 6
    # refuses to clobber a published dataset
    with pytest.raises(FileExistsError):
        export_webdataset(df, final, samples_per_shard=4)


def test_read_webdataset_gzip_shards(spark):
    import gzip
    import os

    out = tempfile.mkdtemp(prefix="wds_gz_")
    blob = build_tar([("000001.jpg", b"img"), ("000001.txt", b"cap")])
    with open(os.path.join(out, "shard-000000.tar.gz"), "wb") as f:
        f.write(gzip.compress(blob, mtime=0))
    with open(os.path.join(out, "shard-000001.tar"), "wb") as f:
        f.write(build_tar([("000002.txt", b"c2")]))
    got = {(r.key, r.ext): bytes(r.data)
           for r in read_webdataset(spark, out).collect()}
    assert got == {("000001", "jpg"): b"img", ("000001", "txt"): b"cap",
                   ("000002", "txt"): b"c2"}
