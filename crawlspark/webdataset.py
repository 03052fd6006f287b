"""WebDataset-style tar shards — the standard image+caption training IO.

LAION/DataComp-scale training reads POSIX tar archives ("shards") in
which consecutive members share a basename key: ``000123.jpg`` +
``000123.txt`` (+ ``000123.json``) form ONE sample (the public
WebDataset convention — webdataset/webdataset docs; the format itself is
plain POSIX.1-1988 ustar). This module gives the corpus both directions:

  build_tar / parse_tar      — deterministic ustar writer (mtime 0, no
                               uid/uname noise) + wild-envelope reader
                               (ustar + GNU 'L' longnames, pax 'x'/'g'
                               headers skipped, directories skipped,
                               truncated trailer tolerated; checksum or
                               truncated-payload damage raises).
  parse_webdataset_members   — (src, content) files → one member row per
                               tar entry, Arrow-batched (one non-splittable
                               shard = one task, same unit as warc.py).
  wds_samples                — member rows → one row per SAMPLE with an
                               ext→payload map.
  read_webdataset            — binaryFile directory scan → member rows.
  write_webdataset           — sample rows → ``shard-<id>.tar`` files,
                               samples_per_shard each, one applyInPandas
                               group per shard (payloads never visit the
                               driver), members in sorted-ext order.

Reference tie-in: koizuka/scraper archives fetched payloads per page
(scraper.go save/download paths); tar shards are the training-side
packaging of the same payload table. 100 TB shape: shard files are the
parallelism unit in both directions — reading N shards is N independent
tasks, writing k samples/shard is one keyed exchange of already-serialized
bytes. No per-row Python on any hot path that isn't Arrow-batched.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    s = f"{n:0{width - 1}o}"
    if len(s) > width - 1:
        raise ValueError(f"field overflow: {n} in {width} octal bytes")
    return s.encode() + b"\0"


def _header(name: str, size: int, typeflag: bytes = b"0") -> bytes:
    nb = name.encode()
    if len(nb) > 100:
        raise ValueError(f"member name over 100 bytes: {name!r}")
    h = bytearray(BLOCK)
    h[0:len(nb)] = nb
    h[100:108] = _octal(0o644, 8)          # mode
    h[108:116] = _octal(0, 8)              # uid
    h[116:124] = _octal(0, 8)              # gid
    h[124:136] = _octal(size, 12)          # size
    h[136:148] = _octal(0, 12)             # mtime 0: deterministic output
    h[148:156] = b" " * 8                  # chksum placeholder
    h[156:157] = typeflag
    h[257:263] = b"ustar\0"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\0 "
    return bytes(h)


def build_tar(members: Iterable[tuple[str, bytes]]) -> bytes:
    """Serialize (name, payload) members to a POSIX ustar archive,
    in iteration order, deterministically (mtime 0, fixed mode)."""
    out = bytearray()
    for name, data in members:
        data = bytes(data)
        out += _header(name, len(data))
        out += data
        pad = -len(data) % BLOCK
        out += b"\0" * pad
    out += b"\0" * (2 * BLOCK)
    return bytes(out)


def _parse_octal(field: bytes) -> int:
    s = field.split(b"\0")[0].strip()
    return int(s or b"0", 8)


def parse_tar(data: bytes) -> list[tuple[str, bytes]]:
    """Wild-envelope tar reader: regular files returned in archive order;
    GNU 'L' longname records apply to the following member; pax ('x'/'g')
    and non-file members are skipped. A zero block ends the archive (a
    missing second trailer block is tolerated — truncated-but-complete
    archives exist in the wild). Checksum mismatch or a payload running
    past EOF raises ValueError."""
    out: list[tuple[str, bytes]] = []
    pos, pending_name = 0, None
    n = len(data)
    while pos + BLOCK <= n:
        hdr = data[pos:pos + BLOCK]
        if hdr == b"\0" * BLOCK:
            break
        stored = _parse_octal(hdr[148:156])
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != summed:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        size = _parse_octal(hdr[124:136])
        typeflag = hdr[156:157]
        end = pos + BLOCK + size
        if end > n:
            raise ValueError(f"tar member payload past EOF at {pos}")
        payload = data[pos + BLOCK:end]
        name = hdr[0:100].split(b"\0")[0].decode("utf-8", "replace")
        if typeflag == b"L":                   # GNU longname
            pending_name = payload.rstrip(b"\0").decode("utf-8", "replace")
        elif typeflag in (b"0", b"\0"):
            if pending_name is not None:
                name, pending_name = pending_name, None
            out.append((name, payload))
        # 'x'/'g' pax, '5' dir, links, unknown: skip payload, keep walking
        pos = end + (-size % BLOCK)
    return out


def split_key_ext(name: str) -> tuple[str, str]:
    """WebDataset key rule: the key is the basename up to the FIRST dot;
    the extension is everything after it (so ``a/b.seg.jpg`` → key
    ``a/b``, ext ``seg.jpg``)."""
    head, dot, ext = name.partition(".")
    return (head, ext) if dot else (name, "")


MEMBER_SCHEMA = ("src string, member_seq int, name string, key string, "
                 "ext string, data binary, size long")


def parse_webdataset_members(files: DataFrame, src_col: str = "src",
                             content_col: str = "content") -> DataFrame:
    """(src, content) shard blobs → one row per tar member. One shard =
    one Arrow batch row = one sequential parse (tar is non-splittable);
    parallelism comes from the shard count, the format's own unit."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        cols = ["src", "member_seq", "name", "key", "ext", "data", "size"]
        for pdf in batches:
            rows = []
            for src, blob in zip(pdf[src_col], pdf[content_col]):
                if blob is None:
                    continue
                blob = bytes(blob)
                if blob[:2] == b"\x1f\x8b":   # .tar.gz shard convention
                    blob = gzip.decompress(blob)
                for i, (name, data) in enumerate(parse_tar(bytes(blob))):
                    key, ext = split_key_ext(name)
                    rows.append({"src": src, "member_seq": i,
                                 "name": name, "key": key, "ext": ext,
                                 "data": data, "size": len(data)})
            yield pd.DataFrame(rows, columns=cols)

    return (files.select(F.col(src_col).cast("string").alias(src_col),
                         content_col)
            .mapInPandas(gen, MEMBER_SCHEMA))


def wds_samples(members: DataFrame) -> DataFrame:
    """Member rows → one row per sample: (src, key, sample_seq, exts
    map<ext, payload>). sample_seq is the first member's archive position
    (WebDataset samples are consecutive members, so min(member_seq)
    orders samples exactly). One hash-agg shuffle keyed by (src, key)."""
    return (members.groupBy("src", "key")
            .agg(F.min("member_seq").alias("sample_seq"),
                 F.map_from_entries(
                     F.sort_array(F.collect_list(
                         F.struct("ext", "data")))).alias("exts")))


def read_webdataset(spark: SparkSession, path: str,
                    glob: str = "*.tar*") -> DataFrame:
    """Shard directory → member rows, one whole file per task
    (binaryFile; standard ~1 GB WebDataset shard sizing keeps a blob
    bounded)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select(F.col("path").alias("src"), "content"))
    return parse_webdataset_members(files)


def write_webdataset(df: DataFrame, out_dir: str,
                     samples_per_shard: int = 1000,
                     seq_col: str = "seq", key_col: str = "key",
                     exts_col: str = "exts") -> int:
    """Sample rows (seq, key, exts map<string,binary>) →
    ``<out_dir>/shard-<id>.tar``, ``samples_per_shard`` samples per
    shard in sequence order, member name ``<key>.<ext>`` with exts
    sorted per sample (deterministic bytes). One applyInPandas group
    per shard; each task streams its own archive to disk. Returns the
    shard count. Same atomicity posture as warc.write_warc: write to a
    scratch dir and rename to commit."""
    import os

    per = int(samples_per_shard)
    os.makedirs(out_dir, exist_ok=True)

    def write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(key[0])
        members = []
        for _, row in pdf.sort_values("_seq").iterrows():
            for ext in sorted(row["_exts"]):
                name = (f"{row['_key']}.{ext}" if ext else row["_key"])
                members.append((name, bytes(row["_exts"][ext])))
        path = os.path.join(out_dir, f"shard-{fid:06d}.tar")
        with open(path, "wb") as f:
            f.write(build_tar(members))
        return pd.DataFrame([{"fileid": fid, "n_samples": len(pdf)}])

    sel = df.select(F.col(seq_col).cast("long").alias("_seq"),
                    F.col(key_col).alias("_key"),
                    F.col(exts_col).alias("_exts"))
    out = (sel.withColumn("_fid", F.expr(f"_seq div {per}"))
           .groupBy("_fid")
           .applyInPandas(write_group, "fileid long, n_samples long"))
    return out.count()


def export_webdataset(df: DataFrame, final_dir: str, **kwargs) -> int:
    """Atomic-commit egress: write the shards into a scratch sibling
    (``<final_dir>.__tmp__``), then publish with ONE directory rename —
    a killed export leaves no partially-visible dataset, the same
    crash-before-commit posture as SnapshotStore's manifest replace.
    Refuses to overwrite an existing ``final_dir``."""
    import os
    import shutil

    if os.path.exists(final_dir):
        raise FileExistsError(final_dir)
    tmp = final_dir.rstrip("/") + ".__tmp__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)          # leftover from a killed export
    n = write_webdataset(df, tmp, **kwargs)
    os.replace(tmp, final_dir)
    return n
