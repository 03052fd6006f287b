"""WARC (ISO 28500 / WARC 1.0-1.1) web-archive container source.

The reference stores fetched pages as one body file + a JSON log entry per
page (koizuka/scraper session.go invoke/saveToCache: cache/<hash>.html +
log line); the archive-industry equivalent of that cache is the WARC
container — the format CommonCrawl, Heritrix and wget emit. This module
makes WARC a first-class crawl *source*: a fetched-page table materializes
straight out of .warc / .warc.gz files, so a crawl can resume from, or
backfill against, an existing archive instead of re-fetching.

Layout (public spec, ISO 28500):

    WARC/1.0<CRLF>
    Header-Name: value<CRLF>          (continuations start with SP/HT)
    <CRLF>
    <Content-Length bytes of block>
    <CRLF><CRLF>

records concatenated; the ``.warc.gz`` convention compresses EACH RECORD
as its own gzip member (the members concatenate into one valid gzip
stream), which is what makes a 1 GB archive file cheap to scan record by
record without decompressing payloads you skip.

Scale shape (100 TB): WARC is not line-splittable — the unit of
parallelism is the FILE, exactly how Hadoop/CommonCrawl pipelines shard it
(archives are written at ~1 GB/file for this reason). ``read_warc`` maps
one binaryFile row → one Arrow-batched parse task; payload bytes stay
binary executor-side end to end (never collect()ed through py4j). With
10^5 archive files, every core in a 1000-executor cluster has work; no
shuffle is involved at all — the parse is a narrow map.

Envelope tolerance (what wild archives actually contain): unknown record
types surface as rows with null http fields (never dropped — lineage),
header continuation lines fold per RFC, stray CRLFs between records are
skipped, non-http response blocks surface raw. STRUCTURAL damage — a
missing Content-Length, a block running past EOF, a malformed gzip
member — raises ValueError: silently truncating an archive scan would
undercount a training corpus with no error.
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"

# mapInPandas output schema of parse_warc_records / read_warc
WARC_SCHEMA = ("src string, rec_seq int, rec_offset long, rec_type string, "
               "rec_id string, warc_date string, target_uri string, "
               "http_status int, http_content_type string, "
               "payload binary, payload_len int")


# ---------------------------------------------------------------- builder

def http_response_block(status: int, payload: bytes,
                        content_type: str = "text/html",
                        reason: str = "OK") -> bytes:
    """The application/http;msgtype=response block of a response record."""
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode("ascii")
    return head + payload


def build_record(rec_type: str, headers: dict, block: bytes,
                 version: str = "1.0") -> bytes:
    """One serialized WARC record. ``headers`` are WARC headers beyond the
    auto-stamped WARC-Type / Content-Length (e.g. WARC-Target-URI,
    WARC-Date, WARC-Record-ID, Content-Type)."""
    lines = [f"WARC/{version}".encode("ascii"),
             b"WARC-Type: " + rec_type.encode("ascii")]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(b"Content-Length: " + str(len(block)).encode("ascii"))
    return CRLF.join(lines) + CRLF + CRLF + block + CRLF + CRLF


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime=0, no filename) — the
    per-record member convention of ``.warc.gz``."""
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    # header mtime comes from the clock unless we build it ourselves:
    # compressobj with wbits=16+MAX writes mtime=0 already (zlib stamps 0)
    return co.compress(raw) + co.flush()


def build_warc(records: Iterable[bytes], gzip_records: bool = False) -> bytes:
    """Concatenate serialized records into a .warc (or per-member .warc.gz)
    byte stream. Pure function of its inputs — the synth/driver path builds
    archives executor-side from row data, so parse(build(x)) == x is a
    driver-checkable identity."""
    if gzip_records:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


# ----------------------------------------------------------------- parser

def _split_gzip_members(data: bytes) -> Iterator[tuple[int, bytes]]:
    """(member_offset, decompressed_bytes) per gzip member."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(data[pos:])
        except zlib.error as e:
            raise ValueError(f"malformed gzip member at offset {pos}: {e}")
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        yield pos, out
        consumed = len(data) - pos - len(d.unused_data)
        pos += consumed


def _parse_headers(head: bytes) -> tuple[str, dict]:
    """(version_line, {lowercased-name: value}) with RFC continuation
    folding (a line starting with SP/HT extends the previous value)."""
    lines = head.split(CRLF)
    version = lines[0].decode("ascii", "replace")
    hdrs: dict[str, str] = {}
    last = None
    for ln in lines[1:]:
        if not ln:
            continue
        if ln[:1] in (b" ", b"\t") and last is not None:
            hdrs[last] += " " + ln.strip().decode("utf-8", "replace")
            continue
        name, sep, val = ln.partition(b":")
        if not sep:
            continue  # junk header line: tolerate
        last = name.strip().decode("ascii", "replace").lower()
        hdrs[last] = val.strip().decode("utf-8", "replace")
    return version, hdrs


def _parse_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, payload) of an application/http response
    block; a non-HTTP block comes back (None, None, block) raw."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    end = block.find(CRLF + CRLF)
    if end < 0:
        return None, None, block
    head, payload = block[:end], block[end + 4:]
    lines = head.split(CRLF)
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, block
    ctype = None
    for ln in lines[1:]:
        name, sep, val = ln.partition(b":")
        if sep and name.strip().lower() == b"content-type":
            ctype = val.strip().decode("ascii", "replace")
            break
    return status, ctype, payload


def _iter_records(data: bytes) -> Iterator[tuple[int, bytes, bytes]]:
    """(record_offset, header_bytes, block_bytes) over a PLAIN warc
    stream. Tolerates stray CRLFs between records; raises on structural
    damage (no WARC/ magic where a record must start, missing
    Content-Length, block past EOF)."""
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC/ record magic at offset {pos}")
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError(f"unterminated WARC header at offset {pos}")
        head = data[pos:head_end]
        _, hdrs = _parse_headers(head)
        if "content-length" not in hdrs:
            raise ValueError(f"record at offset {pos} has no Content-Length")
        clen = int(hdrs["content-length"])
        block_start = head_end + 4
        if block_start + clen > n:
            raise ValueError(
                f"record block at offset {pos} runs past end of file")
        yield pos, head, data[block_start:block_start + clen]
        pos = block_start + clen


def parse_warc_bytes(data: bytes, src: str = "") -> list[dict]:
    """Whole-file parse (plain or per-member gzip) → one dict per record.
    Pure Python over one file's bytes — the per-FILE unit of work of the
    Arrow-batched Spark path below."""
    out: list[dict] = []
    if data[:2] == _GZ_MAGIC:
        units: Iterable[tuple[int, bytes]] = _split_gzip_members(data)
        recs = ((m_off, h, b) for m_off, raw in units
                for _, h, b in _iter_records(raw))
    else:
        recs = _iter_records(data)
    for seq, (off, head, block) in enumerate(recs):
        _, hdrs = _parse_headers(head)
        rec_type = hdrs.get("warc-type")
        status = ctype = payload = None
        if rec_type == "response":
            status, ctype, payload = _parse_http_response(block)
        out.append({
            "src": src, "rec_seq": seq, "rec_offset": off,
            "rec_type": rec_type, "rec_id": hdrs.get("warc-record-id"),
            "warc_date": hdrs.get("warc-date"),
            "target_uri": hdrs.get("warc-target-uri"),
            "http_status": status, "http_content_type": ctype,
            "payload": payload,
            "payload_len": None if payload is None else len(payload),
        })
    return out


# ------------------------------------------------------------- spark path

def parse_warc_records(df: DataFrame, content_col: str = "content",
                       src_col: str = "src") -> DataFrame:
    """(src string, content binary) rows → WARC_SCHEMA rows, one Arrow
    batch at a time. One input row = one archive file = one parse unit;
    payloads never leave the executors."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for src, blob in zip(pdf[src_col], pdf[content_col]):
                rows.extend(parse_warc_bytes(bytes(blob), str(src)))
            yield pd.DataFrame(
                rows, columns=["src", "rec_seq", "rec_offset", "rec_type",
                               "rec_id", "warc_date", "target_uri",
                               "http_status", "http_content_type",
                               "payload", "payload_len"])

    return (df.select(F.col(src_col).cast("string").alias(src_col),
                      content_col)
            .mapInPandas(gen, WARC_SCHEMA))


def read_warc(spark: SparkSession, path: str,
              glob: str = "*.warc*") -> DataFrame:
    """Archive directory → WARC record table. binaryFile loads each file
    whole (the standard ~1 GB/file WARC sizing keeps that bounded); one
    file per task gives file-level parallelism, the right unit for a
    non-splittable container."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select(F.col("path").alias("src"), "content"))
    return parse_warc_records(files)


# ------------------------------------------------------------------ writer

def response_records_df(df: DataFrame, uri_col: str = "target_uri",
                        date_col: str = "warc_date",
                        status_col: str = "http_status",
                        payload_col: str = "payload",
                        ctype_col=None, seq_col: str = "rec_seq"
                        ) -> DataFrame:
    """(seq, serialized record bytes) rows from a fetched-page table —
    the WARC *sink* side. Serialization is a narrow Arrow-batched map;
    WARC-Record-ID derives from the sequence (deterministic output, the
    repo-wide contract — no uuid4/clock)."""

    def gen(batches):
        for pdf in batches:
            recs = []
            for seq, uri, date, status, payload in zip(
                    pdf["_seq"], pdf["_uri"], pdf["_date"],
                    pdf["_status"], pdf["_payload"]):
                recs.append({
                    "_seq": int(seq),
                    "record": build_record(
                        "response",
                        {"WARC-Target-URI": str(uri),
                         "WARC-Date": str(date),
                         "WARC-Record-ID": f"<urn:rec:{int(seq)}>",
                         "Content-Type":
                             "application/http;msgtype=response"},
                        http_response_block(int(status), bytes(payload))),
                })
            yield pd.DataFrame(recs, columns=["_seq", "record"])

    sel = df.select(F.col(seq_col).cast("long").alias("_seq"),
                    F.col(uri_col).alias("_uri"),
                    F.col(date_col).alias("_date"),
                    F.col(status_col).alias("_status"),
                    F.col(payload_col).alias("_payload"))
    return sel.mapInPandas(gen, "_seq long, record binary")


def write_warc(df: DataFrame, out_dir: str, records_per_file: int = 1000,
               gzip_records: bool = True, **cols) -> int:
    """Fetched-page rows → ``<out_dir>/part-<fileid>.warc[.gz]`` archives,
    ``records_per_file`` records each in sequence order. Returns the file
    count. Each output file is ONE applyInPandas group keyed by
    seq div records_per_file — the shuffle carries serialized records
    once, each task streams its own archive to disk (payloads never visit
    the driver). At crawl scale, records_per_file sizes archives to the
    standard ~1 GB convention; a killed write leaves only files the
    caller never committed (write to a temp dir + rename for atomicity,
    as SnapshotStore does)."""
    import os

    recs = response_records_df(df, **cols)
    per = int(records_per_file)
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_records else ".warc"

    def write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(key[0])
        ordered = pdf.sort_values("_seq")
        blob = build_warc([bytes(r) for r in ordered["record"]],
                          gzip_records=gzip_records)
        path = os.path.join(out_dir, f"part-{fid:06d}{ext}")
        with open(path, "wb") as f:
            f.write(blob)
        return pd.DataFrame([{"fileid": fid,
                              "n_records": len(ordered)}])

    out = (recs.withColumn("_fid", F.expr(f"_seq div {per}"))
           .groupBy("_fid")
           .applyInPandas(write_group, "fileid long, n_records int"))
    return out.count()
