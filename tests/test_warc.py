"""WARC container source (crawlspark/warc.py): build∘parse identity,
gzip-per-member convention, wild-envelope tolerance, loud structural
failures, and the Spark binaryFile path bit-equal to the local parse."""

import tempfile

import pytest

from crawlspark.warc import (CRLF, build_record, build_warc,
                             http_response_block, parse_warc_bytes,
                             read_warc)


def _resp(uri, eid, status=200, payload=b"hello"):
    return build_record(
        "response",
        {"WARC-Target-URI": uri, "WARC-Date": "2024-03-01T00:00:00Z",
         "WARC-Record-ID": f"<urn:uuid:resp-{eid}>",
         "Content-Type": "application/http;msgtype=response"},
        http_response_block(status, payload))


def _sample_records():
    return [
        build_record("warcinfo",
                     {"WARC-Record-ID": "<urn:uuid:info-0>",
                      "WARC-Date": "2024-03-01T00:00:00Z",
                      "Content-Type": "application/warc-fields"},
                     b"software: crawlspark\r\n"),
        build_record("request",
                     {"WARC-Target-URI": "http://a.example/x",
                      "WARC-Date": "2024-03-01T00:00:01Z",
                      "WARC-Record-ID": "<urn:uuid:req-1>",
                      "Content-Type": "application/http;msgtype=request"},
                     b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n"),
        _resp("http://a.example/x", 1, 200, b"<html>one</html>"),
        _resp("http://a.example/y?q=1&r=2", 2, 404, b"gone"),
    ]


def test_round_trip_plain():
    recs = parse_warc_bytes(build_warc(_sample_records()), src="f")
    assert [r["rec_type"] for r in recs] == [
        "warcinfo", "request", "response", "response"]
    assert [r["rec_seq"] for r in recs] == [0, 1, 2, 3]
    assert recs[0]["http_status"] is None and recs[0]["payload"] is None
    assert recs[2]["target_uri"] == "http://a.example/x"
    assert recs[2]["http_status"] == 200
    assert recs[2]["http_content_type"] == "text/html"
    assert recs[2]["payload"] == b"<html>one</html>"
    assert recs[2]["payload_len"] == 16
    assert recs[3]["http_status"] == 404
    assert recs[3]["target_uri"] == "http://a.example/y?q=1&r=2"
    # offsets are real byte positions: re-parse a record from its offset
    data = build_warc(_sample_records())
    off = recs[2]["rec_offset"]
    assert data.startswith(b"WARC/1.0", off)


def test_round_trip_gzip_members():
    raw = _sample_records()
    data = build_warc(raw, gzip_records=True)
    assert data[:2] == b"\x1f\x8b"
    recs = parse_warc_bytes(data, src="g")
    plain = parse_warc_bytes(build_warc(raw), src="g")
    for a, b in zip(recs, plain):
        for k in ("rec_type", "rec_id", "warc_date", "target_uri",
                  "http_status", "http_content_type", "payload",
                  "payload_len", "rec_seq"):
            assert a[k] == b[k], k
    # member offsets strictly increase
    offs = [r["rec_offset"] for r in recs]
    assert offs == sorted(offs) and offs[0] == 0 and offs[1] > 0
    # deterministic bytes (no mtime in the member header)
    assert build_warc(raw, gzip_records=True) == data


def test_header_continuation_and_junk_lines():
    block = http_response_block(200, b"ok")
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: http://long.example/a\r\n"
           b"\tb/c\r\n"          # continuation folds into the URI
           b"not_a_header_line\r\n"
           b"Content-Type: application/http;msgtype=response\r\n"
           b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
           + block + b"\r\n\r\n")
    recs = parse_warc_bytes(rec)
    assert recs[0]["target_uri"] == "http://long.example/a b/c"
    assert recs[0]["payload"] == b"ok"


def test_stray_crlf_between_records_tolerated():
    recs = _sample_records()
    data = recs[0] + b"\r\n\r\n" + recs[2]
    parsed = parse_warc_bytes(data)
    assert [r["rec_type"] for r in parsed] == ["warcinfo", "response"]


def test_unknown_record_type_surfaces_with_null_http():
    rec = build_record("metadata",
                       {"WARC-Target-URI": "http://a.example/x",
                        "Content-Type": "application/warc-fields"},
                       b"via: http://a.example/\r\n")
    r = parse_warc_bytes(rec)[0]
    assert r["rec_type"] == "metadata"
    assert r["http_status"] is None and r["payload"] is None
    assert r["target_uri"] == "http://a.example/x"


def test_non_http_response_block_surfaces_raw():
    rec = build_record("response",
                       {"WARC-Target-URI": "http://a.example/b",
                        "Content-Type": "application/octet-stream"},
                       b"\x00\x01raw")
    r = parse_warc_bytes(rec)[0]
    assert r["http_status"] is None
    assert r["payload"] == b"\x00\x01raw"
    assert r["payload_len"] == 5


def test_structural_damage_raises():
    good = _sample_records()[2]
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    with pytest.raises(ValueError, match="past end"):
        parse_warc_bytes(good[:-10])
    with pytest.raises(ValueError, match="magic"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="gzip"):
        parse_warc_bytes(b"\x1f\x8b" + b"\x00" * 20)


def test_spark_read_warc_bit_equal(spark):
    raw = _sample_records()
    plain = build_warc(raw)
    gz = build_warc(raw, gzip_records=True)
    with tempfile.TemporaryDirectory() as d:
        with open(f"{d}/a.warc", "wb") as f:
            f.write(plain)
        with open(f"{d}/b.warc.gz", "wb") as f:
            f.write(gz)
        with open(f"{d}/ignore.txt", "wb") as f:
            f.write(b"not an archive")
        rows = (read_warc(spark, d)
                .orderBy("src", "rec_seq").collect())
    assert len(rows) == 2 * len(raw)
    expected = (parse_warc_bytes(plain, "a") + parse_warc_bytes(gz, "b"))
    for got, want in zip(rows, expected):
        assert got["src"].endswith((".warc", ".warc.gz"))
        for k in ("rec_seq", "rec_type", "rec_id", "warc_date",
                  "target_uri", "http_status", "http_content_type",
                  "payload_len"):
            assert got[k] == want[k], k
        gp = bytes(got["payload"]) if got["payload"] is not None else None
        assert gp == want["payload"]


def test_write_warc_round_trip(spark):
    """Sink → source identity: rows written as .warc.gz archives read
    back field-exact, records_per_file sharding honored, seq order
    preserved inside each file."""
    import tempfile

    from pyspark.sql import Row

    from crawlspark.warc import write_warc

    rows = [Row(rec_seq=i,
                target_uri=f"http://h{i % 3}.example/p/{i}",
                warc_date="2024-03-01T00:00:00Z",
                http_status=200 if i % 4 else 404,
                payload=f"payload-{i}".encode())
            for i in range(10)]
    df = spark.createDataFrame(rows)
    with tempfile.TemporaryDirectory() as d:
        n_files = write_warc(df, d, records_per_file=4)
        assert n_files == 3  # 10 records at 4/file
        back = (read_warc(spark, d)
                .orderBy("src", "rec_seq").collect())
        assert len(back) == 10
        got = sorted((r["target_uri"], r["http_status"],
                      bytes(r["payload"])) for r in back)
        want = sorted((r.target_uri, r.http_status, r.payload)
                      for r in rows)
        assert got == want
        # in-file order follows the global sequence
        first = [r for r in back if r["src"].endswith("part-000000.warc.gz")]
        assert [r["rec_id"] for r in first] == [
            f"<urn:rec:{i}>" for i in range(4)]
