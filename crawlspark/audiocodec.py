"""Real RIFF/WAVE PCM codec — pure numpy, no external audio libraries.

Upgrades the audio column from a deterministic stub to a real format, the
same way jpegcodec.py/imaging.py did for images: WAV is the PCM container
every crawl actually meets (it is also the simplest public spec — RIFF
chunks, one ``fmt `` chunk, one ``data`` chunk).

Encoder: integer PCM (8/16/24/32-bit) or IEEE float32, any channel count.
Decoder: reads the "wild envelope" — chunks in any order, unknown chunks
(LIST/INFO/fact/cue) skipped with odd-size padding honored, PCM format 1
in 8/16/24/32-bit widths and IEEE-float format 3 (32/64-bit), and the
WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapper resolved through its SubFormat
GUID. Compressed format tags raise ValueError loudly — never silently
wrong samples.

Quantization contract (the differential-oracle hinge, mirrored by
crawlspark.functions.pyref.py_wav_quantize): encode clips to [-1, 1] and
maps with round(x * (2^(bits-1) - 1)); decode maps back with
int / 2^(bits-1). 8-bit is unsigned with a 128 bias, per the spec.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE
# first 4 bytes of the EXTENSIBLE SubFormat GUID carry the real format tag;
# the remaining 12 are fixed: Data2=0x0000, Data3=0x0010 (both LE), then
# Data4 = 80 00 00 AA 00 38 9B 71
_GUID_TAIL = bytes.fromhex("00001000800000aa00389b71")


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000,
               bits: int = 16, float_pcm: bool = False) -> bytes:
    """Encode samples (float array in [-1, 1], shape (n,) or (n, ch)) to a
    canonical RIFF/WAVE file. ``float_pcm``: IEEE float32 (format 3)
    instead of integer PCM."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    x = np.clip(x, -1.0, 1.0)
    if float_pcm:
        fmt_tag, bits = _IEEE_FLOAT, 32
        payload = x.astype("<f4").tobytes()
    else:
        if bits not in (8, 16, 24, 32):
            raise ValueError(f"unsupported PCM width {bits}")
        full = (1 << (bits - 1)) - 1
        q = np.round(x * full).astype(np.int64)
        if bits == 8:
            payload = (q + 128).astype(np.uint8).tobytes()
        elif bits == 16:
            payload = q.astype("<i2").tobytes()
        elif bits == 32:
            payload = q.astype("<i4").tobytes()
        else:  # 24-bit: pack the low 3 bytes of little-endian int32
            b4 = q.astype("<i4").tobytes()
            arr = np.frombuffer(b4, dtype=np.uint8).reshape(-1, 4)
            payload = arr[:, :3].tobytes()
        fmt_tag = _PCM
    block = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, sample_rate,
                      sample_rate * block, block, bits)
    chunks = b"".join((
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(payload)), payload,
        b"\x00" if len(payload) % 2 else b"",
    ))
    return b"".join((b"RIFF", struct.pack("<I", 4 + len(chunks)),
                     b"WAVE", chunks))


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE file → (float64 samples shaped (n, ch) in
    [-1, 1], sample_rate). Unknown chunks are skipped (odd sizes padded);
    compressed formats raise ValueError."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    fmt = None
    payload = None
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, ch, rate, _brate, block, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if tag == _EXTENSIBLE:
                # cbSize(2) + validBits(2) + channelMask(4) + GUID(16)
                if size < 40 or body[28:40] != _GUID_TAIL:
                    raise ValueError("unsupported EXTENSIBLE SubFormat")
                tag = struct.unpack("<I", body[24:28])[0]
            fmt = (tag, ch, rate, block, bits)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size % 2)          # odd chunk sizes are padded
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    tag, ch, rate, _block, bits = fmt
    if ch < 1:
        raise ValueError("zero channels")
    if tag == _IEEE_FLOAT:
        if bits == 32:
            x = np.frombuffer(payload, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(payload, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"IEEE float WAV with {bits} bits")
    elif tag == _PCM:
        if bits == 8:
            x = (np.frombuffer(payload, dtype=np.uint8)
                 .astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(
                np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
            vals = (raw[:, 0].astype(np.int64)
                    | (raw[:, 1].astype(np.int64) << 8)
                    | (raw[:, 2].astype(np.int64) << 16))
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(
                np.float64) / float(1 << 31)
        else:
            raise ValueError(f"PCM WAV with {bits} bits")
    else:
        raise ValueError(f"compressed WAV format tag {tag} not supported")
    n = x.shape[0] - x.shape[0] % ch
    return x[:n].reshape(-1, ch), rate
