"""Real AVI (RIFF) video container codec — pure numpy, no external libs.

Upgrades the video column from a deterministic stub to a real container,
completing the media set (jpegcodec.py/imaging.py for images,
audiocodec.py for audio). AVI is the public Microsoft RIFF layout
('AVI RIFF File Reference'): LIST hdrl (avih + one strl per stream with
strh/strf), LIST movi holding the frame chunks, and an optional idx1
index. Two codecs:

  DIB  — uncompressed BI_RGB 24-bit frames (BGR, bottom-up rows padded to
         4 bytes): decode is EXACT, so ground-truth-pixel oracles apply
         (same role png plays for images).
  MJPG — motion-JPEG: each frame is a JFIF payload through
         crawlspark.jpegcodec (lossy; pinned by PSNR like still JPEGs).

Decoder reads the wild envelope: unknown chunks/LISTs (JUNK, INFO, odd
sizes padded) skipped, non-video streams (audio '01wb' etc.) ignored,
idx1 honored in either offset convention (movi-relative or absolute) and
FALLBACK to a sequential movi scan when idx1 is absent or inconsistent.
Unsupported compression fourccs raise ValueError loudly.

Scale shape: ``avi_frame_table`` parses the header + index ONCE and
decodes ONLY the requested frame indices (idx1 random access) — sampling
4 frames from a 10k-frame clip never touches the other 9,996 payloads.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegcodec import jpeg_decode, jpeg_encode

_AVIIF_KEYFRAME = 0x10


def _pack_dib(px: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 → BI_RGB payload: BGR, bottom-up, 4-byte rows."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    row = np.zeros((h, stride), dtype=np.uint8)
    row[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    return row.tobytes()


def _unpack_dib(data: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    need = stride * h
    if len(data) < need:
        raise ValueError("DIB frame chunk shorter than one frame")
    arr = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, stride)
    return arr[:, :w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()


def avi_encode(frames: list, fps: int = 10, codec: str = "DIB",
               quality: int = 98) -> bytes:
    """Encode RGB frames (each (h, w, 3) uint8, same size) to a canonical
    single-video-stream AVI with an idx1 index."""
    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape
    if codec == "DIB":
        payloads = [_pack_dib(np.asarray(f, dtype=np.uint8)) for f in frames]
        ckid, compression, handler = b"00db", 0, b"DIB "
    elif codec == "MJPG":
        payloads = [jpeg_encode(np.asarray(f, dtype=np.uint8), quality)
                    for f in frames]
        ckid, compression, handler = (b"00dc",
                                      struct.unpack("<I", b"MJPG")[0],
                                      b"MJPG")
    else:
        raise ValueError(f"unsupported codec {codec!r}")

    movi_items, idx, off = [], [], 4   # offsets from the 'movi' fourcc
    for p in payloads:
        movi_items.append(ckid + struct.pack("<I", len(p)) + p
                          + (b"\x00" if len(p) % 2 else b""))
        idx.append(ckid + struct.pack("<III", _AVIIF_KEYFRAME, off, len(p)))
        off += 8 + len(p) + (len(p) % 2)
    movi = b"movi" + b"".join(movi_items)
    buf_size = max(len(p) for p in payloads)

    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 1_000_000 // fps, buf_size * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, buf_size, w, h, 0, 0, 0, 0)
    strh = b"strh" + struct.pack("<I", 56) + b"vids" + handler + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, len(frames), buf_size,
        0xFFFFFFFF, 0, 0, 0, w, h)
    strf = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression,
        len(payloads[0]), 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) \
        + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) \
        + b"hdrl" + avih + strl
    movi_list = b"LIST" + struct.pack("<I", len(movi)) + movi
    idx1 = b"idx1" + struct.pack("<I", 16 * len(idx)) + b"".join(idx)
    body = b"AVI " + hdrl + movi_list + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


class AviReader:
    """Parsed AVI header + frame index; decodes frames on demand (random
    access through idx1, falling back to a sequential movi scan)."""

    def __init__(self, data: bytes):
        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
            raise ValueError("not a RIFF/AVI file")
        self._data = data
        end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
        self.w = self.h = self.fps = 0
        self._compression = None
        movi_pos = None           # position of the 'movi' fourcc
        idx_raw = None
        pos = 12
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if cid == b"LIST":
                kind = data[pos + 8:pos + 12]
                if kind == b"movi":
                    movi_pos = pos + 8
                elif kind == b"hdrl":
                    self._parse_hdrl(data[pos + 12:pos + 8 + size])
            elif cid == b"idx1":
                idx_raw = data[pos + 8:pos + 8 + size]
            pos += 8 + size + (size % 2)
        if movi_pos is None:
            raise ValueError("missing movi list")
        if self._compression is None:
            raise ValueError("missing video stream header")
        self._frames = self._index(idx_raw, movi_pos, end)
        self.n_frames = len(self._frames)

    def _parse_hdrl(self, body: bytes) -> None:
        pos = 0
        in_video_strl = False
        while pos + 8 <= len(body):
            cid = body[pos:pos + 4]
            size = struct.unpack("<I", body[pos + 4:pos + 8])[0]
            chunk = body[pos + 8:pos + 8 + size]
            if cid == b"LIST" and chunk[:4] == b"strl":
                # recurse so a non-video strl (audio) is simply skipped
                self._parse_hdrl(chunk[4:])
                pos += 8 + size + (size % 2)
                continue
            if cid == b"strh":
                in_video_strl = chunk[:4] == b"vids"
                if in_video_strl and size >= 32:
                    scale, rate = struct.unpack("<II", chunk[20:28])
                    self.fps = rate // scale if scale else 0
            elif cid == b"strf" and in_video_strl and size >= 40:
                (_, w, h, _, bits, comp) = struct.unpack(
                    "<IiiHHI", chunk[:20])
                self.w, self.h = w, abs(h)
                if comp == 0:
                    if bits != 24:
                        raise ValueError(f"BI_RGB with {bits} bpp "
                                         "not supported (24 only)")
                    self._compression = "DIB"
                elif struct.pack("<I", comp) == b"MJPG":
                    self._compression = "MJPG"
                else:
                    raise ValueError(
                        "unsupported video compression fourcc "
                        f"{struct.pack('<I', comp)!r}")
            pos += 8 + size + (size % 2)

    @staticmethod
    def _is_video_ck(cid: bytes) -> bool:
        return (len(cid) == 4 and cid[:2].isdigit()
                and cid[2:4] in (b"db", b"dc"))

    def _index(self, idx_raw, movi_pos: int, end: int) -> list:
        data = self._data
        if idx_raw is not None and len(idx_raw) >= 16:
            frames = []
            ok = True
            for i in range(0, len(idx_raw) - len(idx_raw) % 16, 16):
                cid = idx_raw[i:i + 4]
                _flags, off, length = struct.unpack(
                    "<III", idx_raw[i + 4:i + 16])
                if not self._is_video_ck(cid):
                    continue                      # audio / palette entries
                # offset convention: movi-relative (common) or absolute
                for base in (movi_pos, 0):
                    p = base + off
                    if data[p:p + 4] == cid:
                        frames.append((p + 8, length))
                        break
                else:
                    ok = False
                    break
            if ok and frames:
                return frames
        # fallback: sequential scan of the movi list
        frames = []
        pos = movi_pos + 4
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if cid == b"LIST":                    # rec. grouping list
                pos += 12
                continue
            if cid == b"idx1":
                break
            if self._is_video_ck(cid):
                frames.append((pos + 8, size))
            pos += 8 + size + (size % 2)
        return frames

    def frame(self, i: int) -> np.ndarray:
        """Decode frame ``i`` → RGB (h, w, 3) uint8. Touches only that
        frame's payload bytes."""
        off, length = self._frames[i]
        payload = self._data[off:off + length]
        if self._compression == "DIB":
            return _unpack_dib(payload, self.w, self.h)
        return jpeg_decode(payload)


def avi_decode(data: bytes) -> tuple[list, int]:
    """Decode every frame → (list of RGB arrays, fps)."""
    r = AviReader(data)
    return [r.frame(i) for i in range(r.n_frames)], r.fps


def sample_indices(total: int, n: int) -> list[int]:
    """Evenly spaced frame indices (the sampling spec — mirrored by the
    ground-truth oracle): k*total//n for k < min(n, total)."""
    n = min(n, total)
    return [k * total // n for k in range(n)]
