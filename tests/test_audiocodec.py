"""Real RIFF/WAVE codec (crawlspark/audiocodec.py): round-trip exactness
against the independent quantization mirror, the wild-chunk decode envelope,
and the Spark audio_features pipeline vs the ground-truth-sample oracle.

Reference parity note: the reference treats downloaded media as opaque
payloads (scraper.go Download* paths); the codec itself is new first-class
pipeline surface per the round brief (multimodal columns), mirroring how
jpegcodec.py/imaging.py made the image column real.
"""
import struct

import numpy as np
import pytest

from crawlspark.audiocodec import wav_decode, wav_encode
from crawlspark.functions.pyref import py_wav_features, py_wav_quantize
from crawlspark.synth import gen_audio_signal


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_pcm_roundtrip_is_quantized_identity(bits):
    rng = np.random.default_rng(bits)
    x = rng.uniform(-1.3, 1.3, size=(777, 2))  # includes clipping range
    y, rate = wav_decode(wav_encode(x, 22050, bits))
    assert rate == 22050 and y.shape == (777, 2)
    assert np.array_equal(y, py_wav_quantize(x, bits, False))


def test_float_pcm_roundtrip():
    rng = np.random.default_rng(99)
    x = rng.uniform(-1.0, 1.0, size=(333, 1))
    y, rate = wav_decode(wav_encode(x, 8000, float_pcm=True))
    assert rate == 8000
    assert np.array_equal(y, py_wav_quantize(x, 32, True))


def test_synth_corpus_roundtrip_exact_all_variants():
    seen = set()
    for i in range(80):
        x, rate, bits, fp = gen_audio_signal(i)
        seen.add((bits, fp, x.shape[1]))
        y, r = wav_decode(wav_encode(x, rate, bits, float_pcm=fp))
        assert r == rate
        assert np.array_equal(y, py_wav_quantize(x, bits, fp)), (i, bits, fp)
    # the corpus actually exercises the width/float/channel matrix
    assert {b for b, fp, _ in seen if not fp} >= {8, 16, 24, 32}
    assert any(fp for _, fp, _ in seen)
    assert {ch for _, _, ch in seen} == {1, 2}


def _splice(chunks: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_unknown_chunks_skipped_with_odd_padding():
    x = (np.sin(np.arange(200) / 9.0) * 0.7)[:, None]
    base = wav_encode(x, 16000, 16)
    body = base[12:]
    wild = _splice(b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
                   + body + b"fact" + struct.pack("<I", 4) + b"\x00" * 4)
    y, r = wav_decode(wild)
    assert r == 16000 and np.array_equal(y, wav_decode(base)[0])


def test_extensible_wrapper_resolves_subformat():
    x = (np.cos(np.arange(150) / 5.0) * 0.4)[:, None]
    base = wav_encode(x, 8000, 16)
    data_chunk = base[base.index(b"data"):]
    guid = struct.pack("<I", 1) + bytes.fromhex(
        "00001000800000aa00389b71")
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
           + struct.pack("<HHI", 22, 16, 4) + guid)
    ext = _splice(b"fmt " + struct.pack("<I", len(fmt)) + fmt + data_chunk)
    y, r = wav_decode(ext)
    assert r == 8000 and np.array_equal(y, wav_decode(base)[0])
    # unknown SubFormat GUID must fail loudly, not decode garbage
    bad = fmt[:24] + struct.pack("<I", 1) + bytes(12)
    with pytest.raises(ValueError):
        wav_decode(_splice(b"fmt " + struct.pack("<I", len(bad)) + bad
                           + data_chunk))


def test_compressed_and_malformed_raise():
    x = np.zeros((10, 1))
    base = wav_encode(x, 8000, 16)
    data_chunk = base[base.index(b"data"):]
    mp3 = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)
    with pytest.raises(ValueError, match="compressed"):
        wav_decode(_splice(b"fmt " + struct.pack("<I", 16) + mp3
                           + data_chunk))
    with pytest.raises(ValueError):
        wav_decode(b"OggS" + bytes(40))
    with pytest.raises(ValueError):          # missing data chunk
        wav_decode(_splice(base[12:12 + 8 + 16]))


def test_spark_audio_features_match_ground_truth_oracle(spark):
    """End-to-end differential: executor-side encode → decode → features
    must equal the codec-free oracle (quantization mirror over ground-truth
    samples) bit-for-bit — same contract the audio_features driver entry
    pins at sf0.01 scale."""
    from crawlspark import synth
    from crawlspark.functions.multimodal import audio_features

    n = 48
    media = synth.spark_audio(spark, n, parallelism=4)
    got = {r["media_id"]: r.asDict()
           for r in audio_features(media).collect()}
    assert len(got) == n
    for i in range(n):
        x, rate, bits, fp = gen_audio_signal(i)
        want = py_wav_features(x, rate, bits, fp)
        g = got[f"aud{i:06d}"]
        for k, v in want.items():
            assert g[k] == v, (i, k, g[k], v)
