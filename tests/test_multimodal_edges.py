"""Adversarial inputs the fixture generators never produce (judge r5
next-round #8): truncated/corrupt PPM/BMP/WAV/PPMV bytes through the
real decoders — every failure mode must surface as ValueError (never
struct.error/IndexError/ZeroDivisionError), the quarantine modes must
keep the job alive with per-asset decode_error rows, and a snapshot
manifest pointing at a deleted data file must be pinpointed by fsck.
"""

from __future__ import annotations

import os

import pytest

from log2sql_spark.operators.multimodal import (
    audio_features,
    decode_bmp,
    decode_image_features,
    decode_ppm,
    decode_ppmv_frames,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_ppmv,
    encode_wav,
)
from log2sql_spark.store import SnapshotStore

GOOD_PPM = encode_ppm(2, 2, 10, 20, 30)
GOOD_BMP = encode_bmp(2, 2, 40, 50, 60)
GOOD_WAV = encode_wav(8000, [0, 100, -100, 32767, -32768])


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"P6",
        b"P6\n",
        b"P6\n# comment only",
        b"P6\n2 2\n255\n\x00\x00",  # raster truncated
        b"P6\n2 2\n999\n" + b"\x00" * 12,  # bad maxval
        b"P6\nxx yy\n255\n",  # non-numeric dims
        GOOD_PPM[:-1],  # one byte short
        b"\x89PNG\r\n\x1a\n",  # wrong format entirely
    ],
)
def test_ppm_corrupt_raises_valueerror(payload):
    with pytest.raises(ValueError):
        decode_ppm(payload)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"BM",
        b"BM" + b"\x00" * 10,  # header truncated mid-struct
        GOOD_BMP[:20],
        GOOD_BMP[:-4],  # cut into the last row's pixels (not just pad)
        # forged giant dimensions must not allocate the raster
        b"BM" + b"\x00" * 8 + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (2**20).to_bytes(4, "little") + (2**20).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + b"\x00" * 16,
    ],
)
def test_bmp_corrupt_raises_valueerror(payload):
    with pytest.raises(ValueError):
        decode_bmp(payload)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF",
        b"RIFF\x00\x00\x00\x00WAVE",  # no chunks at all
        GOOD_WAV[:30],  # fmt chunk truncated
        GOOD_WAV[:-3],  # data chunk shorter than its header claims
        b"RIFF\x10\x00\x00\x00WAVEdata\x03\x00\x00\x00\x01\x02\x03",  # no fmt, odd data
    ],
)
def test_wav_corrupt_raises_valueerror(payload):
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_wav_truncated_data_never_silently_shortens():
    """A data chunk whose size field exceeds the payload must raise —
    silently decoding fewer samples yields plausible-but-wrong
    features (the worst failure mode for a fingerprint)."""
    full = encode_wav(8000, list(range(100)))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(full[:-10])


@pytest.mark.parametrize(
    "payload",
    [
        b"PPMV x\n",
        b"PPMV -1\n",
        b"PPMV 2\n" + GOOD_PPM,  # claims 2 frames, holds 1
        b"PPMV 1\n" + GOOD_PPM[:-1],
    ],
)
def test_ppmv_corrupt_raises_valueerror(payload):
    with pytest.raises(ValueError):
        decode_ppmv_frames(payload)


def test_image_quarantine_keeps_good_rows(spark):
    rows = [
        (1, bytearray(GOOD_PPM), {"format": "ppm"}),
        (2, bytearray(b"\x89PNG garbage"), {"format": "png"}),
        (3, bytearray(GOOD_BMP[:-4]), {"format": "bmp"}),
        (4, bytearray(GOOD_BMP), {"format": "bmp"}),
    ]
    media = spark.createDataFrame(
        rows, "asset_id bigint, content binary, meta map<string,string>"
    )
    out = {
        r.asset_id: r
        for r in decode_image_features(media, on_error="null").collect()
    }
    assert len(out) == 4  # nothing dropped
    assert out[1].decode_error is None and out[1].n_pixels == 4
    assert out[4].decode_error is None and (out[4].r0, out[4].g0) == (40, 50)
    assert out[2].decode_error and out[2].raster_md5 is None
    assert "truncated" in out[3].decode_error


def test_audio_quarantine_keeps_good_rows(spark):
    rows = [
        (1, bytearray(GOOD_WAV)),
        (2, bytearray(GOOD_WAV[:-3])),  # truncated data chunk
        (3, bytearray(b"not audio at all")),
        (4, bytearray(encode_wav(8000, []))),  # decodes but empty PCM
    ]
    media = spark.createDataFrame(rows, "asset_id bigint, content binary")
    out = {r.asset_id: r for r in audio_features(media, on_error="null").collect()}
    assert len(out) == 4
    assert out[1].decode_error is None and out[1].n_samples == 5
    assert out[1].first_sample == 0
    assert "truncated" in out[2].decode_error
    assert "RIFF" in out[3].decode_error
    assert "empty PCM" in out[4].decode_error
    # strict mode still fails the task on the same corpus
    with pytest.raises(Exception):
        audio_features(media, on_error="raise").collect()


def test_store_fsck_pinpoints_missing_file(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(
        spark.createDataFrame(
            [(k, f"v{k}") for k in range(40)], "k bigint, val string"
        ),
        mode="overwrite",
        cluster_by="k",
        target_files=4,
    )
    assert store.fsck() == []  # intact store is sound
    victim = store.snapshot(1).entries[1]["path"]
    os.remove(tmp_path / "s" / victim)
    assert store.fsck() == [victim]
    # the read of the damaged snapshot fails loudly, not silently short
    with pytest.raises(Exception):
        store.read(spark).count()
