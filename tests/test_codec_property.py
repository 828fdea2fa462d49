"""Property-based round-trips for the pure-Python media codecs
(hypothesis): arbitrary dimensions/colors/samples must survive
encode → decode bit-exactly. Complements the driver-oracle checks,
which only see the deterministic fixture distributions."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from log2sql_spark.operators.multimodal import (
    decode_bmp,
    decode_ppm,
    decode_ppmv_frames,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_ppmv,
    encode_wav,
)

dims = st.integers(min_value=1, max_value=16)
chan = st.integers(min_value=0, max_value=255)


@settings(max_examples=50, deadline=None)
@given(w=dims, h=dims, r=chan, g=chan, b=chan)
def test_ppm_constant_roundtrip(w, h, r, g, b):
    assert decode_ppm(encode_ppm(w, h, r, g, b)) == (w, h, bytes((r, g, b)) * (w * h))


@settings(max_examples=50, deadline=None)
@given(w=dims, h=dims, r=chan, g=chan, b=chan)
def test_bmp_constant_roundtrip(w, h, r, g, b):
    # exercises BGR swap, row padding, bottom-up flip for every width class
    assert decode_bmp(encode_bmp(w, h, r, g, b)) == (w, h, bytes((r, g, b)) * (w * h))


@settings(max_examples=50, deadline=None)
@given(w=dims, h=dims, data=st.data())
def test_ppm_arbitrary_raster_roundtrip(w, h, data):
    raster = bytes(
        data.draw(st.lists(chan, min_size=w * h * 3, max_size=w * h * 3))
    )
    payload = f"P6\n{w} {h}\n255\n".encode() + raster
    assert decode_ppm(payload) == (w, h, raster)


@settings(max_examples=50, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200
    ),
)
def test_wav_roundtrip(rate, samples):
    assert decode_wav(encode_wav(rate, samples)) == (rate, samples)


@settings(max_examples=30, deadline=None)
@given(data=st.data(), n_frames=st.integers(min_value=1, max_value=5))
def test_ppmv_roundtrip(data, n_frames):
    frames = []
    for _ in range(n_frames):
        w = data.draw(dims)
        h = data.draw(dims)
        raster = bytes(data.draw(st.lists(chan, min_size=w * h * 3, max_size=w * h * 3)))
        frames.append((w, h, raster))
    assert decode_ppmv_frames(encode_ppmv(frames)) == frames
