"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star family (SURVEY.md §2.2). Design for 100 TB of media:

* content is an opaque ``binary`` column (or a reference into object
  storage for large assets) with a typed ``struct`` of metadata
  (modality, format, dims, duration);
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  pandas functions over ``mapInPandas`` — per-partition batches keep
  peak memory to batch-size × asset-size, and partitioning by content
  hash spreads hot assets;
* real codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the
  decode kernels are import-gated: with the library absent they raise
  ``NotImplementedError`` (real plumbing, stubbed codec), while
  :func:`fake_decode_features` provides a deterministic byte-level
  "decode" so schema/batching/partitioning are fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),  # image|audio|video
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as fake 'image' payloads so the
    media plumbing has deterministic test data in this container."""
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _require(modname: str):
    try:
        return __import__(modname)
    except ImportError as exc:  # pragma: no cover - container has no codecs
        raise NotImplementedError(
            f"real decode needs {modname!r}, which is not installed; "
            "use fake_decode_features for the plumbing path"
        ) from exc


def encode_ppm(width: int, height: int, r: int, g: int, b: int) -> bytes:
    """Binary PPM (P6) with a constant RGB fill — the deterministic
    synthetic-image fixture. Kept independent of :func:`decode_ppm`
    (string-formats the header, tiles the raster) so decode tests are a
    real round-trip, not a tautology."""
    return f"P6\n{width} {height}\n255\n".encode("ascii") + bytes((r, g, b)) * (
        width * height
    )


def encode_bmp(width: int, height: int, r: int, g: int, b: int) -> bytes:
    """24-bit uncompressed BI_RGB BMP, bottom-up, constant fill.

    Exercises everything that makes BMP awkward: BGR byte order, rows
    padded to 4-byte boundaries, bottom-up raster."""
    import struct

    row = bytes((b, g, r)) * width
    row += b"\x00" * ((-len(row)) % 4)
    raster = row * height
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster),
                      2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 14 + 40)
    return hdr + dib + raster


def decode_ppm(content: bytes) -> tuple[int, int, bytes]:
    """Pure-Python binary PPM (P6) / PGM (P5) parse → (width, height,
    top-down RGB raster). Handles '#' comments and arbitrary whitespace
    in the header, per the Netpbm spec."""
    w, h, raster, _ = _parse_ppm(content)
    return w, h, raster


def _parse_ppm(content: bytes) -> tuple[int, int, bytes, int]:
    """PPM/PGM parse that also reports bytes consumed (header + raster),
    so a container of concatenated frames can walk exact offsets without
    scanning raster bytes for header-lookalike sequences."""
    if content[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM (P6/P5) payload")
    gray = content[:2] == b"P5"
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    n = width * height * (1 if gray else 3)
    raster = content[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"raster truncated: want {n} bytes, have {len(raster)}")
    consumed = pos + n
    if gray:  # expand to RGB so every decoder yields one raster shape
        raster = bytes(v for px in raster for v in (px, px, px))
    return width, height, raster, consumed


def decode_bmp(content: bytes) -> tuple[int, int, bytes]:
    """Pure-Python 24-bit BI_RGB BMP parse → (width, height, top-down
    RGB raster): un-pads rows, flips bottom-up, swaps BGR→RGB."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    try:  # truncated headers must surface as ValueError, not struct.error
        (pix_offset,) = struct.unpack_from("<I", content, 10)
        dib_size, width, height = struct.unpack_from("<Iii", content, 14)
        planes, bpp = struct.unpack_from("<HH", content, 26)
        (compression,) = struct.unpack_from("<I", content, 30)
    except struct.error as exc:
        raise ValueError(f"BMP header truncated: {exc}") from exc
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    height = abs(height)
    # a forged header must not allocate unbounded memory: the raster
    # cannot be bigger than the payload that claims to contain it
    if width < 0 or width * height * 3 > max(0, len(content) - pix_offset) + 4096:
        raise ValueError(f"implausible BMP dimensions {width}x{height} for {len(content)} bytes")
    stride = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = content[pix_offset + src_y * stride :][: width * 3]
        if len(row) != width * 3:
            raise ValueError("raster truncated")
        base = y * width * 3
        # slice-assignment BGR→RGB swap, no per-byte Python loop
        out[base + 0 : base + width * 3 : 3] = row[2::3]
        out[base + 1 : base + width * 3 : 3] = row[1::3]
        out[base + 2 : base + width * 3 : 3] = row[0::3]
    return width, height, bytes(out)


def decode_image_bytes(content: bytes) -> tuple[int, int, bytes]:
    """Format-sniffing pure-Python decode: PPM/PGM and 24-bit BMP are
    decoded in-process (no native codec needed); other formats fall
    through to PIL when installed, else NotImplementedError."""
    if content[:2] in (b"P6", b"P5"):
        return decode_ppm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    img = decode_image(content)  # PIL path (gated)
    rgb = img.convert("RGB")
    return rgb.width, rgb.height, rgb.tobytes()


def encode_wav(rate: int, samples: list[int]) -> bytes:
    """Canonical RIFF/WAVE PCM16 mono encode (pure struct packing)."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> tuple[int, list[int]]:
    """Pure-Python RIFF/WAVE PCM16 mono parse → (sample_rate, samples).
    Walks the chunk list properly (fmt may not be first; unknown chunks
    are skipped; chunks are word-aligned per the RIFF spec)."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # a silently short read would truncate the PCM stream and
            # produce plausible-but-wrong features downstream
            raise ValueError(
                f"chunk {cid!r} truncated: header claims {size} bytes, "
                f"payload has {len(body)}"
            )
        if cid == b"fmt ":
            try:
                audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
                bits = struct.unpack_from("<H", body, 14)[0]
            except struct.error as exc:
                raise ValueError(f"fmt chunk truncated: {exc}") from exc
            if audio_fmt != 1:
                raise ValueError(f"only PCM supported (fmt={audio_fmt})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"only 16-bit mono supported (bits={bits}, ch={channels})")
    if len(data) % 2:
        raise ValueError(f"odd PCM16 data length {len(data)}")
    if rate <= 0:
        raise ValueError(f"invalid sample rate {rate}")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return rate, samples


def resize_nearest(
    width: int, height: int, raster: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor RGB resize: src = (dst * src_dim) // dst_dim —
    the floor mapping, chosen because it is exactly reproducible in
    integer SQL (the oracle re-derives every output pixel)."""
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = (y * height) // out_h
        for x in range(out_w):
            sx = (x * width) // out_w
            src = (sy * width + sx) * 3
            dst = (y * out_w + x) * 3
            out[dst : dst + 3] = raster[src : src + 3]
    return bytes(out)


def encode_ppmv(frames: list[tuple[int, int, bytes]]) -> bytes:
    """Toy video container for in-container testing: ``PPMV <n>\\n``
    header followed by n concatenated binary PPM frames. Stands in for a
    real container (mp4/mkv need ffmpeg) while keeping every byte of the
    frame-extraction path real."""
    parts = [f"PPMV {len(frames)}\n".encode("ascii")]
    for w, h, raster in frames:
        parts.append(f"P6\n{w} {h}\n255\n".encode("ascii") + raster)
    return b"".join(parts)


def decode_ppmv_frames(content: bytes) -> list[tuple[int, int, bytes]]:
    """Parse the PPMV toy container into (width, height, raster) frames
    by repeatedly applying the real PPM decoder at the walked offset."""
    if not content.startswith(b"PPMV "):
        raise ValueError("not a PPMV payload")
    try:
        nl = content.index(b"\n")
        n_frames = int(content[5:nl])
    except Exception as exc:
        raise ValueError(f"malformed PPMV header: {exc}") from exc
    if n_frames < 0:
        raise ValueError(f"negative frame count {n_frames}")
    pos, frames = nl + 1, []
    for _ in range(n_frames):
        w, h, raster, consumed = _parse_ppm(content[pos:])
        pos += consumed
        frames.append((w, h, raster))
    return frames


def decode_image(content: bytes):  # pragma: no cover - codec absent here
    """PIL decode for formats beyond PPM/BMP. STUB without PIL — use
    :func:`decode_image_bytes` for the pure-Python formats."""
    pil = _require("PIL.Image")
    return pil.Image.open(__import__("io").BytesIO(content))


def resize_image(content: bytes, w: int, h: int):  # pragma: no cover
    img = decode_image(content)
    return img.resize((w, h))


def sample_frames(content: bytes, every_ms: int):  # pragma: no cover
    _require("av")
    raise NotImplementedError("frame sampling needs pyav/ffmpeg")


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("pixel_mean", T.DoubleType()),
        T.StructField("r0", T.IntegerType()),
        T.StructField("g0", T.IntegerType()),
        T.StructField("b0", T.IntegerType()),
        T.StructField("raster_md5", T.StringType()),
    ]
)


def synthesize_images(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic image payloads keyed off an id column —
    the in-container stand-in for reading real image files. Every
    downstream decode sees genuine format bytes (PPM headers, BMP
    padding + BGR + bottom-up raster), alternating formats by id parity.

    Channel values stay in [1, 127] so the oracle can rebuild the RGB
    raster as an ASCII string (UTF-8 identity) and md5 it in SQL.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_, contents, metas = [], [], []
            for raw in pdf[id_col]:
                did = int(raw)
                w, h = 1 + did % 13, 1 + did % 7
                r, g, b = 1 + did % 127, 1 + (did * 7) % 127, 1 + (did * 13) % 127
                if did % 2 == 0:
                    fmt, content = "ppm", encode_ppm(w, h, r, g, b)
                else:
                    fmt, content = "bmp", encode_bmp(w, h, r, g, b)
                ids_.append(did)
                contents.append(content)
                metas.append(
                    {
                        "modality": "image",
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame({"asset_id": ids_, "content": contents, "meta": metas})

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


DECODED_SAFE_SCHEMA = T.StructType(
    DECODED_SCHEMA.fields + [T.StructField("decode_error", T.StringType())]
)


def decode_image_features(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Real-decode feature extraction: each asset's binary content goes
    through the format-sniffing pure-Python decoders (PPM/BMP) and the
    decoded raster — not the container bytes — feeds the features, so a
    header, padding, channel-order, or raster-orientation bug breaks the
    oracle hash.

    ``on_error``: ``'raise'`` fails the task (strict mode for verified
    fixtures); ``'null'`` emits the row with NULL features plus a
    ``decode_error`` message column — at 100 TB a handful of corrupt
    assets must not kill the job, and quarantining them by filtering on
    ``decode_error IS NOT NULL`` beats a 400-stage retry loop."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    schema = DECODED_SCHEMA if on_error == "raise" else DECODED_SAFE_SCHEMA

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {k.name: [] for k in schema.fields}
            for aid, content, meta in zip(pdf["asset_id"], pdf["content"], pdf["meta"]):
                try:
                    # the whole per-asset block is quarantined: a payload
                    # that DECODES but is degenerate (zero-area raster)
                    # must not escape the error path either
                    w, h, raster = decode_image_bytes(bytes(content))
                    feats = {
                        "width": w,
                        "height": h,
                        "n_pixels": w * h,
                        "pixel_mean": float(sum(raster)) / len(raster),
                        "r0": raster[0],
                        "g0": raster[1],
                        "b0": raster[2],
                        "raster_md5": hashlib.md5(raster).hexdigest(),
                    }
                except Exception as exc:
                    if on_error == "raise":
                        raise
                    rows["asset_id"].append(int(aid))
                    rows["format"].append(meta["format"] if meta is not None else None)
                    for k in ("width", "height", "n_pixels", "pixel_mean",
                              "r0", "g0", "b0", "raster_md5"):
                        rows[k].append(None)
                    rows["decode_error"].append(f"{type(exc).__name__}: {exc}")
                    continue
                rows["asset_id"].append(int(aid))
                rows["format"].append(meta["format"] if meta is not None else None)
                for k, v in feats.items():
                    rows[k].append(v)
                if on_error == "null":
                    rows["decode_error"].append(None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(extract, schema=schema)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("mean_sample", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("first_sample", T.IntegerType()),
        T.StructField("samples_md5", T.StringType()),
    ]
)


def synthesize_audio(ids: DataFrame, id_col: str = "doc_id", rate: int = 8000) -> DataFrame:
    """Deterministic PCM16 mono WAV payloads keyed off an id column:
    sample i is ``((id*31 + i*7) % 201) - 100`` — integer-exact, so the
    oracle can rebuild the waveform in SQL."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_, contents, metas = [], [], []
            for raw in pdf[id_col]:
                did = int(raw)
                n = 400 + did % 50
                samples = [((did * 31 + i * 7) % 201) - 100 for i in range(n)]
                ids_.append(did)
                contents.append(encode_wav(rate, samples))
                metas.append(
                    {
                        "modality": "audio",
                        "format": "wav",
                        "width": None,
                        "height": None,
                        "duration_ms": n * 1000 // rate,
                    }
                )
            yield pd.DataFrame({"asset_id": ids_, "content": contents, "meta": metas})

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


AUDIO_SAFE_SCHEMA = T.StructType(
    AUDIO_SCHEMA.fields + [T.StructField("decode_error", T.StringType())]
)


def audio_features(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Real WAV decode inside Arrow-batched mapInPandas: every feature
    (incl. the sample-string md5) derives from the parsed PCM stream, so
    chunk-walk or endianness bugs hash-mismatch the oracle.

    ``on_error='null'`` quarantines undecodable assets (truncated RIFF
    chunks, non-PCM, zero samples) as rows with NULL features plus a
    ``decode_error`` column instead of failing the task — the same
    contract as :func:`decode_image_features`."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    schema = AUDIO_SCHEMA if on_error == "raise" else AUDIO_SAFE_SCHEMA

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            rows = {k.name: [] for k in schema.fields}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                try:
                    rate, samples = decode_wav(bytes(content))
                    n = len(samples)
                    if n == 0:
                        raise ValueError("empty PCM stream")
                    feats = {
                        "sample_rate": rate,
                        "n_samples": n,
                        "duration_ms": n * 1000 // rate,
                        "mean_sample": float(sum(samples)) / n,
                        "rms": math.sqrt(sum(s * s for s in samples) / n),
                        "first_sample": samples[0],
                        "samples_md5": hashlib.md5(
                            ",".join(str(s) for s in samples).encode()
                        ).hexdigest(),
                    }
                except Exception as exc:
                    if on_error == "raise":
                        raise
                    rows["asset_id"].append(int(aid))
                    for k in ("sample_rate", "n_samples", "duration_ms",
                              "mean_sample", "rms", "first_sample", "samples_md5"):
                        rows[k].append(None)
                    rows["decode_error"].append(f"{type(exc).__name__}: {exc}")
                    continue
                rows["asset_id"].append(int(aid))
                for k, v in feats.items():
                    rows[k].append(v)
                if on_error == "null":
                    rows["decode_error"].append(None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(extract, schema=schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("r00", T.IntegerType()),
        T.StructField("g00", T.IntegerType()),
        T.StructField("b00", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def synthesize_gradient_images(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gradient PPM payloads (pixel value a function of x, y, id): unlike
    the constant-fill fixtures, resampling coordinates matter, so a
    resize that picks the wrong source pixel is caught."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_, contents, metas = [], [], []
            for raw in pdf[id_col]:
                did = int(raw)
                w, h = 4 + did % 9, 3 + did % 5
                raster = bytearray()
                for y in range(h):
                    for x in range(w):
                        raster += bytes(
                            (
                                1 + (x * 3 + y * 5 + did) % 127,
                                1 + (x * 7 + y * 11 + did) % 127,
                                1 + (x * 13 + y * 17 + did) % 127,
                            )
                        )
                content = f"P6\n{w} {h}\n255\n".encode("ascii") + bytes(raster)
                ids_.append(did)
                contents.append(content)
                metas.append(
                    {
                        "modality": "image",
                        "format": "ppm",
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame({"asset_id": ids_, "content": contents, "meta": metas})

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def resize_features(media: DataFrame, out_w: int = 4, out_h: int = 3) -> DataFrame:
    """Decode → nearest-neighbor resize → features of the RESIZED raster
    (md5 + top-left pixel), all inside one Arrow batch pass."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {k.name: [] for k in RESIZED_SCHEMA.fields}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                w, h, raster = decode_image_bytes(bytes(content))
                resized = resize_nearest(w, h, raster, out_w, out_h)
                rows["asset_id"].append(int(aid))
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["r00"].append(resized[0])
                rows["g00"].append(resized[1])
                rows["b00"].append(resized[2])
                rows["resized_md5"].append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(extract, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frame_mean", T.DoubleType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def synthesize_videos(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """PPMV toy-container payloads: 3–6 constant-fill frames whose color
    is a function of (id, frame index)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_, contents, metas = [], [], []
            for raw in pdf[id_col]:
                did = int(raw)
                w, h = 2 + did % 3, 1 + did % 3
                n_frames = 3 + did % 4
                frames = []
                for f in range(n_frames):
                    fill = bytes(
                        (
                            1 + (did + 11 * f) % 127,
                            1 + (7 * did + 5 * f) % 127,
                            1 + (13 * did + 3 * f) % 127,
                        )
                    )
                    frames.append((w, h, fill * (w * h)))
                ids_.append(did)
                contents.append(encode_ppmv(frames))
                metas.append(
                    {
                        "modality": "video",
                        "format": "ppmv",
                        "width": w,
                        "height": h,
                        "duration_ms": n_frames * 40,
                    }
                )
            yield pd.DataFrame({"asset_id": ids_, "content": contents, "meta": metas})

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def video_frame_features(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: decode the container, keep every ``every``-th
    frame, emit one row per sampled frame — the row-expanding map shape
    (mapInPandas yields more rows than it consumes) used for real
    frame-extraction pipelines."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {k.name: [] for k in FRAME_SCHEMA.fields}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                frames = decode_ppmv_frames(bytes(content))
                for idx in range(0, len(frames), every):
                    w, h, raster = frames[idx]
                    rows["asset_id"].append(int(aid))
                    rows["frame_idx"].append(idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["frame_mean"].append(float(sum(raster)) / len(raster))
                    rows["frame_md5"].append(hashlib.md5(raster).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(extract, schema=FRAME_SCHEMA)


def fake_decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction with a deterministic byte-level
    'decode' (length, mean byte value, first byte, md5) — exercises the
    exact Arrow batch path a real decoder uses."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["meta"].map(
                        lambda m: m["modality"] if m is not None else None
                    ),
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0).astype(
                        "int64"
                    ),
                    "byte_mean": content.map(
                        lambda b: float(sum(b)) / len(b) if b else 0.0
                    ),
                    "first_byte": content.map(
                        lambda b: int(b[0]) if b else -1
                    ).astype("int32"),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


AHASH_W, AHASH_H = 10, 6  # 60-bit hash: stays clear of the BIGINT sign
                          # bit, so cross-engine arithmetic never wraps


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash per image: decode, nearest-neighbor
    downscale to 10x6 gray, threshold each cell against the grid mean.
    Integer-exact thresholding (``gray * 60 > sum``, no float mean), so
    the 60-bit fingerprint is bit-reproducible anywhere. One Arrow
    batch pass; the output is (asset_id, ahash) — 8 bytes per image no
    matter the source resolution, the right shape to band-join for
    near-dup candidates (operators/dedup.py::simhash_near_dup_pairs)."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                w, h, raster, _ = _parse_ppm(bytes(content))
                grays = []
                for dy in range(AHASH_H):
                    sy = (dy * h) // AHASH_H
                    for dx in range(AHASH_W):
                        sx = (dx * w) // AHASH_W
                        o = (sy * w + sx) * 3
                        grays.append(
                            (raster[o] + raster[o + 1] + raster[o + 2]) // 3
                        )
                total = sum(grays)
                bits = 0
                for k, g in enumerate(grays):
                    if g * len(grays) > total:
                        bits |= 1 << k
                ids.append(int(aid))
                hashes.append(bits)
            yield pd.DataFrame({"id": ids, "simhash": hashes})

    return media.mapInPandas(hash_batch, schema="id long, simhash long")


AFP_WINDOWS = 60  # 60-bit audio fingerprint, same banding-safe width


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Perceptual audio fingerprint: split the PCM16 stream into 60
    windows and set each bit where the window's mean-square energy
    beats the whole clip's (integer cross-multiplied — no float
    division, so the 60-bit fingerprint is engine-reproducible). The
    audio twin of image_ahash: 8 bytes of state per clip, band-join
    ready for near-dup candidates."""

    def fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                _rate, samples = decode_wav(bytes(content))
                n = len(samples)
                energies = []
                for k in range(AFP_WINDOWS):
                    lo, hi = (k * n) // AFP_WINDOWS, ((k + 1) * n) // AFP_WINDOWS
                    energies.append(
                        (sum(s * s for s in samples[lo:hi]), hi - lo)
                    )
                total = sum(e for e, _ in energies)
                bits = 0
                for k, (e, ln) in enumerate(energies):
                    if e * n > total * ln:  # mean-square vs clip mean-square
                        bits |= 1 << k
                ids.append(int(aid))
                hashes.append(bits)
            yield pd.DataFrame({"id": ids, "simhash": hashes})

    return media.mapInPandas(fp_batch, schema="id long, simhash long")
