"""Multimodal (binary-column) kernels: images and audio as opaque bytes.

The engine treats media as ordinary ``binary`` columns plus a typed
metadata struct — the storage pattern a 100 TB training-data pipeline
uses (bytes travel with the row; only metadata and features shuffle).
Kernels are Arrow-batched ``mapInPandas`` functions: one Python invocation
per batch, NumPy over ``frombuffer`` views per asset, never per-pixel
Python.

Two container formats, deliberately trivial and self-describing so the
full encode -> decode -> feature-extract -> resize loop is executable and
ORACLE-CHECKABLE in this image (no codec libraries shipped):

- ``IMG1``: magic ``IMG1`` + little-endian uint32 width, uint32 height,
  uint8 channels + row-major uint8 raster.
- ``PCM1``: magic ``PCM1`` + little-endian uint32 n_samples + int16 PCM.

Real-world codec decode plugs in at exactly one seam, `decode_image_rgb`.
PNG (8-bit non-interlaced gray/RGB/RGBA, all five scanline filters) is
REAL — a dependency-free stdlib-zlib codec (`_png_codec`); JPEG/WebP
remain gated with ``NotImplementedError`` while Pillow is absent. Every
operator downstream of a decoded raster works unchanged either way.

Scale notes: all kernels are row-local map operations — no shuffle; the
only exchanges in the registered queries are final aggregations over
per-asset feature rows. Partition sizing is byte-driven: media rows are
wide, so ``spark.sql.files.maxPartitionBytes`` (not row count) governs
batch memory, and the kernels never materialize more than one Arrow batch.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - Pillow is not in this image
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:  # pragma: no cover
    HAVE_PIL = False

IMG_MAGIC = b"IMG1"
PCM_MAGIC = b"PCM1"
VID_MAGIC = b"VID1"
# plain format strings (struct.Struct instances do not pickle into workers)
IMG_HEADER_FMT = "<4sIIB"  # magic, width, height, channels
IMG_HEADER_SIZE = struct.calcsize(IMG_HEADER_FMT)
PCM_HEADER_FMT = "<4sI"  # magic, n_samples
PCM_HEADER_SIZE = struct.calcsize(PCM_HEADER_FMT)
VID_HEADER_FMT = "<4sIII"  # magic, width, height, n_frames (RGB24 frames)
VID_HEADER_SIZE = struct.calcsize(VID_HEADER_FMT)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_codec():
    """Build a self-contained stdlib PNG codec: ``(encode, decode)``.

    A FACTORY, not module-level functions, for the worker-pickling rule
    every kernel in this package follows: a ``mapInPandas`` closure that
    referenced a module-level function would pickle it BY REFERENCE
    (breaking under sessions whose executors cannot import this package);
    the nested functions returned here pickle BY VALUE.

    Scope (spec: the public PNG specification, RFC 2083 / W3C):

    - decode: 8-bit, non-interlaced, color types 0 (gray), 2 (RGB) and
      6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth);
      gray is replicated to RGB and alpha dropped (PIL ``convert("RGB")``
      semantics). Anything else — 16-bit, palette, interlaced — refuses
      loudly with the feature named.
    - encode: 8-bit gray/RGB/RGBA, the filter type CYCLING ``row % 5`` so
      every decoder unfilter path is exercised by round-trip fixtures.

    zlib (an explicit CPython builtin) does the DEFLATE work executor-
    side; unfiltering is NumPy for None/Up rows and a bounded per-byte
    loop only on Sub/Average/Paeth rows (their left-neighbor dependency
    is inherently sequential along a scanline; scanlines are short).
    """
    import struct as st
    import zlib

    import numpy as np

    SIG = b"\x89PNG\r\n\x1a\n"
    CHANNELS = {0: 1, 2: 3, 6: 4}

    def _chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            st.pack(">I", len(payload))
            + tag
            + payload
            + st.pack(">I", zlib.crc32(tag + payload))
        )

    def encode(raster, color_type: int = 2) -> bytes:
        c = CHANNELS[color_type]
        arr = np.asarray(raster, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w = arr.shape[:2]
        assert arr.shape[2] == c, f"raster has {arr.shape[2]} channels, color type {color_type} needs {c}"
        raw = arr.reshape(h, w * c).astype(np.int64)
        zeros = np.zeros(c, dtype=np.int64)
        prev = np.zeros(w * c, dtype=np.int64)
        lines = []
        for y in range(h):
            cur = raw[y]
            left = np.concatenate([zeros, cur[:-c]]) if w * c > c else np.zeros_like(cur)
            upleft = np.concatenate([zeros, prev[:-c]]) if w * c > c else np.zeros_like(prev)
            # filter schedule: ALL FIVE filters within the first 10 rows
            # (every round-trip still exercises every unfilter path),
            # then the fully-vectorizable None/Up for the tail — the
            # left-dependent filters decode through a bounded per-x
            # loop, so unbounded cycling made fixture decode O(pixels)
            # in Python (30 s at sf0.1; observed round 11)
            ft = y % 5 if y < 10 else (2 if y % 2 else 0)
            if ft == 0:
                flt = cur
            elif ft == 1:  # Sub
                flt = (cur - left) % 256
            elif ft == 2:  # Up
                flt = (cur - prev) % 256
            elif ft == 3:  # Average
                flt = (cur - (left + prev) // 2) % 256
            else:  # Paeth
                p = left + prev - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
                )
                flt = (cur - pred) % 256
            lines.append(bytes([ft]) + flt.astype(np.uint8).tobytes())
            prev = cur
        ihdr = st.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
            + _chunk(b"IEND", b"")
        )

    def decode(data: bytes):
        if bytes(data[:8]) != SIG:
            raise ValueError("not a PNG (bad signature)")
        pos, w, h, ct, idat = 8, None, None, None, []
        while pos + 8 <= len(data):
            (ln,) = st.unpack_from(">I", data, pos)
            tag = bytes(data[pos + 4 : pos + 8])
            payload = data[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if tag == b"IHDR":
                w, h, depth, ct, comp, filt, interlace = st.unpack(
                    ">IIBBBBB", payload
                )
                if depth != 8:
                    raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
                if interlace != 0:
                    raise NotImplementedError("interlaced PNG unsupported")
                if comp != 0 or filt != 0:
                    raise NotImplementedError("nonstandard PNG compression/filter method")
                if ct not in CHANNELS:
                    raise NotImplementedError(
                        f"PNG color type {ct} unsupported (gray/RGB/RGBA only)"
                    )
            elif tag == b"IDAT":
                idat.append(bytes(payload))
            elif tag == b"IEND":
                break
        if w is None:
            raise ValueError("PNG has no IHDR")
        c = CHANNELS[ct]
        raw = zlib.decompress(b"".join(idat))
        stride = w * c
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG IDAT size mismatch")
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            ft = raw[y * (stride + 1)]
            line = np.frombuffer(
                raw, dtype=np.uint8, offset=y * (stride + 1) + 1, count=stride
            ).astype(np.int64)
            if ft == 0:
                cur = line
            elif ft == 2:  # Up
                cur = (line + prev) % 256
            elif ft == 1:
                # Sub: cur[i] = (line[i] + cur[i-c]) % 256 is a per-lane
                # prefix sum (mod distributes over the cumsum) — fully
                # vectorized; int64 cumsum is exact far beyond any row
                cur = np.cumsum(line.reshape(-1, c), axis=0).reshape(-1) % 256
            elif ft in (3, 4):
                # Average/Paeth: the reconstructed LEFT pixel feeds the
                # next prediction, so the x walk is inherently
                # sequential; channels vectorize within each step
                line2 = line.reshape(-1, c)
                prev2 = prev.reshape(-1, c)
                cur2 = np.empty_like(line2)
                a = np.zeros(c, dtype=np.int64)
                cc = np.zeros(c, dtype=np.int64)
                for x in range(line2.shape[0]):
                    b = prev2[x]
                    if ft == 3:
                        pred = (a + b) // 2
                    else:
                        p = a + b - cc
                        pa, pb, pcd = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
                        pred = np.where(
                            (pa <= pb) & (pa <= pcd),
                            a,
                            np.where(pb <= pcd, b, cc),
                        )
                    a = (line2[x] + pred) % 256
                    cur2[x] = a
                    cc = b
                cur = cur2.reshape(-1)
            else:
                raise ValueError(f"PNG filter type {ft} invalid")
            out[y] = cur.astype(np.uint8)
            prev = cur
        raster = out.reshape(h, w, c)
        if c == 1:
            return np.repeat(raster, 3, axis=2)
        if c == 4:
            return raster[:, :, :3].copy()
        return raster

    return encode, decode


# driver-side conveniences (kernels call _png_codec() in their factory
# body instead, so their closures capture the nested functions by value)
_PNG_ENCODE, _PNG_DECODE = _png_codec()


def encode_png_rgb(raster) -> bytes:
    """Encode an (h, w, 3)-uint8 raster as a real PNG (stdlib zlib)."""
    return _PNG_ENCODE(raster, 2)


def decode_image_rgb(data: bytes):
    """Decode a REAL codec image to an (h, w, 3)-uint8 RGB array.

    PNG (8-bit non-interlaced gray/RGB/RGBA) decodes through the stdlib
    zlib codec above — no dependency needed. Other codecs (JPEG/WebP/...)
    go through Pillow when present and raise ``NotImplementedError``
    otherwise: this runtime ships no JPEG decoder and faking one would be
    worse than refusing. The IMG1 raster path covers the raw-raster
    plumbing either way.
    """
    if bytes(data[:8]) == PNG_SIG:
        return _PNG_DECODE(data)
    if not HAVE_PIL:
        raise NotImplementedError(
            "non-PNG codec image decode needs Pillow, which this runtime "
            "does not ship; PNG decodes natively — use PNG or IMG1 "
            "rasters, or install Pillow"
        )
    import io

    import numpy as np

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def png_to_img1(
    assets: DataFrame, *, id_col: str = "doc_id", bin_col: str = "image"
) -> DataFrame:
    """Transcode a PNG binary column to IMG1 — the codec boundary stage.

    After this, EVERY existing raster operator (``image_features``,
    ``image_resize_nearest``, ``image_ahash``) composes unchanged: codec
    decode reduces to the raw-raster path, exactly how a production
    pipeline isolates codec work in one stage. Row-local, no shuffle.
    """
    import struct as st

    fmt, magic = IMG_HEADER_FMT, IMG_MAGIC
    _, dec = _png_codec()  # captured by value (nested function)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                raster = dec(bytes(data))
                h, w = raster.shape[:2]
                ids.append(doc_id)
                blobs.append(st.pack(fmt, magic, w, h, 3) + raster.tobytes())
            yield pd.DataFrame({id_col: ids, bin_col: blobs})

    return assets.select(id_col, bin_col).mapInPandas(
        part, schema=f"{id_col} long, {bin_col} binary"
    )


def encode_img1(width: int, height: int, pixels) -> bytes:
    return struct.pack(IMG_HEADER_FMT, IMG_MAGIC, width, height, 3) + pixels.tobytes()


def encode_pcm1(samples) -> bytes:
    return struct.pack(PCM_HEADER_FMT, PCM_MAGIC, len(samples)) + samples.tobytes()


#: typed metadata struct carried alongside the opaque bytes
IMG_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("meta", IMG_META),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def image_features(assets: DataFrame, *, id_col: str = "doc_id", bin_col: str = "image") -> DataFrame:
    """Decode IMG1 headers + rasters -> typed metadata struct + pixel stats.

    One NumPy pass per asset over a zero-copy ``frombuffer`` view; emits
    (id, meta struct, pixel_sum, min, max)."""
    import numpy as np

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                magic, w, h, c = struct.unpack_from(IMG_HEADER_FMT, data)
                assert magic == IMG_MAGIC, f"bad magic {magic!r}"
                pix = np.frombuffer(data, dtype=np.uint8, offset=IMG_HEADER_SIZE)
                out.append(
                    (
                        doc_id,
                        {
                            "format": magic.decode(),
                            "width": w,
                            "height": h,
                            "channels": c,
                            "n_bytes": len(data),
                        },
                        int(pix.sum(dtype=np.int64)),
                        int(pix.min()),
                        int(pix.max()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "meta", "pixel_sum", "min_byte", "max_byte"]
            )

    return assets.select(id_col, bin_col).mapInPandas(part, schema=IMG_STATS_SCHEMA)


def image_resize_nearest(
    assets: DataFrame,
    *,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    bin_col: str = "image",
) -> DataFrame:
    """Nearest-neighbor resize of IMG1 rasters to (out_w, out_h).

    Pure integer source indexing (``sy = y*h // out_h``) so the result is
    bit-deterministic and SQL-reconstructible. Emits the resized IMG1
    binary — the shape a thumbnailing stage of a data pipeline has.
    """
    import numpy as np

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                magic, w, h, c = struct.unpack_from(IMG_HEADER_FMT, data)
                assert magic == IMG_MAGIC, f"bad magic {magic!r}"
                pix = np.frombuffer(data, dtype=np.uint8, offset=IMG_HEADER_SIZE)
                raster = pix.reshape(h, w, c)
                sy = (np.arange(out_h) * h) // out_h
                sx = (np.arange(out_w) * w) // out_w
                resized = raster[sy][:, sx]
                ids.append(doc_id)
                # inline encode: closures must not reference this package's
                # top-level functions (pickled by reference, the executor
                # of a foreign session cannot import them; constants are
                # captured by value and are safe)
                blobs.append(
                    struct.pack(IMG_HEADER_FMT, IMG_MAGIC, out_w, out_h, 3)
                    + resized.tobytes()
                )
            yield pd.DataFrame({id_col: ids, bin_col: blobs})

    return assets.select(id_col, bin_col).mapInPandas(
        part, schema=f"{id_col} long, {bin_col} binary"
    )


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_video_frames(data: bytes):
    """Decode a REAL codec video (MP4/WebM/...) to an (n, h, w, 3) array.

    STUB while no video library (PyAV / OpenCV) ships in this runtime:
    raises ``NotImplementedError``. The VID1 raster path below carries the
    full Spark-side plumbing; swap this body for ``av.open`` when the
    dependency exists.
    """
    raise NotImplementedError(
        "codec video decode needs PyAV or OpenCV, which this runtime does "
        "not ship; use the VID1 raster operators or install a codec library"
    )


def encode_vid1(width: int, height: int, n_frames: int, pixels) -> bytes:
    return (
        struct.pack(VID_HEADER_FMT, VID_MAGIC, width, height, n_frames)
        + pixels.tobytes()
    )


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("slot", T.IntegerType()),
        T.StructField("src_frame", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),  # IMG1-encoded sampled frame
    ]
)


def video_frame_sample(
    assets: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    bin_col: str = "video",
) -> DataFrame:
    """Sample ``k`` evenly-spaced frames from each VID1 clip.

    The frame-sampling stage of a video training pipeline: slot ``s`` of
    ``k`` takes source frame ``s * n_frames // k`` (integer stride, so the
    choice is bit-deterministic and SQL-reconstructible). Each sampled
    frame is re-emitted as an IMG1 binary, so every downstream image
    operator (``image_features``, ``image_resize_nearest``) composes with
    the output unchanged — video decode reduces to the image path.

    Row-local fan-out (one input row -> k output rows), no shuffle; the
    NumPy slice is a view into the frombuffer raster, copied only at
    ``tobytes`` for the sampled frames (k of n), never the whole clip.
    """
    import numpy as np

    vfmt, vmagic = VID_HEADER_FMT, VID_MAGIC
    ifmt, imagic = IMG_HEADER_FMT, IMG_MAGIC
    vhdr = VID_HEADER_SIZE

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                magic, w, h, nf = struct.unpack_from(vfmt, data)
                assert magic == vmagic, f"bad magic {magic!r}"
                raster = np.frombuffer(data, dtype=np.uint8, offset=vhdr).reshape(
                    nf, h * w * 3
                )
                for s in range(k):
                    fidx = s * nf // k
                    out.append(
                        (
                            int(doc_id),
                            s,
                            fidx,
                            nf,
                            struct.pack(ifmt, imagic, w, h, 3)
                            + raster[fidx].tobytes(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "slot", "src_frame", "n_frames", "frame"]
            )

    return assets.select(id_col, bin_col).mapInPandas(part, schema=VIDEO_FRAME_SCHEMA)


def audio_features(assets: DataFrame, *, id_col: str = "doc_id", bin_col: str = "audio") -> DataFrame:
    """Decode PCM1 headers + int16 samples -> energy/peak features."""
    import numpy as np

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                magic, n = struct.unpack_from(PCM_HEADER_FMT, data)
                assert magic == PCM_MAGIC, f"bad magic {magic!r}"
                s = np.frombuffer(data, dtype="<i2", offset=PCM_HEADER_SIZE).astype(
                    np.int64
                )
                assert len(s) == n
                out.append((doc_id, n, int((s * s).sum()), int(np.abs(s).max())))
            yield pd.DataFrame(out, columns=["doc_id", "n_samples", "sum_sq", "peak"])

    return assets.select(id_col, bin_col).mapInPandas(part, schema=AUDIO_STATS_SCHEMA)


def audio_ahash(assets, *, id_col: str = "doc_id", bin_col: str = "audio"):
    """Perceptual hash of PCM1 assets: 64 equal-by-index chunks (sample i
    -> chunk (i*64)//n), per-chunk sum of |sample| (exact integers),
    threshold each chunk energy against the integer mean of the 64
    chunks, pack bits k<32 into ``ahash_lo``, the rest into ``ahash_hi``
    — the audio twin of ``image_ahash``, feeding the SAME banded-Hamming
    dedup machinery. Row-local Arrow kernel, no shuffle; the SQL oracle
    recomputes every chunk sum arithmetically from the PCM1 recipe.
    """
    import numpy as np

    chunks = AHASH_GRID * AHASH_GRID  # 64, matching the image hash width

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                magic, n = struct.unpack_from(PCM_HEADER_FMT, data)
                assert magic == PCM_MAGIC, f"bad magic {magic!r}"
                s = np.frombuffer(
                    data, dtype="<i2", offset=PCM_HEADER_SIZE
                ).astype(np.int64)
                assert len(s) == n
                k = (np.arange(n, dtype=np.int64) * chunks) // n
                # integer-exact chunk energy (bincount's float weights
                # would round): accumulate |s| per chunk on int64
                cs = np.zeros(chunks, dtype=np.int64)
                np.add.at(cs, k, np.abs(s))
                mean = int(cs.sum()) // chunks
                lo = sum(1 << j for j in range(32) if cs[j] > mean)
                hi = sum(1 << (j - 32) for j in range(32, chunks) if cs[j] > mean)
                out.append((doc_id, lo, hi))
            yield pd.DataFrame(out, columns=[id_col, "ahash_lo", "ahash_hi"])

    return assets.select(id_col, bin_col).mapInPandas(
        part, schema=f"{id_col} long, ahash_lo long, ahash_hi long"
    )


#: perceptual average-hash grid (8x8 = 64 bits, emitted as two 32-bit
#: words — same signed-64 avoidance as the SimHash fingerprints).
AHASH_GRID = 8


def image_ahash(assets, *, id_col: str = "doc_id", bin_col: str = "image"):
    """Perceptual average-hash of IMG1 assets: sample an 8x8 grid of
    grayscale values by nearest neighbor (y = row*H//8, x = col*W//8;
    gray = (r+g+b)//3 — all integer, so the SQL oracle recomputes it
    exactly), threshold each cell against the integer mean of the 64
    cells, and pack bits k<32 into ``ahash_lo``, the rest into
    ``ahash_hi``. Near-duplicate images differ in few bits; downstream
    banding joins (the SimHash machinery) find pairs without comparing
    pixels. Row-local Arrow kernel, no shuffle.
    """
    import numpy as np

    g = AHASH_GRID

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                magic, w, h, c = struct.unpack_from(IMG_HEADER_FMT, data)
                assert magic == IMG_MAGIC, f"bad magic {magic!r}"
                pix = np.frombuffer(data, dtype=np.uint8, offset=IMG_HEADER_SIZE)
                grays = []
                for k in range(g * g):
                    r, col = divmod(k, g)
                    y, x = (r * h) // g, (col * w) // g
                    base = (y * w + x) * c
                    grays.append(
                        (int(pix[base]) + int(pix[base + 1]) + int(pix[base + 2])) // 3
                    )
                mean = sum(grays) // (g * g)
                lo = sum(1 << k for k in range(32) if grays[k] > mean)
                hi = sum(1 << (k - 32) for k in range(32, 64) if grays[k] > mean)
                out.append((doc_id, lo, hi))
            yield pd.DataFrame(out, columns=[id_col, "ahash_lo", "ahash_hi"])

    return assets.select(id_col, bin_col).mapInPandas(
        part, schema=f"{id_col} long, ahash_lo long, ahash_hi long"
    )


def video_mhash(assets, *, id_col: str = "doc_id", bin_col: str = "video"):
    """Temporal-majority perceptual hash of VID1 clips: every frame gets
    the 8x8 nearest-neighbor grayscale aHash (the ``image_ahash`` kernel
    per frame — y = row*H//8, x = col*W//8, gray = (r+g+b)//3, threshold
    at the FRAME's integer cell mean), and the clip's 64-bit fingerprint
    sets bit k iff a STRICT majority of frames set it (2*count >
    n_frames; ties -> 0, deterministic). Re-encoded, re-muxed, or
    lightly-edited copies keep most frames' bits, so clip-level
    near-duplicates differ in few bits and the SAME banded-Hamming dedup
    machinery as images/audio applies. All-integer arithmetic — the SQL
    oracle recomputes every sampled byte from the VID1 recipe. Row-local
    Arrow kernel over frames x 64 cells, no shuffle; only (doc_id, 2
    words) leave the decode stage.
    """
    import numpy as np

    g = AHASH_GRID

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                magic, w, h, nf = struct.unpack_from(VID_HEADER_FMT, data)
                assert magic == VID_MAGIC, f"bad magic {magic!r}"
                raster = (
                    np.frombuffer(data, dtype=np.uint8, offset=VID_HEADER_SIZE)
                    .reshape(nf, h * w * 3)
                    .astype(np.int64)
                )
                ks = np.arange(g * g, dtype=np.int64)
                base = (((ks // g) * h) // g * w + ((ks % g) * w) // g) * 3
                grays = (
                    raster[:, base] + raster[:, base + 1] + raster[:, base + 2]
                ) // 3  # (nf, 64)
                means = grays.sum(axis=1) // (g * g)
                nset = (grays > means[:, None]).sum(axis=0)
                maj = 2 * nset > nf
                lo = sum(1 << k for k in range(32) if maj[k])
                hi = sum(1 << (k - 32) for k in range(32, 64) if maj[k])
                out.append((doc_id, lo, hi))
            yield pd.DataFrame(out, columns=[id_col, "ahash_lo", "ahash_hi"])

    return assets.select(id_col, bin_col).mapInPandas(
        part, schema=f"{id_col} long, ahash_lo long, ahash_hi long"
    )
