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

Real-world codec decode (JPEG/PNG/FLAC/...) plugs in at exactly one seam,
`decode_image_rgb` — stubbed with ``NotImplementedError`` while Pillow is
absent; every operator downstream of a decoded raster works unchanged.

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


def decode_image_rgb(data: bytes):
    """Decode a REAL codec image (JPEG/PNG/...) to an RGB array.

    STUB while Pillow is absent from the runtime image: raises
    ``NotImplementedError``. The IMG1 raster path below covers the full
    Spark-side plumbing; swap this function's body for ``PIL.Image.open``
    when the dependency exists.
    """
    if not HAVE_PIL:
        raise NotImplementedError(
            "codec image decode needs Pillow, which this runtime does not "
            "ship; use the IMG1 raster operators or install Pillow"
        )
    import io

    import numpy as np

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


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
