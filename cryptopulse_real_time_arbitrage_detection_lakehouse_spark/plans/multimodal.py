"""Multimodal-column queries, oracle-checked end to end.

The binary assets are synthesized deterministically from ``doc_id`` (the
testdata ships no media), so the DuckDB twin can recompute every expected
byte arithmetically — which turns the whole Spark-side loop
(encode kernel -> binary column -> decode kernel -> features) into an
oracle-checkable black box. The asset generators are themselves
``mapInPandas`` kernels, so the plumbing under test is exactly the
plumbing a real pipeline uses. PNG decode is REAL (dependency-free stdlib-zlib codec,
``functions/multimodal._png_codec`` — see ``multimodal_png_stats``);
JPEG/video codecs stay honestly gated behind
``decode_image_rgb``/``decode_video_frames``.

Asset recipes (all integer arithmetic, shared with the SQL twins):
- image: width 16 + doc_id%48, height 16 + (doc_id*7)%48, 3 channels,
  pixel[i] = (doc_id*31 + i) % 256.
- audio: n 1000 + doc_id%500, sample[i] = (doc_id*13 + i*7) % 4096 - 2048.
- video: width 8 + doc_id%8, height 8 + (doc_id*3)%8, n_frames 4 + doc_id%5,
  pixel[frame][i] = (doc_id*17 + frame*101 + i) % 256.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import (
    IMG_HEADER_FMT,
    IMG_HEADER_SIZE,
    IMG_MAGIC,
    PCM_HEADER_FMT,
    PCM_MAGIC,
    VID_HEADER_FMT,
    VID_MAGIC,
    audio_features,
    image_features,
    image_resize_nearest,
    video_frame_sample,
)
from ..sources.testdata import load_table
from .registry import register

THUMB = 16  # resize target (square thumbnails)


def synth_image_assets(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, image binary) with the IMG1 recipe above.

    The closure packs headers inline: referencing this package's top-level
    functions from a worker-shipped closure would pickle them by reference,
    which breaks under sessions whose executors cannot import the package
    (constants pickle by value and are safe).
    """
    import numpy as np
    import struct

    fmt, magic = IMG_HEADER_FMT, IMG_MAGIC

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 16 + d % 48, 16 + (d * 7) % 48
                pix = ((d * 31 + np.arange(w * h * 3)) % 256).astype(np.uint8)
                ids.append(d)
                blobs.append(struct.pack(fmt, magic, w, h, 3) + pix.tobytes())
            yield pd.DataFrame({"doc_id": ids, "image": blobs})

    return docs.select("doc_id").mapInPandas(part, schema="doc_id long, image binary")


def synth_audio_assets(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, audio binary) with the PCM1 recipe above.
    Headers packed inline for the same worker-pickling reason as images."""
    import numpy as np
    import struct

    fmt, magic = PCM_HEADER_FMT, PCM_MAGIC

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 1000 + d % 500
                s = ((d * 13 + np.arange(n) * 7) % 4096 - 2048).astype("<i2")
                ids.append(d)
                blobs.append(struct.pack(fmt, magic, n) + s.tobytes())
            yield pd.DataFrame({"doc_id": ids, "audio": blobs})

    return docs.select("doc_id").mapInPandas(part, schema="doc_id long, audio binary")


@register(
    "multimodal_image_stats",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         16 + doc_id % 48 AS width,
         16 + (doc_id * 7) % 48 AS height
  FROM documents
)
SELECT d.doc_id, 'IMG1' AS format,
       CAST(d.width AS BIGINT) AS width, CAST(d.height AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels,
       CAST(13 + d.width * d.height * 3 AS BIGINT) AS n_bytes,
       CAST(SUM((d.doc_id * 31 + r.i) % 256) AS BIGINT) AS pixel_sum,
       CAST(SUM((d.doc_id * 31 + r.i) % 256) AS DOUBLE)
         / CAST(d.width * d.height * 3 AS DOUBLE) AS mean_byte
FROM dims d, range(0, 63 * 63 * 3) r(i)     -- DuckDB range() takes no lateral
WHERE r.i < d.width * d.height * 3          -- args: constant bound + filter
GROUP BY d.doc_id, d.width, d.height
""",
    doc="Binary image column end to end: encode kernel -> opaque binary + "
    "typed metadata struct -> decode/feature kernel (mapInPandas, NumPy "
    "over frombuffer views) -> per-asset stats. Oracle recomputes every "
    "byte arithmetically. Row-local; no shuffle.",
    tags=("multimodal", "image", "pandas-udf"),
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = image_features(synth_image_assets(docs))
    n_px = (F.col("meta.width") * F.col("meta.height") * F.col("meta.channels")).cast(
        "double"
    )
    return feats.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        F.col("meta.channels").cast("long").alias("channels"),
        F.col("meta.n_bytes").alias("n_bytes"),
        "pixel_sum",
        (F.col("pixel_sum").cast("double") / n_px).alias("mean_byte"),
    )


@register(
    "multimodal_thumbnail_audit",
    oracle=f"""
WITH dims AS (
  SELECT doc_id,
         16 + doc_id % 48 AS w,
         16 + (doc_id * 7) % 48 AS h
  FROM documents
)
SELECT d.doc_id, CAST({THUMB} AS BIGINT) AS width, CAST({THUMB} AS BIGINT) AS height,
       CAST(13 + {THUMB} * {THUMB} * 3 AS BIGINT) AS n_bytes,
       CAST(SUM((d.doc_id * 31
            + (((y.i * d.h) // {THUMB}) * d.w + ((x.i * d.w) // {THUMB})) * 3 + c.i
           ) % 256) AS BIGINT) AS pixel_sum
FROM dims d, range(0, {THUMB}) y(i), range(0, {THUMB}) x(i), range(0, 3) c(i)
GROUP BY d.doc_id
""",
    doc="Nearest-neighbor thumbnailing of binary rasters (integer source "
    "indexing, bit-deterministic), then re-decode and audit: dimensions, "
    "byte size, and the exact pixel sum of every thumbnail are "
    "recomputed by the oracle from the source recipe.",
    tags=("multimodal", "image", "resize", "pandas-udf"),
)
def multimodal_thumbnail_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    thumbs = image_resize_nearest(
        synth_image_assets(docs), out_w=THUMB, out_h=THUMB
    )
    feats = image_features(thumbs)
    return feats.select(
        "doc_id",
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        "pixel_sum",
    )


def synth_video_assets(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, video binary) with the VID1 recipe above.
    Headers packed inline for the same worker-pickling reason as images."""
    import numpy as np
    import struct

    fmt, magic = VID_HEADER_FMT, VID_MAGIC

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, nf = 8 + d % 8, 8 + (d * 3) % 8, 4 + d % 5
                frame = np.arange(nf, dtype=np.int64)[:, None] * 101
                i = np.arange(w * h * 3, dtype=np.int64)[None, :]
                pix = ((d * 17 + frame + i) % 256).astype(np.uint8)
                ids.append(d)
                blobs.append(struct.pack(fmt, magic, w, h, nf) + pix.tobytes())
            yield pd.DataFrame({"doc_id": ids, "video": blobs})

    return docs.select("doc_id").mapInPandas(part, schema="doc_id long, video binary")


def _sampled_frame_stats(frames: DataFrame) -> DataFrame:
    """(doc_id, slot, src_frame, n_frames, IMG1 frame) -> per-frame stats.

    The sampled frames are IMG1 binaries, so this is the image feature
    kernel re-run per frame while carrying the sampling lineage columns
    (slot, src_frame) that ``image_features``'s fixed schema would drop.
    """
    import numpy as np
    import struct

    fmt, hdr = IMG_HEADER_FMT, IMG_HEADER_SIZE

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, slot, src, nf, data in zip(
                pdf["doc_id"], pdf["slot"], pdf["src_frame"], pdf["n_frames"], pdf["frame"]
            ):
                _, w, h, _c = struct.unpack_from(fmt, data)
                pix = np.frombuffer(data, dtype=np.uint8, offset=hdr)
                out.append(
                    (int(doc_id), int(slot), int(src), int(nf), w, h,
                     int(pix.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "slot", "src_frame", "n_frames",
                         "width", "height", "pixel_sum"],
            )

    return frames.mapInPandas(
        part,
        schema="doc_id long, slot int, src_frame int, n_frames int, "
        "width int, height int, pixel_sum long",
    )


@register(
    "multimodal_video_frame_sample",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         8 + doc_id % 8 AS w,
         8 + (doc_id * 3) % 8 AS h,
         4 + doc_id % 5 AS nf
  FROM documents
)
SELECT d.doc_id,
       CAST(s.i AS BIGINT) AS slot,
       CAST((s.i * d.nf) // 3 AS BIGINT) AS src_frame,
       CAST(d.nf AS BIGINT) AS n_frames,
       CAST(d.w AS BIGINT) AS width,
       CAST(d.h AS BIGINT) AS height,
       CAST(SUM((d.doc_id * 17 + ((s.i * d.nf) // 3) * 101 + p.i) % 256) AS BIGINT)
         AS pixel_sum
FROM dims d, range(0, 3) s(i), range(0, 15 * 15 * 3) p(i)
WHERE p.i < d.w * d.h * 3     -- constant range bound + filter: see image twin
GROUP BY d.doc_id, s.i, d.nf, d.w, d.h
""",
    doc="Video frame sampling over binary VID1 clips: k=3 evenly-strided "
    "frames per clip (slot s takes source frame s*n_frames//3, "
    "bit-deterministic), each re-emitted as an IMG1 image and audited "
    "per-frame (dims + exact pixel sum). Row-local 1->k fan-out, no "
    "shuffle; the oracle recomputes every sampled byte arithmetically.",
    tags=("multimodal", "video", "frame-sample", "pandas-udf"),
)
def multimodal_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frames = video_frame_sample(synth_video_assets(docs), k=3)
    stats = _sampled_frame_stats(frames)
    return stats.select(
        "doc_id",
        F.col("slot").cast("long").alias("slot"),
        F.col("src_frame").cast("long").alias("src_frame"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "pixel_sum",
    )


@register(
    "multimodal_audio_stats",
    oracle="""
WITH meta AS (
  SELECT doc_id, 1000 + doc_id % 500 AS n FROM documents
)
SELECT m.doc_id,
       CAST(m.n AS BIGINT) AS n_samples,
       CAST(SUM(((m.doc_id * 13 + r.i * 7) % 4096 - 2048)
           * ((m.doc_id * 13 + r.i * 7) % 4096 - 2048)) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS((m.doc_id * 13 + r.i * 7) % 4096 - 2048)) AS BIGINT) AS peak
FROM meta m, range(0, 1500) r(i)   -- constant bound + filter: see image twin
WHERE r.i < m.n
GROUP BY m.doc_id, m.n
""",
    doc="Binary PCM16 audio column: encode kernel -> frombuffer int16 "
    "decode -> energy (exact integer sum of squares) and peak per clip.",
    tags=("multimodal", "audio", "pandas-udf"),
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = audio_features(synth_audio_assets(docs))
    return feats.select(
        "doc_id", "n_samples", "sum_sq", F.col("peak").cast("long").alias("peak")
    )


from ..functions.multimodal import image_ahash, png_to_img1  # noqa: E402


def synth_png_assets(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, REAL PNG binary) with the image recipe above.

    Same dims/pixel arithmetic as ``synth_image_assets`` so the oracles
    are shared, but encoded as genuine 8-bit RGB PNG (stdlib zlib codec,
    ``functions/multimodal._png_codec``) with the scanline filter type
    cycling row % 5 — every decode of one asset exercises all five
    unfilter paths (None/Sub/Up/Average/Paeth), so the oracle hash check
    certifies the whole codec, not just the happy path."""
    import numpy as np

    from ..functions.multimodal import _png_codec

    enc, _ = _png_codec()  # captured by value (nested function)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 16 + d % 48, 16 + (d * 7) % 48
                pix = (
                    ((d * 31 + np.arange(w * h * 3)) % 256)
                    .astype(np.uint8)
                    .reshape(h, w, 3)
                )
                ids.append(d)
                blobs.append(enc(pix, 2))
            yield pd.DataFrame({"doc_id": ids, "image": blobs})

    return docs.select("doc_id").mapInPandas(part, schema="doc_id long, image binary")


@register(
    "multimodal_png_stats",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         16 + doc_id % 48 AS width,
         16 + (doc_id * 7) % 48 AS height
  FROM documents
),
stats AS (
  SELECT d.doc_id,
         CAST(d.width AS BIGINT) AS width, CAST(d.height AS BIGINT) AS height,
         CAST(13 + d.width * d.height * 3 AS BIGINT) AS n_bytes,
         CAST(SUM((d.doc_id * 31 + r.i) % 256) AS BIGINT) AS pixel_sum
  FROM dims d, range(0, 63 * 63 * 3) r(i)
  WHERE r.i < d.width * d.height * 3
  GROUP BY d.doc_id, d.width, d.height
),
cells AS (
  SELECT d.doc_id, k.k,
         ((((k.k // 8) * (16 + (d.doc_id * 7) % 48)) // 8)
            * (16 + d.doc_id % 48)
          + (((k.k % 8) * (16 + d.doc_id % 48)) // 8)) * 3 AS b
  FROM documents d, (SELECT unnest(range(0, 64)) AS k) k
),
grays AS (
  SELECT doc_id, k,
         (((doc_id * 31 + b) % 256)
          + ((doc_id * 31 + b + 1) % 256)
          + ((doc_id * 31 + b + 2) % 256)) // 3 AS gray
  FROM cells
),
means AS (SELECT doc_id, SUM(gray) // 64 AS mean FROM grays GROUP BY doc_id),
hashes AS (
  SELECT g.doc_id,
         CAST(SUM(CASE WHEN g.k < 32 AND g.gray > m.mean
                  THEN CAST(1 AS BIGINT) << g.k ELSE 0 END) AS BIGINT) AS ahash_lo,
         CAST(SUM(CASE WHEN g.k >= 32 AND g.gray > m.mean
                  THEN CAST(1 AS BIGINT) << (g.k - 32) ELSE 0 END) AS BIGINT) AS ahash_hi
  FROM grays g JOIN means m USING (doc_id)
  GROUP BY g.doc_id
)
SELECT s.doc_id, s.width, s.height, s.n_bytes, s.pixel_sum,
       h.ahash_lo, h.ahash_hi
FROM stats s JOIN hashes h USING (doc_id)
""",
    doc="REAL-codec image path, end to end and oracle-checked: every "
    "document's raster is encoded as a genuine 8-bit RGB PNG (stdlib "
    "zlib DEFLATE, scanline filters cycling None/Sub/Up/Average/Paeth), "
    "decoded executor-side by the engine's dependency-free PNG decoder "
    "(functions/multimodal._png_codec — the decode seam the IMG1 "
    "operators stubbed until round 11; JPEG stays honestly gated), "
    "transcoded to IMG1 at the codec boundary (png_to_img1), then run "
    "through the UNCHANGED feature and perceptual-hash kernels. The "
    "oracle recomputes dimensions, the transcoded byte length, the "
    "exact pixel sum, and both aHash words arithmetically from the "
    "recipe — a single wrong byte anywhere in DEFLATE/unfilter/"
    "transcode flips the hash. Row-local kernels; the only exchange is "
    "the stats/ahash join on doc_id.",
    tags=("multimodal", "image", "codec", "pandas-udf"),
)
def multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import shared

    # repartition: the documents scan is ONE file -> one partition, so
    # without it the whole DEFLATE encode+decode chain runs on a single
    # core (unlike the raw-IMG1 kernels, the PNG codec is the dominant
    # cost here). The shuffle moves only doc_id longs — the blobs are
    # synthesized AFTER the exchange.
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # shared(): the feature and aHash branches below would each re-run
    # the whole encode->DEFLATE->decode chain (Catalyst does not reuse
    # subtrees across branches); one eager materialization of the
    # transcoded IMG1 rows halves the codec work and the Arrow traffic
    img1 = shared(png_to_img1(synth_png_assets(docs)))
    feats = image_features(img1).select(
        "doc_id",
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        "pixel_sum",
    )
    hashes = image_ahash(img1)
    return feats.join(hashes, "doc_id")


@register(
    "multimodal_image_ahash",
    oracle="""
WITH cells AS (
  SELECT d.doc_id, k.k,
         ((((k.k // 8) * (16 + (d.doc_id * 7) % 48)) // 8)
            * (16 + d.doc_id % 48)
          + (((k.k % 8) * (16 + d.doc_id % 48)) // 8)) * 3 AS b
  FROM documents d, (SELECT unnest(range(0, 64)) AS k) k
),
grays AS (
  SELECT doc_id, k,
         (((doc_id * 31 + b) % 256)
          + ((doc_id * 31 + b + 1) % 256)
          + ((doc_id * 31 + b + 2) % 256)) // 3 AS gray
  FROM cells
),
means AS (SELECT doc_id, SUM(gray) // 64 AS mean FROM grays GROUP BY doc_id)
SELECT g.doc_id,
       CAST(SUM(CASE WHEN g.k < 32 AND g.gray > m.mean
                THEN CAST(1 AS BIGINT) << g.k ELSE 0 END) AS BIGINT) AS ahash_lo,
       CAST(SUM(CASE WHEN g.k >= 32 AND g.gray > m.mean
                THEN CAST(1 AS BIGINT) << (g.k - 32) ELSE 0 END) AS BIGINT) AS ahash_hi
FROM grays g JOIN means m USING (doc_id)
GROUP BY g.doc_id
""",
    doc="Perceptual average-hash fingerprints over the binary image "
    "column: decode kernel -> 8x8 nearest-neighbor grayscale grid -> "
    "threshold against the integer cell mean -> 64-bit hash as two "
    "32-bit words. This is the image-modality twin of the text SimHash "
    "fingerprints: near-duplicate images differ in a few bits, and the "
    "same banded-Hamming join machinery finds pairs without ever "
    "shuffling pixels — only (doc_id, 2 longs) leave the decode stage. "
    "The oracle recomputes every sampled pixel arithmetically from the "
    "deterministic IMG1 recipe, so the whole decode->hash kernel is "
    "checked bit-for-bit. Row-local Arrow kernel; no shuffle.",
    tags=("multimodal", "image", "dedup", "pandas-udf"),
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return image_ahash(synth_image_assets(docs))


#: aHash banding: 64 bits as 8 bands of 8 — pigeonhole over Hamming<=3
#: leaves >=5 identical bands, so the band-bucket equi-join has recall
#: 1.0 for the verify threshold (same constants as the text SimHash
#: machinery, plans/text.py).
_AH_BANDS, _AH_BITS, _AH_HMAX = 8, 8, 3
_AH_PER_WORD = 4  # 32-bit words -> 4 bands each

#: grays/means/hashes CTE shared with the multimodal_image_ahash oracle
_SQL_AHASH_CTE = """
cells AS (
  SELECT d.doc_id, k.k,
         ((((k.k // 8) * (16 + (d.doc_id * 7) % 48)) // 8)
            * (16 + d.doc_id % 48)
          + (((k.k % 8) * (16 + d.doc_id % 48)) // 8)) * 3 AS b
  FROM documents d, (SELECT unnest(range(0, 64)) AS k) k
),
grays AS (
  SELECT doc_id, k,
         (((doc_id * 31 + b) % 256)
          + ((doc_id * 31 + b + 1) % 256)
          + ((doc_id * 31 + b + 2) % 256)) // 3 AS gray
  FROM cells
),
means AS (SELECT doc_id, SUM(gray) // 64 AS mean FROM grays GROUP BY doc_id),
hashes AS (
  SELECT g.doc_id,
         CAST(SUM(CASE WHEN g.k < 32 AND g.gray > m.mean
                  THEN CAST(1 AS BIGINT) << g.k ELSE 0 END) AS BIGINT) AS ahash_lo,
         CAST(SUM(CASE WHEN g.k >= 32 AND g.gray > m.mean
                  THEN CAST(1 AS BIGINT) << (g.k - 32) ELSE 0 END) AS BIGINT) AS ahash_hi
  FROM grays g JOIN means m USING (doc_id)
  GROUP BY g.doc_id
)
"""


#: SQL twin of operators/banded_hamming.hamming_pair_summary — appended
#: after a modality's ``hashes(doc_id, ahash_lo, ahash_hi)`` CTE. The
#: oracle stays the NAIVE all-pairs definition (band-join every doc,
#: verify, checksum per pair); the Spark side must reproduce it from
#: distinct classes + multiplicity arithmetic, byte-identically.
_SQL_PAIR_SUMMARY = f"""
banded AS (
  SELECT doc_id, ahash_lo, ahash_hi, b.band,
         (CASE WHEN b.band < {_AH_PER_WORD}
               THEN ahash_lo >> (b.band * {_AH_BITS})
               ELSE ahash_hi >> ((b.band - {_AH_PER_WORD}) * {_AH_BITS})
          END) & {2**_AH_BITS - 1} AS band_val
  FROM hashes, (SELECT unnest(range(0, {_AH_BANDS})) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.ahash_lo AS lo_a, a.ahash_hi AS hi_a,
                  b.ahash_lo AS lo_b, b.ahash_hi AS hi_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b,
         CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
              AS BIGINT) AS hamming
  FROM cand
  WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
        <= {_AH_HMAX}
)
SELECT hamming, count(*) AS n_pairs,
       CAST(sum((doc_a * 100000 + doc_b) % 1000000007) AS BIGINT)
         AS pair_checksum
FROM pairs GROUP BY hamming
"""

#: audio chunk-energy hash CTE shared with the audio near-dup oracle:
#: recomputes every PCM1 sample arithmetically (n = 1000 + doc_id%500,
#: sample_i = (doc_id*13 + i*7) % 4096 - 2048), sums |sample| into 64
#: equal-by-index chunks (chunk = (i*64)//n), thresholds each chunk
#: against the integer mean — functions/multimodal.audio_ahash's twin.
_SQL_AUDIO_HASH_CTE = """
samples AS (
  SELECT d.doc_id, r.i,
         1000 + d.doc_id % 500 AS n,
         abs((d.doc_id * 13 + r.i * 7) % 4096 - 2048) AS a
  FROM documents d, range(0, 1500) r(i)
  WHERE r.i < 1000 + d.doc_id % 500
),
chunks AS (
  SELECT doc_id, (i * 64) // n AS k, CAST(SUM(a) AS BIGINT) AS c
  FROM samples GROUP BY 1, 2
),
cmean AS (SELECT doc_id, SUM(c) // 64 AS mean FROM chunks GROUP BY doc_id),
hashes AS (
  SELECT ch.doc_id,
         CAST(SUM(CASE WHEN ch.k < 32 AND ch.c > m.mean
                  THEN CAST(1 AS BIGINT) << ch.k ELSE 0 END) AS BIGINT)
           AS ahash_lo,
         CAST(SUM(CASE WHEN ch.k >= 32 AND ch.c > m.mean
                  THEN CAST(1 AS BIGINT) << (ch.k - 32) ELSE 0 END) AS BIGINT)
           AS ahash_hi
  FROM chunks ch JOIN cmean m USING (doc_id)
  GROUP BY ch.doc_id
)
"""


@register(
    "multimodal_image_near_dups",
    oracle=f"""
WITH {_SQL_AHASH_CTE},
{_SQL_PAIR_SUMMARY}
""",
    doc="Image near-duplicate detection — the dedup family crossing into "
    "the image modality: perceptual aHash fingerprints (decode kernel "
    "-> 8x8 grayscale grid -> 64-bit hash) run through the SAME banded "
    "Hamming machinery as the text SimHash dedup (8x8-bit bands, "
    "band-bucket equi-join, bit_count verify <= 3; pigeonhole recall "
    "1.0). Duplicate-heavy corpora are the hard case: exact-dup "
    "fingerprint classes of size m would put O(m^2) candidate rows "
    "through the band join, so (the X206/pretrain-funnel contract "
    "applied to the image modality — operators/banded_hamming, shared "
    "with the audio twin) exact classes collapse to ONE distinct "
    "fingerprint + multiplicity BEFORE banding and the per-Hamming "
    "pair counts AND exact modular checksum are recovered "
    "arithmetically, O(m log m) per class never O(m^2). Output is "
    "byte-identical to the naive all-pairs oracle while candidate "
    "mass is O(distinct^2), independent of dup multiplicity.",
    tags=("multimodal", "image", "dedup", "pandas-udf"),
)
def multimodal_image_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.banded_hamming import hamming_pair_summary
    from ..operators.partitioning import shared

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return hamming_pair_summary(shared(image_ahash(synth_image_assets(docs))))


@register(
    "multimodal_audio_near_dups",
    oracle=f"""
WITH {_SQL_AUDIO_HASH_CTE},
{_SQL_PAIR_SUMMARY}
""",
    doc="Audio near-duplicate detection — the dedup family completing "
    "its modality coverage (text SimHash/MinHash, embeddings, images, "
    "now audio): PCM1 assets decode executor-side into a 64-bit "
    "chunk-energy perceptual hash (64 equal-by-index chunks, exact "
    "integer |sample| sums thresholded at the integer chunk mean — "
    "functions/multimodal.audio_ahash), then the SAME dedup-first "
    "banded-Hamming operator as images (operators/banded_hamming): "
    "distinct fingerprints + multiplicity band-join, pair counts and "
    "the exact modular checksum recovered arithmetically. The fixture "
    "corpus is genuinely dup-heavy in this hash (258 distinct hashes "
    "per 500 docs, 419 exact-dup pairs), so the class-collapse path is "
    "the one actually exercised. Samples never join; only (band, "
    "band_val, 2 words) shuffle.",
    tags=("multimodal", "audio", "dedup", "pandas-udf"),
)
def multimodal_audio_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import audio_ahash
    from ..operators.banded_hamming import hamming_pair_summary
    from ..operators.partitioning import shared

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return hamming_pair_summary(shared(audio_ahash(synth_audio_assets(docs))))


@register(
    "multimodal_image_dedup_incremental",
    oracle=f"""
WITH {_SQL_AHASH_CTE},
tagged AS (
  SELECT doc_id, ahash_lo, ahash_hi, doc_id % 10 = 0 AS is_probe
  FROM hashes
),
pairs AS (
  SELECT p.doc_id AS probe_doc,
         CAST(bit_count(xor(p.ahash_lo, c.ahash_lo))
              + bit_count(xor(p.ahash_hi, c.ahash_hi)) AS BIGINT) AS hamming
  FROM tagged p JOIN tagged c
    ON p.is_probe AND NOT c.is_probe
   AND bit_count(xor(p.ahash_lo, c.ahash_lo))
       + bit_count(xor(p.ahash_hi, c.ahash_hi)) <= {_AH_HMAX}
),
per_h AS (
  SELECT hamming, count(*) AS n_pairs FROM pairs GROUP BY hamming
),
mins AS (
  SELECT min(hamming) AS min_ham FROM pairs GROUP BY probe_doc
),
min_h AS (
  SELECT min_ham AS hamming, CAST(count(*) AS BIGINT) AS n_probe_docs_min
  FROM mins GROUP BY min_ham
)
SELECT per_h.hamming AS hamming, per_h.n_pairs AS n_pairs,
       COALESCE(min_h.n_probe_docs_min, 0) AS n_probe_docs_min
FROM per_h LEFT JOIN min_h ON per_h.hamming = min_h.hamming
""",
    doc="INCREMENTAL image near-dedup — the ingest-time form a training "
    "pipeline actually runs (the text family's incremental-vs-indexed "
    "contract, plans/text.py:2441, crossed into the image modality): "
    "the corpus (doc_id % 10 != 0) is reduced to DISTINCT aHash "
    "classes + multiplicity (the round-12 dedup-first contract) and "
    "banded into an index; the probe batch (doc_id % 10 == 0) is "
    "likewise class-collapsed and only its distinct fingerprints "
    "band-join the index — probe cost O(batch + matches), pair counts "
    "recovered as m_probe*m_corpus, never a pixel or member-pair "
    "materialized. Output per Hamming distance: candidate pair count "
    "and how many probe docs have that distance as their MINIMUM to "
    "the corpus — the per-threshold admission decision (min-Hamming "
    "distribution) a dedup gate enforces. Same-hash probe/corpus "
    "overlap contributes Hamming 0 without touching the band join.",
    tags=("multimodal", "image", "dedup", "incremental", "pandas-udf"),
)
def multimodal_image_dedup_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.partitioning import shared

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    fp = shared(image_ahash(synth_image_assets(docs)))
    cls = shared(
        fp.groupBy("ahash_lo", "ahash_hi").agg(
            F.sum(
                F.when(F.col("doc_id") % 10 == 0, 1).otherwise(0)
            ).alias("m_probe"),
            F.sum(
                F.when(F.col("doc_id") % 10 != 0, 1).otherwise(0)
            ).alias("m_corpus"),
        )
    )
    mask = 2**_AH_BITS - 1
    bands = []
    for b in range(_AH_BANDS):
        word = F.col("ahash_lo") if b < _AH_PER_WORD else F.col("ahash_hi")
        shift = (b % _AH_PER_WORD) * _AH_BITS
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(word, shift).bitwiseAND(F.lit(mask)).alias(
                    "band_val"
                ),
            )
        )

    def banded(side: DataFrame) -> DataFrame:
        return side.select(
            "ahash_lo",
            "ahash_hi",
            "m",
            F.explode(F.array(*bands)).alias("bb"),
        ).select("ahash_lo", "ahash_hi", "m", "bb.band", "bb.band_val")

    probe = banded(
        cls.filter(F.col("m_probe") > 0).select(
            "ahash_lo", "ahash_hi", F.col("m_probe").alias("m")
        )
    ).alias("p")
    corpus = banded(
        cls.filter(F.col("m_corpus") > 0).select(
            "ahash_lo", "ahash_hi", F.col("m_corpus").alias("m")
        )
    ).alias("c")
    ham = (
        F.bit_count(F.col("p.ahash_lo").bitwiseXOR(F.col("c.ahash_lo")))
        + F.bit_count(F.col("p.ahash_hi").bitwiseXOR(F.col("c.ahash_hi")))
    ).cast("long")
    # distinct-fingerprint candidates from the band index; same-hash
    # overlap (hamming 0 within one class) needs no join at all and is
    # unioned from the class table directly
    cand = (
        probe.join(
            corpus,
            (F.col("p.band") == F.col("c.band"))
            & (F.col("p.band_val") == F.col("c.band_val"))
            & (
                (F.col("p.ahash_lo") != F.col("c.ahash_lo"))
                | (F.col("p.ahash_hi") != F.col("c.ahash_hi"))
            ),
        )
        .select(
            F.col("p.ahash_lo").alias("plo"),
            F.col("p.ahash_hi").alias("phi"),
            F.col("c.ahash_lo").alias("clo"),
            F.col("c.ahash_hi").alias("chi"),
            F.col("p.m").alias("m_p"),
            F.col("c.m").alias("m_c"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= _AH_HMAX)
        .distinct()
    )
    same = cls.filter(
        (F.col("m_probe") > 0) & (F.col("m_corpus") > 0)
    ).select(
        F.col("ahash_lo").alias("plo"),
        F.col("ahash_hi").alias("phi"),
        F.col("ahash_lo").alias("clo"),
        F.col("ahash_hi").alias("chi"),
        F.col("m_probe").alias("m_p"),
        F.col("m_corpus").alias("m_c"),
        F.lit(0).cast("long").alias("hamming"),
    )
    matches = shared(cand.unionByName(same))
    per_h = matches.groupBy("hamming").agg(
        F.sum(F.col("m_p") * F.col("m_c")).alias("n_pairs")
    )
    min_h = (
        matches.groupBy("plo", "phi")
        .agg(F.min("hamming").alias("hamming"), F.first("m_p").alias("m_p"))
        .groupBy("hamming")
        .agg(F.sum("m_p").cast("long").alias("n_probe_docs_min"))
    )
    return per_h.join(min_h, "hamming", "left").select(
        "hamming",
        "n_pairs",
        F.coalesce(F.col("n_probe_docs_min"), F.lit(0).cast("long")).alias(
            "n_probe_docs_min"
        ),
    )


#: video temporal-majority hash CTE shared with the video near-dup
#: oracle: recomputes every sampled VID1 byte arithmetically (dims
#: w = 8 + d%8, h = 8 + 3d%8, nf = 4 + d%5 <= 8; pixel x of frame f is
#: (d*17 + f*101 + x) % 256 — plans/multimodal.synth_video_assets), runs
#: the 8x8 nearest-neighbor grayscale aHash per frame, then keeps bit k
#: iff a strict majority of the clip's frames set it —
#: functions/multimodal.video_mhash's twin.
_SQL_VIDEO_HASH_CTE = """
vcells AS (
  SELECT d.doc_id, f.f, k.k,
         4 + d.doc_id % 5 AS nf,
         ((((k.k // 8) * (8 + (d.doc_id * 3) % 8)) // 8)
            * (8 + d.doc_id % 8)
          + (((k.k % 8) * (8 + d.doc_id % 8)) // 8)) * 3 AS b
  FROM documents d,
       (SELECT unnest(range(0, 8)) AS f) f,
       (SELECT unnest(range(0, 64)) AS k) k
  WHERE f.f < 4 + d.doc_id % 5
),
vgrays AS (
  SELECT doc_id, f, k, nf,
         (((doc_id * 17 + f * 101 + b) % 256)
          + ((doc_id * 17 + f * 101 + b + 1) % 256)
          + ((doc_id * 17 + f * 101 + b + 2) % 256)) // 3 AS gray
  FROM vcells
),
vmeans AS (
  SELECT doc_id, f, SUM(gray) // 64 AS mean FROM vgrays GROUP BY 1, 2
),
vbits AS (
  SELECT g.doc_id, g.k, g.nf,
         SUM(CASE WHEN g.gray > m.mean THEN 1 ELSE 0 END) AS nset
  FROM vgrays g JOIN vmeans m ON g.doc_id = m.doc_id AND g.f = m.f
  GROUP BY 1, 2, 3
),
hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN k < 32 AND 2 * nset > nf
                  THEN CAST(1 AS BIGINT) << k ELSE 0 END) AS BIGINT)
           AS ahash_lo,
         CAST(SUM(CASE WHEN k >= 32 AND 2 * nset > nf
                  THEN CAST(1 AS BIGINT) << (k - 32) ELSE 0 END) AS BIGINT)
           AS ahash_hi
  FROM vbits GROUP BY doc_id
)
"""


@register(
    "multimodal_video_near_dups",
    oracle=f"""
WITH {_SQL_VIDEO_HASH_CTE},
{_SQL_PAIR_SUMMARY}
""",
    doc="Video near-duplicate detection — the dedup family's FIFTH "
    "modality (text SimHash/MinHash, embeddings, images, audio, now "
    "video): VID1 clips decode executor-side into a temporal-majority "
    "perceptual hash (per-frame 8x8 grayscale aHash, clip bit k set "
    "iff a strict majority of frames set it — "
    "functions/multimodal.video_mhash), then the SAME dedup-first "
    "banded-Hamming operator as images and audio "
    "(operators/banded_hamming): exact fingerprint classes collapse "
    "to distinct hashes + multiplicity before banding, per-Hamming "
    "pair counts and the exact mod-1e9+7 checksum recovered "
    "arithmetically. The VID1 recipe is periodic in doc_id with "
    "period 1280 (lcm of the dim/frame/pixel residues), so larger "
    "corpora genuinely contain exact-duplicate clips and the "
    "class-collapse path is exercised, not idle. Frames never "
    "join; only (band, band_val, 2 words) shuffle.",
    tags=("multimodal", "video", "dedup", "pandas-udf"),
)
def multimodal_video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import video_mhash
    from ..operators.banded_hamming import hamming_pair_summary
    from ..operators.partitioning import shared

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return hamming_pair_summary(shared(video_mhash(synth_video_assets(docs))))
