"""Multimodal kernel unit tests beyond the oracle gate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.functions.multimodal import (
    HAVE_PIL,
    decode_image_rgb,
    decode_video_frames,
    image_features,
    image_resize_nearest,
    video_frame_sample,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.multimodal import (
    synth_image_assets,
    synth_video_assets,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (
    load_table,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(HAVE_PIL, reason="gate only applies without Pillow")
def test_non_png_codec_decode_is_a_clear_gate():
    # JPEG magic: the non-PNG seam still refuses loudly without Pillow
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_rgb(b"\xff\xd8\xff\xe0\x00\x10JFIF\x00")


class TestPngCodec:
    """The dependency-free stdlib-zlib PNG codec (round-11: the decode
    seam is REAL for PNG; JPEG stays gated)."""

    def test_roundtrip_all_color_types_and_filters(self):
        import numpy as np

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.functions.multimodal import (
            _png_codec,
        )

        enc, dec = _png_codec()
        rng = np.random.RandomState(11)
        # >= 5 rows everywhere so the cycling row%5 filter exercises all
        # five unfilter paths (None/Sub/Up/Average/Paeth) per image
        for h, w, ct in [(5, 1, 2), (7, 3, 2), (16, 23, 2), (8, 8, 0), (9, 13, 6)]:
            c = {0: 1, 2: 3, 6: 4}[ct]
            r = rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)
            got = dec(enc(r, ct))
            want = (
                r if ct == 2
                else np.repeat(r, 3, axis=2) if ct == 0
                else r[:, :, :3]
            )
            assert got.shape == (h, w, 3)
            assert (got == want).all(), (h, w, ct)

    def test_foreign_libpng_pixel_decodes_exactly(self):
        # the widely-published 1x1 red-pixel PNG (libpng-encoded): a
        # FOREIGN encoder's bytes, with a documented expected pixel —
        # independent evidence the decoder isn't just inverting its own
        # encoder's misunderstanding of the spec
        import base64

        b64 = (
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
            "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
        )
        r = decode_image_rgb(base64.b64decode(b64))
        assert r.shape == (1, 1, 3) and r.tolist() == [[[255, 0, 0]]]

    def test_unsupported_png_features_refuse_loudly(self):
        import struct
        import zlib

        import numpy as np

        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.functions.multimodal import (
            _png_codec,
        )

        enc, dec = _png_codec()

        def rewrite_ihdr(png: bytes, **kw) -> bytes:
            w, h, depth, ct, comp, filt, inter = struct.unpack(
                ">IIBBBBB", png[16:29]
            )
            vals = dict(
                w=w, h=h, depth=depth, ct=ct, comp=comp, filt=filt, inter=inter
            )
            vals.update(kw)
            ihdr = struct.pack(
                ">IIBBBBB", vals["w"], vals["h"], vals["depth"], vals["ct"],
                vals["comp"], vals["filt"], vals["inter"],
            )
            return (
                png[:8]
                + struct.pack(">I", 13) + b"IHDR" + ihdr
                + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
                + png[33:]
            )

        png = enc(np.zeros((6, 6, 3), dtype=np.uint8), 2)
        with pytest.raises(NotImplementedError, match="bit depth"):
            dec(rewrite_ihdr(png, depth=16))
        with pytest.raises(NotImplementedError, match="interlaced"):
            dec(rewrite_ihdr(png, inter=1))
        with pytest.raises(NotImplementedError, match="color type"):
            dec(rewrite_ihdr(png, ct=3))  # palette
        with pytest.raises(ValueError, match="signature"):
            dec(b"\x89PNG\x00\x00\x00\x00" + png[8:])

    def test_png_to_img1_composes_with_raster_kernels(self, spark):
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.functions.multimodal import (
            png_to_img1,
        )
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.multimodal import (
            synth_png_assets,
        )

        docs = load_table(spark, SF, "documents").limit(8)
        via_png = {
            r.doc_id: (r.meta.width, r.meta.height, r.pixel_sum)
            for r in image_features(png_to_img1(synth_png_assets(docs))).collect()
        }
        via_img1 = {
            r.doc_id: (r.meta.width, r.meta.height, r.pixel_sum)
            for r in image_features(synth_image_assets(docs)).collect()
        }
        assert via_png == via_img1 and len(via_png) == 8


def test_identity_resize_preserves_pixels(spark):
    """Resizing to the source dimensions is the identity transform: same
    bytes, same stats — pins the integer source-indexing convention."""
    docs = load_table(spark, SF, "documents").limit(8)
    assets = synth_image_assets(docs)
    before = {
        r.doc_id: (r.meta.width, r.meta.height, r.pixel_sum)
        for r in image_features(assets).collect()
    }
    # per-asset identity resize requires uniform dims; pick one asset
    doc_id, (w, h, psum) = next(iter(before.items()))
    one = assets.filter(f"doc_id = {doc_id}")
    resized = image_resize_nearest(one, out_w=w, out_h=h)
    (after,) = image_features(resized).collect()
    assert (after.meta.width, after.meta.height, after.pixel_sum) == (w, h, psum)


def test_video_codec_decode_is_a_clear_stub():
    with pytest.raises(NotImplementedError, match="PyAV|OpenCV"):
        decode_video_frames(b"\x00\x00\x00 ftypmp42")


def test_video_frames_compose_with_image_operators(spark):
    """Sampled frames are IMG1 binaries, so the existing image feature
    kernel runs on them unchanged — video reduces to the image path."""
    docs = load_table(spark, SF, "documents").limit(6)
    frames = video_frame_sample(synth_video_assets(docs), k=3).cache()
    try:
        rows = frames.collect()
        assert len(rows) == 6 * 3
        for r in rows:
            assert 0 <= r.src_frame < r.n_frames
            assert r.frame[:4] == b"IMG1"
        # feed slot-0 frames through the image kernel: dims match the recipe
        slot0 = frames.filter("slot = 0").select("doc_id", F.col("frame").alias("image"))
        for f in image_features(slot0, bin_col="image").collect():
            d = f.doc_id
            assert (f.meta.width, f.meta.height) == (8 + d % 8, 8 + (d * 3) % 8)
    finally:
        frames.unpersist()


def test_metadata_struct_is_typed(spark):
    docs = load_table(spark, SF, "documents").limit(4)
    feats = image_features(synth_image_assets(docs))
    schema = {f.name: f.dataType.simpleString() for f in feats.schema.fields}
    assert schema["meta"].startswith("struct<format:string,width:int")
    row = feats.first()
    assert row.meta.format == "IMG1" and row.meta.n_bytes > 13


def test_encoders_roundtrip_through_feature_kernels(spark):
    """encode_img1 / encode_pcm1 / encode_vid1 are the write-side API for
    the custom formats: bytes they produce must decode through the same
    feature kernels the queries use, with matching dims and stats."""
    import numpy as np

    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.functions.multimodal import (
        audio_features,
        encode_img1,
        encode_pcm1,
        encode_vid1,
        video_frame_sample,
    )

    w, h = 5, 4
    pix = np.arange(w * h * 3, dtype=np.uint8)
    img = spark.createDataFrame([(1, encode_img1(w, h, pix))], "doc_id long, image binary")
    row = image_features(img).first()
    assert (row.meta.width, row.meta.height, row.meta.channels) == (w, h, 3)
    assert row.pixel_sum == int(pix.sum())

    samples = np.array([0, 100, -100, 2047, -2048], dtype="<i2")
    pcm = spark.createDataFrame([(2, encode_pcm1(samples))], "doc_id long, audio binary")
    arow = audio_features(pcm).first()
    adict = arow.asDict(recursive=True)
    flat = {**adict, **adict.get("meta", {})}
    assert flat["n_samples"] == len(samples)
    assert max(abs(int(s)) for s in samples) in (
        flat.get("peak"),
        flat.get("peak_abs"),
        flat.get("max_abs"),
    )

    vpix = np.arange(2 * 3 * 2 * 3, dtype=np.uint8)  # 2 frames of 3x2 rgb
    vid = spark.createDataFrame(
        [(3, encode_vid1(3, 2, 2, vpix))], "doc_id long, video binary"
    )
    frames = video_frame_sample(vid, k=2).collect()
    assert len(frames) == 2


def test_image_near_dups_dedup_first_is_exact_under_mod_wraps(spark, tmp_path):
    """The dedup-first near-dup rewrite (distinct fingerprints band-join;
    pair counts + modular checksum recovered arithmetically) must be
    byte-identical to the naive all-pairs definition — including when
    doc_a*100000 + doc_b wraps mod 1e9+7, which the offsets below force
    (exercising the probe-row wrap accounting).
    """
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.multimodal import (
        multimodal_image_near_dups,
    )

    P, K = 1_000_000_007, 100_000
    base = load_table(spark, SF, "documents").filter(F.col("doc_id") % 5 == 0)
    parts = [base]
    for off in (123_456_789, 999_000_000, 999_990_000):
        parts.append(base.withColumn("doc_id", F.col("doc_id") + F.lit(off)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    d = str(tmp_path / "corpus")
    u.write.parquet(d + "/documents.parquet")

    got = {
        int(r["hamming"]): (int(r["n_pairs"]), int(r["pair_checksum"]))
        for r in multimodal_image_near_dups(spark, d).collect()
    }

    # brute force: IMG1 recipe -> aHash -> all pairs (reference spec)
    ids = sorted(r[0] for r in u.select("doc_id").collect())
    assert max(ids) * K + max(ids) >= P, "fixture must force mod wraps"

    def ahash(dv: int) -> int:
        w, h = 16 + dv % 48, 16 + (dv * 7) % 48
        grays = []
        for k in range(64):
            r, c = divmod(k, 8)
            y, x = (r * h) // 8, (c * w) // 8
            b0 = (y * w + x) * 3
            grays.append(sum((dv * 31 + b0 + j) % 256 for j in range(3)) // 3)
        mean = sum(grays) // 64
        return sum(1 << k for k in range(64) if grays[k] > mean)

    hs = [ahash(v) for v in ids]
    assert len(set(hs)) < len(hs), "fixture must contain exact-dup classes"
    exp: dict[int, list[int]] = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = bin(hs[i] ^ hs[j]).count("1")
            if ham <= 3:
                e = exp.setdefault(ham, [0, 0])
                e[0] += 1
                e[1] += (ids[i] * K + ids[j]) % P
    assert got == {h: tuple(v) for h, v in exp.items()}
