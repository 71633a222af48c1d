"""Multimodal kernel unit tests beyond the oracle gate."""

from __future__ import annotations

import pytest

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.functions.multimodal import (
    HAVE_PIL,
    decode_image_rgb,
    image_features,
    image_resize_nearest,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.multimodal import (
    synth_image_assets,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (
    load_table,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(HAVE_PIL, reason="stub only applies without Pillow")
def test_codec_decode_is_a_clear_stub():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_rgb(b"\x89PNG....")


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


def test_metadata_struct_is_typed(spark):
    docs = load_table(spark, SF, "documents").limit(4)
    feats = image_features(synth_image_assets(docs))
    schema = {f.name: f.dataType.simpleString() for f in feats.schema.fields}
    assert schema["meta"].startswith("struct<format:string,width:int")
    row = feats.first()
    assert row.meta.format == "IMG1" and row.meta.n_bytes > 13
