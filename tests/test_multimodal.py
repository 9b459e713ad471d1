"""Multimodal plumbing: schemas, batching, decode-stub feature extraction."""

import numpy as np
import pytest

from geotiff_scalable_analysis_pipeline_spark.operators import multimodal as mm


def test_feature_extraction_all_modalities(spark):
    media = mm.synthetic_multimodal(spark, n=30)
    feats = mm.extract_features(media).toPandas()
    assert len(feats) == 30
    by_mod = feats.groupby("modality").feat.first()
    assert len(by_mod["image"]) == 3  # RGB channel means
    assert len(by_mod["audio"]) == 8  # energy bins
    assert len(by_mod["video"]) == 3
    assert (feats[feats.modality == "video"].n_items == 4).all()  # frame sample
    assert (feats[feats.modality == "audio"].n_items == 8000).all()


def test_deterministic_across_partitionings(spark):
    a = mm.extract_features(mm.synthetic_multimodal(spark, 24)).orderBy("media_ref").toPandas()
    b = (
        mm.extract_features(mm.synthetic_multimodal(spark, 24).repartition(7))
        .orderBy("media_ref")
        .toPandas()
    )
    for x, y in zip(a.feat, b.feat):
        assert np.array_equal(np.array(x), np.array(y))


def test_unknown_modality_raises():
    with pytest.raises(NotImplementedError):
        mm.fake_decode(b"xx", "hologram", {})


def test_resize_nearest_exact():
    img = np.arange(12 * 8 * 3, dtype=np.uint8).reshape(12, 8, 3)
    small = mm._resize_nearest(img, 6, 4)
    assert small.shape == (6, 4, 3)
    assert np.array_equal(small[0, 0], img[0, 0])
    assert np.array_equal(small[5, 3], img[10, 6])
