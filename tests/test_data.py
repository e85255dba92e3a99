"""Data layer tests: mask codec roundtrips, transforms, mappers, loaders."""

import numpy as np
import pytest

from bm2f_tpu.config import InputConfig
from bm2f_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from bm2f_tpu.data.loader import build_train_loader, collate
from bm2f_tpu.data.mappers import (
    COCOInstanceLSJMapper,
    MaskFormerSemanticMapper,
)
from bm2f_tpu.data.mask_ops import (
    mask_to_box,
    polygons_to_mask,
    rle_decode,
    rle_encode,
    segmentation_to_mask,
)


def test_rle_roundtrip(rng):
    for _ in range(5):
        m = (rng.rand(37, 53) > 0.6).astype(np.uint8)
        rle = rle_encode(m)
        back = rle_decode(rle)
        np.testing.assert_array_equal(m, back)


def test_rle_empty_and_full():
    z = np.zeros((10, 10), np.uint8)
    o = np.ones((10, 10), np.uint8)
    np.testing.assert_array_equal(rle_decode(rle_encode(z)), z)
    np.testing.assert_array_equal(rle_decode(rle_encode(o)), o)


def test_uncompressed_rle_decode():
    # column-major: 3 zeros then 5 ones then rest zeros
    rle = {"size": [4, 3], "counts": [3, 5, 4]}
    m = rle_decode(rle)
    assert m.shape == (4, 3)
    flat = m.T.reshape(-1)
    assert (flat[:3] == 0).all() and (flat[3:8] == 1).all() and (flat[8:] == 0).all()


def test_polygon_rasterization():
    # axis-aligned square [2,2]..[8,8]
    poly = [[2, 2, 8, 2, 8, 8, 2, 8]]
    m = polygons_to_mask(poly, 12, 12)
    assert m[5, 5] == 1
    assert m[0, 0] == 0
    assert m[3, 3] == 1
    assert mask_to_box(m).tolist() == [2.0, 2.0, 9.0, 9.0]


def _synthetic_instance_dicts(n=8, h=120, w=160, seed=0):
    rng = np.random.RandomState(seed)
    dicts = []
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        anns = []
        for g in range(rng.randint(1, 4)):
            x0, y0 = rng.randint(0, w - 40), rng.randint(0, h - 40)
            bw, bh = rng.randint(10, 40), rng.randint(10, 40)
            poly = [[x0, y0, x0 + bw, y0, x0 + bw, y0 + bh, x0, y0 + bh]]
            anns.append(
                {"bbox": [x0, y0, bw, bh], "category_id": int(rng.randint(0, 5)),
                 "segmentation": poly, "iscrowd": 0}
            )
        dicts.append(
            {"image": img, "height": h, "width": w, "image_id": i,
             "annotations": anns}
        )
    return dicts


def test_lsj_mapper_static_shapes():
    cfg = InputConfig(image_size=128, max_instances=10)
    mapper = COCOInstanceLSJMapper(cfg, seed=3)
    for dd in _synthetic_instance_dicts(4):
        s = mapper(dd)
        assert s["images"].shape == (128, 128, 3)
        assert s["labels"].shape == (10,)
        assert s["masks"].shape == (10, 128, 128)
        assert s["valid"].shape == (10,)
        # valid masks must be nonempty, invalid all-zero
        for g in range(10):
            if s["valid"][g]:
                assert s["masks"][g].sum() > 0
            else:
                assert s["masks"][g].sum() == 0


def test_semantic_mapper_classes_match_map():
    cfg = InputConfig(image_size=96, max_instances=20)
    mapper = MaskFormerSemanticMapper(cfg, seed=1, short_edge_choices=(96,))
    rng = np.random.RandomState(0)
    img = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
    sem = rng.randint(0, 4, (100, 140)).astype(np.int32)
    s = mapper({"image": img, "sem_seg": sem})
    labels = s["labels"][s["valid"]]
    # every valid class mask matches the semantic map
    for lbl, m, v in zip(s["labels"], s["masks"], s["valid"]):
        if v:
            np.testing.assert_array_equal(m > 0, s["sem_seg"] == lbl)


def test_train_loader_batches():
    name = "bm2f_test_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: _synthetic_instance_dicts(6))
    cfg = InputConfig(image_size=64, max_instances=5)
    mapper = COCOInstanceLSJMapper(cfg, seed=0)
    loader = build_train_loader(name, mapper, batch_size=2)
    batch = next(iter(loader))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["masks"].shape == (2, 5, 64, 64)
    assert batch["valid"].dtype == bool


def test_flip_pads_land_bottom_right():
    """Padding must land bottom/right of the FLIPPED image (reference: flip
    precedes FixedSizeCrop / pad-to-divisibility), not on its left."""
    from bm2f_tpu.data.transforms import GeomTransform

    img = np.full((4, 4, 3), 200, np.uint8)
    t = GeomTransform(resize_hw=(4, 4), flip=True, pad_hw=(6, 6))
    out = t.apply_image(img, pad_value=0.0)
    assert out.shape[:2] == (6, 6)
    assert (out[:4, :4] == 200).all(), "content must stay top-left"
    assert (out[:, 4:] == 0).all() and (out[4:] == 0).all()
