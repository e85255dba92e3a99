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


def test_registration_breadth(tmp_path):
    """ADE20K-full / COCO-Stuff-10k / Mapillary panoptic / COCO
    panoptic-with-semseg register when their files exist and their dicts
    load (reference: register_ade20k_full.py:944, register_coco_stuff_10k
    .py:200, register_mapillary_vistas_panoptic.py:489,
    register_coco_panoptic_annos_semseg.py:129)."""
    import json
    import os

    from PIL import Image

    from bm2f_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from bm2f_tpu.data.datasets.builtin import register_all_builtin_datasets

    root = tmp_path
    rng = np.random.RandomState(0)

    def mkimg(path, mode="RGB", size=(16, 16)):
        path.parent.mkdir(parents=True, exist_ok=True)
        arr = (rng.rand(*size, 3) * 255).astype(np.uint8) if mode == "RGB" \
            else rng.randint(0, 5, size).astype(np.uint8)
        Image.fromarray(arr, mode=mode if mode == "RGB" else None).save(path)

    # ADE20K-full (tif gts)
    mkimg(root / "ADE20K_2021_17_01/images_detectron2/training/a.jpg")
    gt_dir = root / "ADE20K_2021_17_01/annotations_detectron2/training"
    gt_dir.mkdir(parents=True, exist_ok=True)
    Image.fromarray(rng.randint(0, 100, (16, 16)).astype(np.uint16)).save(
        gt_dir / "a.tif")
    (root / "ADE20K_2021_17_01/images_detectron2/validation").mkdir(parents=True)
    (root / "ADE20K_2021_17_01/annotations_detectron2/validation").mkdir(parents=True)

    # COCO-Stuff-10k
    mkimg(root / "coco/coco_stuff_10k/images_detectron2/train/b.jpg")
    mkimg(root / "coco/coco_stuff_10k/annotations_detectron2/train/b.png", "L")
    (root / "coco/coco_stuff_10k/images_detectron2/test").mkdir(parents=True)
    (root / "coco/coco_stuff_10k/annotations_detectron2/test").mkdir(parents=True)

    # COCO panoptic + derived semseg
    pj = {"categories": [{"id": 1, "name": "thing", "isthing": 1},
                          {"id": 2, "name": "stuff", "isthing": 0}],
          "annotations": [{"file_name": "c.png", "image_id": 7,
                           "segments_info": [{"id": 1, "category_id": 1,
                                              "iscrowd": 0}]}]}
    (root / "coco/annotations").mkdir(parents=True)
    (root / "coco/annotations/panoptic_val2017.json").write_text(json.dumps(pj))
    from bm2f_tpu.data.panoptic_io import write_panoptic_png
    pan_ids = np.zeros((16, 16), np.uint32); pan_ids[4:12, 4:12] = 1
    (root / "coco/panoptic_val2017").mkdir()
    write_panoptic_png(str(root / "coco/panoptic_val2017/c.png"),
                       np.asarray(pan_ids))
    mkimg(root / "coco/panoptic_semseg_val2017/c.png", "L")
    mkimg(root / "coco/val2017/c.jpg")

    # Mapillary panoptic
    mkimg(root / "mapillary_vistas/training/images/d.jpg")
    (root / "mapillary_vistas/training/labels_detectron2").mkdir(parents=True)
    (root / "mapillary_vistas/training/panoptic").mkdir(parents=True)
    mpj = {"categories": pj["categories"],
           "annotations": [{"file_name": "d.png", "image_id": 9,
                            "segments_info": [{"id": 1, "category_id": 2,
                                               "iscrowd": 0}]}]}
    (root / "mapillary_vistas/training/panoptic/panoptic_2018.json"
     ).write_text(json.dumps(mpj))
    write_panoptic_png(str(root / "mapillary_vistas/training/panoptic/d.png"),
                       np.asarray(pan_ids))
    (root / "mapillary_vistas/validation/images").mkdir(parents=True)
    (root / "mapillary_vistas/validation/labels_detectron2").mkdir(parents=True)

    for n in ("ade20k_full_sem_seg_train", "ade20k_full_sem_seg_val",
              "coco_2017_train_stuff_10k_sem_seg",
              "coco_2017_test_stuff_10k_sem_seg",
              "coco_2017_val_panoptic", "coco_2017_val_panoptic_with_sem_seg",
              "mapillary_vistas_panoptic_train",
              "mapillary_vistas_sem_seg_train", "mapillary_vistas_sem_seg_val"):
        if n in DatasetCatalog:
            DatasetCatalog.remove(n)
    register_all_builtin_datasets(root=str(root), force=True)

    d = DatasetCatalog.get("ade20k_full_sem_seg_train")
    assert len(d) == 1 and d[0]["sem_seg_file_name"].endswith("a.tif")
    assert MetadataCatalog.get("ade20k_full_sem_seg_train").ignore_label == 65535

    d = DatasetCatalog.get("coco_2017_train_stuff_10k_sem_seg")
    assert len(d) == 1 and d[0]["file_name"].endswith("b.jpg")

    d = DatasetCatalog.get("coco_2017_val_panoptic_with_sem_seg")
    assert len(d) == 1
    assert d[0]["sem_seg_file_name"].endswith("panoptic_semseg_val2017/c.png")
    assert d[0]["segments_info"][0]["category_id"] == 0  # contiguous

    d = DatasetCatalog.get("mapillary_vistas_panoptic_train")
    assert len(d) == 1 and d[0]["pan_seg_file_name"].endswith("d.png")
