"""COCO val2017 loader against a real-annotation-format fixture.

The fixture replicates the exact val2017 JSON schema (images/annotations/
categories for instances, images/annotations for captions) and the %012d.jpg
image naming (reference path construction, data_coco.py:178), exercised
through the registry path `get_dataset(cfg, 'coco')`.
"""

import json

import numpy as np

from plangen_tpu.data.coco import COCOValDataset, _MiniCOCO


def make_coco_fixture(root):
    from PIL import Image

    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    images = [
        {"id": 42, "width": 200, "height": 100, "file_name": "000000000042.jpg"},
        {"id": 7, "width": 100, "height": 100, "file_name": "000000000007.jpg"},
    ]
    categories = [
        {"id": 1, "name": "person", "supercategory": "person"},
        {"id": 18, "name": "dog", "supercategory": "animal"},
    ]
    annotations = [
        # bbox is xywh pixel (COCO convention)
        {"id": 1, "image_id": 42, "category_id": 1, "bbox": [10, 20, 60, 70],
         "area": 4200, "iscrowd": 0},
        {"id": 2, "image_id": 42, "category_id": 18, "bbox": [100, 10, 80, 80],
         "area": 6400, "iscrowd": 0},
        {"id": 3, "image_id": 42, "category_id": 1, "bbox": [0, 0, 10, 10],
         "area": 100, "iscrowd": 1},  # crowd: pycocotools iscrowd=None keeps it
        {"id": 4, "image_id": 7, "category_id": 18, "bbox": [5, 5, 50, 50],
         "area": 2500, "iscrowd": 0},
    ]
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    cap_annotations = [
        {"id": 100, "image_id": 42, "caption": "a person walking a dog"},
        {"id": 101, "image_id": 7, "caption": "a dog on grass"},
    ]
    with open(root / "annotations" / "captions_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": cap_annotations}, f)
    for im in images:
        Image.fromarray(
            np.random.RandomState(im["id"]).randint(
                0, 255, (im["height"], im["width"], 3), dtype=np.uint8
            )
        ).save(root / "val2017" / f"{im['id']:012d}.jpg")
    return root


class TestMiniCOCO:
    def test_api_matches_pycocotools_semantics(self, tmp_path):
        make_coco_fixture(tmp_path)
        c = _MiniCOCO(str(tmp_path / "annotations" / "instances_val2017.json"))
        assert sorted(c.getImgIds()) == [7, 42]
        assert c.loadImgs([42])[0]["width"] == 200
        # iscrowd=None keeps crowd annotations (pycocotools behavior)
        assert len(c.getAnnIds(imgIds=[42], iscrowd=None)) == 3
        assert len(c.getAnnIds(imgIds=[42], iscrowd=0)) == 2
        assert c.loadCats([18])[0]["name"] == "dog"


class TestCOCOValRealFormat:
    def test_loader_via_registry(self, tmp_path):
        from plangen_tpu.cli import load_config
        from plangen_tpu.data.registry import get_dataset

        make_coco_fixture(tmp_path)
        cfg = load_config("configs/toy_smoke.py", [f"coco_root={tmp_path}"])
        ds = get_dataset(cfg, "coco", is_test=True)
        assert len(ds) == 2
        s_by_id = {ds[i].image_id: ds[i] for i in range(2)}
        s = s_by_id["000000000042"]
        assert s.image.shape == (32, 32, 3)  # toy cfg janus_hw=32
        assert s.base_caption == "a person walking a dog"
        assert "<ref>person</ref>" in s.prompt and "<ref>dog</ref>" in s.prompt
        # xywh [10,20,60,70] at W=200,H=100 -> xyxy norm [.05,.2,.35,.9]
        assert "<box>[50, 200, 350, 900]</box>" in s.prompt
        assert (s.H, s.W) == (100, 200)

    def test_direct_resize_distorts_aspect(self, tmp_path):
        """The reference resizes val2017 images square without preserving
        aspect (data_coco.py); pixel shape must be (hw, hw, 3)."""
        make_coco_fixture(tmp_path)
        ds = COCOValDataset(
            str(tmp_path / "annotations" / "instances_val2017.json"),
            str(tmp_path / "annotations" / "captions_val2017.json"),
            str(tmp_path / "val2017"),
            image_hw=64,
        )
        assert ds[0].image.shape == (64, 64, 3)
        assert np.isfinite(ds[0].image).all()
