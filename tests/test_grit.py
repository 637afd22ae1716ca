"""Fixture-backed tests for GRiT/7k/edit-spec loaders + Janus preprocess."""

import json
import os

import numpy as np
import pytest

from plangen_tpu.data.grit import (
    EditSpecDataset,
    Grit7kDataset,
    GritSceneGraphDataset,
    _parse_center_grounding,
)
from plangen_tpu.data.preprocess import janus_image_preprocess


class TestGrit(object):
    def test_scene_graph_loader(self, tmp_path):
        from PIL import Image

        img_path = tmp_path / "img0.jpg"
        Image.new("RGB", (200, 100), (128, 64, 32)).save(img_path)
        caption = "a red cat sits near a blue dog"
        grit = {
            "0": {
                "f_path": str(img_path),
                "width": 200,
                "height": 100,
                "caption": caption,
                "url": "",
                "ref_exps": [
                    # phrase [2, 11) = "red cat s"; box 30% x 50%
                    [2, 11, 0.1, 0.2, 0.4, 0.7, 0.9],
                    # too small (under 5% of a side) -> dropped
                    [14, 22, 0.5, 0.5, 0.52, 0.52, 0.8],
                ],
            }
        }
        p = tmp_path / "grit.json"
        with open(p, "w") as f:
            json.dump(grit, f)
        ds = GritSceneGraphDataset(str(p), image_hw=64)
        assert len(ds) == 1
        s = ds[0]
        assert s.image.shape == (64, 64, 3)
        assert "red cat" in s.prompt
        assert s.prompt.count("<ref>") == 1  # small box dropped

    def _write_grit_fixture(self, tmp_path, img_wh=(200, 100)):
        from PIL import Image

        img_path = tmp_path / "img0.jpg"
        Image.new("RGB", img_wh, (128, 64, 32)).save(img_path)
        caption = "a red cat sits near a blue dog"
        grit = {
            "0": {
                "f_path": str(img_path),
                "width": img_wh[0],
                "height": img_wh[1],
                "caption": caption,
                "url": "",
                "ref_exps": [
                    [2, 11, 0.1, 0.2, 0.4, 0.7, 0.9],
                    [14, 22, 0.55, 0.1, 0.95, 0.9, 0.8],
                ],
            }
        }
        p = tmp_path / "grit.json"
        with open(p, "w") as f:
            json.dump(grit, f)
        return str(p)

    def test_empty_prompt_dropout_distribution(self, tmp_path):
        """proportion_empty_prompts (debug_grit.py:278): the caption is
        dropped at roughly the configured rate, boxes stay."""
        p = self._write_grit_fixture(tmp_path)
        ds = GritSceneGraphDataset(
            p, image_hw=64, proportion_empty_prompts=0.5, seed=7
        )
        empty = 0
        n = 200
        for _ in range(n):
            s = ds[0]
            assert s.prompt.count("<ref>") == 2  # grounding survives dropout
            if s.base_caption == "":
                empty += 1
                # serialized without any caption text before the grounding
                assert s.prompt.startswith("<grounding>")
        assert 60 < empty < 140  # ~N(100, 7) at p=0.5

        ds0 = GritSceneGraphDataset(p, image_hw=64, proportion_empty_prompts=0.0)
        assert all(ds0[0].base_caption != "" for _ in range(20))

    def test_min_iou_crop_changes_layout(self, tmp_path):
        """use_MinIoURandomCrop (debug_grit.py:56,445): crops are square at
        image_hw, boxes stay normalized, and crop positions vary."""
        p = self._write_grit_fixture(tmp_path, img_wh=(300, 100))
        ds = GritSceneGraphDataset(p, image_hw=64, use_min_iou_crop=True, seed=3)
        seen_boxes = set()
        for _ in range(30):
            s = ds[0]
            assert s.image.shape == (64, 64, 3)
            assert 1 <= s.prompt.count("<ref>") <= 2  # crop may drop a box
            seen_boxes.add(s.prompt)
        # random crops must actually move the boxes between draws
        assert len(seen_boxes) > 3

        ds_c = GritSceneGraphDataset(p, image_hw=64, use_min_iou_crop=False)
        assert ds_c[0].prompt == ds_c[0].prompt  # deterministic without crop

    def test_7k_loader(self, tmp_path):
        rows = [
            [0, "two cats", 0, {"H": 100, "W": 200}, 0,
             [["cat", [10, 20, 50, 60]], ["cat", [60, 80, 90, 100]]]],
        ]
        p = tmp_path / "7k.json"
        with open(p, "w") as f:
            json.dump(rows, f)
        ds = Grit7kDataset(str(p))
        s = ds[0]
        assert s.prompt.count("<ref>cat</ref>") == 2
        # reference normalization: x/H=100, y/W=200 (verbatim parity)
        assert "<box>[100, 100, 500, 300]</box>" in s.prompt

    def test_center_grounding_parse(self):
        text = "<ref>a cat</ref><box><h500>,<w500>,<h200>,<w400></box>"
        classes, boxes = _parse_center_grounding(text)
        assert classes == ["a cat"]
        # (cx, cy, h, w) = (500, 500, 200, 400) -> x1=300 y1=400 x2=700 y2=600
        np.testing.assert_allclose(boxes[0], [0.3, 0.4, 0.7, 0.6], atol=1e-6)

    def test_edit_spec(self, tmp_path):
        from PIL import Image

        img = tmp_path / "e.png"
        Image.new("RGB", (64, 64)).save(img)
        spec = [
            {
                "base_caption": "a room",
                "new_grounding_prompt": "<ref>chair</ref><box>500,500,200,200</box>",
                "edited_grounding_prompt": "<ref>chair</ref><box>500,500,400,400</box>",
                "neg_grounding_prompt": "<ref>clutter</ref><box>500,500,100,100</box>",
                "image_path": str(img),
            }
        ]
        p = tmp_path / "edit.json"
        with open(p, "w") as f:
            json.dump(spec, f)
        ds = EditSpecDataset(str(p), pad_edit_box=0.1)
        s = ds[0]
        assert "chair" in s.prompt
        assert "clutter" in s.neg_gt_grounding
        assert s.edit_region.sum() > 0


class TestJanusPreprocess:
    def test_expand2square(self):
        img = np.full((100, 200, 3), 128, dtype=np.uint8)
        out = janus_image_preprocess(img, 384)
        assert out.shape == (384, 384, 3)
        # top band is CLIP-mean padding -> normalized ~0
        assert abs(out[0, 0]).max() < 0.05
