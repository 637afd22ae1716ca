"""Data layer tests: transforms, loaders (toy + fixture-backed), collation,
registry, eval harness artifact layout."""

import json
import os

import numpy as np
import pytest

from plangen_tpu.config import (
    FlowConfig,
    GenerationConfig,
    PlanGenConfig,
    PlanGenModelConfig,
    TrainConfig,
    apply_overrides,
)
from plangen_tpu.data.collate import collate_flows
from plangen_tpu.data.loader import BatchLoader, CombinedLoader, infinite
from plangen_tpu.data.registry import ConcatDataset, get_dataset
from plangen_tpu.data.toy import ToyDataset
from plangen_tpu.data.transforms import (
    filter_boxes_canvas,
    pad_layout_slots,
    random_mirror,
    resize_short_side_center_crop,
    xywh_to_xyxy_norm,
)
from plangen_tpu.tasks.processor import PlanGenProcessor
from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

TINY = PlanGenModelConfig.tiny()


def tiny_cfg(**kw):
    cfg = PlanGenConfig(model=TINY, janus_hw=TINY.vision.image_size)
    return apply_overrides(cfg, kw) if kw else cfg


class TestTransforms:
    def test_resize_crop_square(self):
        img = np.zeros((100, 200, 3), dtype=np.uint8)
        boxes = np.array([[50.0, 25.0, 100.0, 50.0]])  # xywh px
        out, b = resize_short_side_center_crop(img, boxes, target=384)
        assert out.shape == (384, 384, 3)
        # scale = 384/100; left offset = (768-384)//2 = 192
        np.testing.assert_allclose(b[0], [50 * 3.84 - 192, 96, 384, 192], atol=1e-3)

    def test_filter_boxes(self):
        boxes = np.array(
            [
                [0, 0, 100, 100],  # keep
                [0, 0, 10, 10],  # area 100 < 200 -> drop
                [381, 0, 100, 100],  # x>380 -> drop
                [300, 300, 200, 200],  # clipped to 84x84 -> keep
            ],
            dtype=np.float32,
        )
        classes = ["a", "b", "c", "d"]
        fb, fc = filter_boxes_canvas(boxes, classes)
        assert fc == ["a", "d"]
        np.testing.assert_allclose(fb[1], [300, 300, 84, 84])

    def test_pad_slots(self):
        boxes, classes, valid = pad_layout_slots(
            np.array([[0.1, 0.1, 0.5, 0.5]]), ["cat"]
        )
        assert boxes.shape == (10, 4)
        assert classes[0] == "cat" and classes[1] == ""
        np.testing.assert_array_equal(valid, [1] + [0] * 9)

    def test_zero_box_invalidated(self):
        _, _, valid = pad_layout_slots(
            np.array([[0, 0, 0, 0], [0.1, 0.1, 0.2, 0.2]]), ["x", "y"]
        )
        np.testing.assert_array_equal(valid[:2], [0, 1])

    def test_random_mirror(self):
        rng = np.random.RandomState(0)
        img = np.arange(12, dtype=np.float32).reshape(1, 4, 3)
        boxes = np.array([[0.1, 0.0, 0.4, 1.0]])
        for _ in range(10):
            im2, b2 = random_mirror(img, boxes, rng)
            if not np.array_equal(im2, img):
                np.testing.assert_allclose(b2[0], [0.6, 0.0, 0.9, 1.0])
                return
        pytest.fail("mirror never triggered")


class TestLoaders:
    def test_batch_loader_epochs_differ(self):
        ds = ToyDataset(size=10, image_hw=16)
        bl = BatchLoader(ds, 4, shuffle=True, seed=0)
        assert len(bl) == 2
        e1 = [s.image_id for batch in bl for s in batch]
        e2 = [s.image_id for batch in bl for s in batch]
        assert set(e1) != set() and e1 != e2  # reshuffled across epochs

    def test_combined_min_size(self):
        a = BatchLoader(ToyDataset(size=8, image_hw=16), 2)
        b = BatchLoader(ToyDataset(size=4, image_hw=16), 2)
        cl = CombinedLoader({0: a, 1: b})
        assert len(cl) == 2
        steps = list(cl)
        assert len(steps) == 2
        assert set(steps[0].keys()) == {0, 1}

    def test_infinite(self):
        a = BatchLoader(ToyDataset(size=4, image_hw=16), 2)
        it = infinite(CombinedLoader({0: a}))
        for _ in range(5):
            next(it)

    def test_worker_pool_same_batches(self):
        """workers>0 must yield the same batches in the same order."""
        ids0 = [
            [s.image_id for s in b]
            for b in BatchLoader(ToyDataset(size=10, image_hw=16), 3, seed=1)
        ]
        ids4 = [
            [s.image_id for s in b]
            for b in BatchLoader(
                ToyDataset(size=10, image_hw=16), 3, seed=1, workers=4
            )
        ]
        assert ids0 == ids4

    def test_prefetch_same_batches(self):
        from plangen_tpu.data.loader import PrefetchLoader

        def run(wrap):
            bl = BatchLoader(ToyDataset(size=12, image_hw=16), 3, seed=2)
            src = PrefetchLoader(bl, depth=2) if wrap else bl
            return [[s.image_id for s in b] for b in src]

        assert run(False) == run(True)

    def test_prefetch_propagates_exceptions(self):
        from plangen_tpu.data.loader import PrefetchLoader

        class Exploding:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i >= 2:
                    raise ValueError("boom")
                return i

        bl = BatchLoader(Exploding(), 1, shuffle=False)
        with pytest.raises(ValueError, match="boom"):
            list(PrefetchLoader(bl, depth=2))

    def test_sharded_loaders_partition_the_epoch(self):
        """num_shards/shard_id (the DistributedSampler role): disjoint
        strides of the SAME shuffled order, equal batch counts."""
        def ids(shard):
            bl = BatchLoader(
                ToyDataset(size=11, image_hw=16), 2, seed=3,
                num_shards=2, shard_id=shard,
            )
            assert len(bl) == 2  # 11 // 2 shards = 5 -> 2 batches of 2
            return [s.image_id for b in bl for s in b]

        a, b = ids(0), ids(1)
        assert not (set(a) & set(b))
        assert len(a) == len(b) == 4

    def test_prefetch_reiterable_and_infinite(self):
        from plangen_tpu.data.loader import PrefetchLoader

        pl = PrefetchLoader(
            BatchLoader(ToyDataset(size=4, image_hw=16), 2), depth=1
        )
        assert len(list(pl)) == 2
        assert len(list(pl)) == 2  # fresh producer per epoch
        it = infinite(pl)
        for _ in range(5):
            next(it)

    def test_concat(self):
        c = ConcatDataset([ToyDataset(size=3, image_hw=16), ToyDataset(size=2, image_hw=16)])
        assert len(c) == 5
        assert c[4].image_id == "1"


class TestCollate:
    def test_all_flows(self):
        tok = ByteFallbackTokenizer(vocab_size=TINY.llama.vocab_size)
        proc = PlanGenProcessor(tok, image_tokens=TINY.image_seq_len)
        hw = TINY.vision.image_size
        ds = ToyDataset(size=4, image_hw=hw)
        samples = [ds[i] for i in range(2)]
        out = collate_flows(
            {0: samples, 1: samples, 2: samples},
            {0: "uni", 1: "mmu", 2: "plan"},
            proc,
        )
        B = 2
        n = TINY.image_seq_len
        assert out[0]["attn_mask"].shape[1] == out[0]["input_ids"].shape[1] + n
        assert out[0]["images"].shape == (B, hw, hw, 3)
        assert out[1]["images_seq_mask"].sum() == B * n
        assert out[2]["attn_mask"].shape == out[2]["input_ids"].shape


class TestRegistry:
    def test_toy(self):
        ds = get_dataset(tiny_cfg(), "toy")
        assert len(ds) == 100

    def test_list_concat(self):
        ds = get_dataset(tiny_cfg(), ["toy", "toy"])
        assert len(ds) == 200

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_dataset(tiny_cfg(), "nope")

    def test_missing_path_raises_informative(self):
        with pytest.raises(FileNotFoundError):
            get_dataset(tiny_cfg(), "creati")


class TestFixtureDatasets:
    def test_edit_and_rm_coco(self, tmp_path):
        from PIL import Image

        root = tmp_path / "coco200"
        for sub in ["image", "mask", "box", "box_new"]:
            os.makedirs(root / sub)
        for i in range(2):
            Image.new("RGB", (64, 64), (100, 50, 25)).save(root / "image" / f"{i}.png")
            m = np.zeros((24, 24), dtype=np.uint8)
            m[6:12, 6:12] = 255
            Image.fromarray(m).save(root / "mask" / f"{i}.png")
            with open(root / "box" / f"{i}.json", "w") as f:
                json.dump({"obj_bbox": [0.25, 0.25, 0.5, 0.5], "obj_class": "cat"}, f)
            with open(root / "box_new" / f"{i}.json", "w") as f:
                json.dump({"obj_bbox": [0.5, 0.5, 0.9, 0.9], "obj_class": "cat"}, f)

        from plangen_tpu.data.coco import EditCoco200, RmCoco200

        edit = EditCoco200(str(root), pad_edit_box=0.1)
        s = edit[0]
        assert s.edit_region.sum() > 0
        assert "<ref>cat</ref>" in s.prompt

        rm = RmCoco200(str(root))
        s = rm[1]
        assert s.prompt == ""  # empty layout -> bare (empty) caption
        assert "disharmonious" in s.neg_gt_grounding
        assert s.edit_region.sum() == 36  # 6x6 mask block

    def test_nsr1k(self, tmp_path):
        root = tmp_path / "nsr"
        os.makedirs(root / "counting")
        os.makedirs(root / "spatial")
        counting = [
            {
                "prompt": "two cats",
                "object_list": [["cat", [0.1, 0.1, 0.2, 0.3]], ["cat", [0.5, 0.5, 0.2, 0.3]]],
            }
        ]
        spatial = [
            {"prompt": "a left of b", "obj1": ["a", [0.1, 0.1, 0.2, 0.2]], "obj2": ["b", [0.6, 0.1, 0.2, 0.2]]}
        ]
        with open(root / "counting" / "counting.train.json", "w") as f:
            json.dump(counting, f)
        with open(root / "spatial" / "spatial.train.json", "w") as f:
            json.dump(spatial, f)

        from plangen_tpu.data.layoutgpt import NSR1KLayoutDataset

        ds = NSR1KLayoutDataset(str(root))
        assert len(ds) == 1 + 10  # spatial oversampled 10x
        s = ds[0]
        # xywh -> xyxy
        assert "<box>[100, 100, 300, 400]</box>" in s.prompt
        assert s.image is None


class TestEvalHarness:
    def test_validation_artifacts(self, tmp_path):
        import jax
        import jax.numpy as jnp

        cfg = tiny_cfg(**{
            "generation.max_new_text_tokens": 4,
        })
        from plangen_tpu.tasks.eval import run_validation

        out = run_validation(
            cfg,
            task_type="uni",
            data_name="toy",
            max_len=1,
            output_dir=str(tmp_path),
            batch_size=2,
        )
        assert len(out) == 1
        base = tmp_path / "toy_uni_1"
        layout = json.load(open(base / "0_batch" / "0_layout.json"))
        assert len(layout["pr_grounding"]) == 2
        assert (base / "0" / "pr_image" / "0.png").exists()
        assert (base / "0" / "gt_image" / "1.png").exists()
        assert (base / "0_batch" / "0.png").exists()


class TestIoUCrop:
    def test_crop_keeps_centered_boxes(self):
        from plangen_tpu.data.transforms import iou_sample_crop

        rng = np.random.RandomState(0)
        img = np.zeros((100, 200, 3), dtype=np.uint8)
        boxes = np.array([[90.0, 40.0, 110.0, 60.0]])  # centered-ish
        out = iou_sample_crop(img, boxes, ["obj"], rng)
        if out is None:
            pytest.skip("no valid crop found (random)")
        cimg, cboxes, clabels = out
        assert cimg.shape[0] == cimg.shape[1] == 100  # square side=min(H,W)
        assert clabels == ["obj"]
        assert (cboxes >= 0).all() and (cboxes[:, 2:] <= 100).all()

    def test_empty_boxes_returns_none(self):
        from plangen_tpu.data.transforms import iou_sample_crop

        rng = np.random.RandomState(0)
        img = np.zeros((64, 64, 3), dtype=np.uint8)
        assert iou_sample_crop(img, np.zeros((0, 4)), [], rng) is None


class TestRemovalEvalE2E:
    def test_rm_eval_with_fixtures(self, tmp_path):
        """Full removal-mode eval: fixture coco_200 dir -> teacher-forced
        regeneration with clutter negative grounding -> artifacts."""
        from PIL import Image

        hw = TINY.vision.image_size
        root = tmp_path / "coco200"
        for sub in ["image", "mask", "box", "box_new"]:
            os.makedirs(root / sub)
        for i in range(2):
            Image.new("RGB", (hw, hw), (90, 120, 60)).save(root / "image" / f"{i}.png")
            m = np.zeros((24, 24), dtype=np.uint8)
            m[8:16, 8:16] = 255
            Image.fromarray(m).save(root / "mask" / f"{i}.png")
            with open(root / "box" / f"{i}.json", "w") as f:
                json.dump({"obj_bbox": [0.3, 0.3, 0.7, 0.7], "obj_class": "cat"}, f)
            with open(root / "box_new" / f"{i}.json", "w") as f:
                json.dump({"obj_bbox": [0.3, 0.3, 0.7, 0.7], "obj_class": "cat"}, f)

        cfg = tiny_cfg(**{
            "coco_200_path": str(root),
            "generation.use_teacher_forcing": True,
            "generation.use_neg_box": True,
            "generation.max_new_text_tokens": 4,
        })
        from plangen_tpu.tasks.eval import run_validation

        out = run_validation(
            cfg, task_type="rm", data_name="rm_coco", max_len=1,
            output_dir=str(tmp_path / "out"), batch_size=2,
        )
        assert len(out) == 1
        assert out[0]["pr_image"].shape == (2, hw, hw, 3)
        assert (tmp_path / "out" / "rm_coco_rm_1" / "0" / "pr_image" / "0.png").exists()


class TestLoaderEdges:
    def test_drop_last_false(self):
        ds = ToyDataset(size=5, image_hw=16)
        bl = BatchLoader(ds, 2, drop_last=False, shuffle=False)
        batches = list(bl)
        assert [len(b) for b in batches] == [2, 2, 1]

    def test_concat_index_error(self):
        c = ConcatDataset([ToyDataset(size=2, image_hw=16)])
        with pytest.raises(IndexError):
            c[5]

    def test_io_helpers(self, tmp_path):
        from plangen_tpu.utils.io import load_json, load_jsonl, save_json, save_jsonl

        p = tmp_path / "x.json"
        save_json(str(p), {"a": 1})
        assert load_json(str(p)) == {"a": 1}
        p2 = tmp_path / "x.jsonl"
        save_jsonl(str(p2), [{"b": 2}, {"c": 3}])
        assert load_jsonl(str(p2)) == [{"b": 2}, {"c": 3}]
