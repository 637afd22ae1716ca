"""Format-true LayoutSAM fixtures: the loaders run against the REAL HF
dataset schemas (not hand-rolled dicts).

Eval rows (HuiZhang0812/LayoutSAM-eval, read by the reference testset branch
sam_traindata.py:86-99): image, height, width, global_caption,
bbox_list (stringified pixel xyxy), region_captions (str),
detail_region_captions (str), file_name.

Raw train rows (sam_traindata.py:41-72 update_item): image_path +
metadata{bbox_info: [{bbox, description, detail_description}],
global_caption, image_info{height, width, file_name}} with images in a
separate SAM dump keyed by 'xx/<dirname>/<file>'.
"""

import os

import numpy as np
import pytest

from plangen_tpu.data.layoutsam import LayoutSAMEval, LayoutSAMTrain


def make_eval_fixture(root, n=3):
    import datasets
    from PIL import Image

    os.makedirs(root / "data", exist_ok=True)
    imgs = [
        Image.fromarray(
            np.random.RandomState(i).randint(0, 255, (100, 200, 3), dtype=np.uint8)
        )
        for i in range(n)
    ]
    d = {
        "image": imgs,
        "height": [100] * n,
        "width": [200] * n,
        "global_caption": [f"a busy scene number {i}" for i in range(n)],
        "bbox_list": [str([[10, 20, 80, 90], [100, 10, 190, 95]])] * n,
        "region_captions": [str(["a cat", "a dog"])] * n,
        "detail_region_captions": [str(["a fluffy cat", None])] * n,
        "file_name": [f"img{i}.jpg" for i in range(n)],
    }
    ds = datasets.Dataset.from_dict(d).cast_column("image", datasets.Image())
    ds.to_parquet(str(root / "data" / "test-00000-of-00001.parquet"))
    return str(root)


def make_raw_train_fixture(root, n=2):
    import datasets
    from PIL import Image

    sam_dump = root / "sam_images"
    (sam_dump / "12").mkdir(parents=True, exist_ok=True)
    rows = {"image_path": [], "metadata": []}
    for i in range(n):
        fn = f"sa_{i}.jpg"
        Image.fromarray(
            np.random.RandomState(i).randint(0, 255, (120, 160, 3), dtype=np.uint8)
        ).save(sam_dump / "12" / fn)
        rows["image_path"].append(f"xx/000012/{fn}")
        rows["metadata"].append(
            {
                "global_caption": f"raw scene {i}",
                "bbox_info": [
                    {
                        "bbox": [10.0, 10.0, 150.0, 110.0],
                        "description": "a table",
                        "detail_description": "a long wooden table",
                    },
                    {
                        "bbox": [20.0, 30.0, 90.0, 100.0],
                        "description": "a chair",
                        "detail_description": "a red chair",
                    },
                ],
                "image_info": {"height": 120, "width": 160, "file_name": fn},
            }
        )
    ds_dir = root / "layoutsam"
    (ds_dir / "data").mkdir(parents=True, exist_ok=True)
    datasets.Dataset.from_dict(rows).to_parquet(
        str(ds_dir / "data" / "train-00000-of-00001.parquet")
    )
    return str(ds_dir), str(sam_dump)


class TestLayoutSAMEvalRealFormat:
    @pytest.fixture(scope="class")
    def path(self, tmp_path_factory):
        return make_eval_fixture(tmp_path_factory.mktemp("lse"))

    def test_loads_real_columns(self, path):
        ds = LayoutSAMEval(path, image_hw=64)
        assert len(ds) == 3
        s = ds[0]
        assert s.image.shape == (64, 64, 3)
        # null detail caption -> fall back to the short captions
        assert "<ref>a cat</ref>" in s.prompt
        assert "a busy scene number 0" in s.prompt
        # boxes normalized by original W=200 / H=100, round(.,3) -> 0-1000 ints
        assert "<box>[50, 200, 400, 900]</box>" in s.prompt
        assert s.image_id == "img0.jpg"
        assert (s.H, s.W) == (100, 200)

    def test_limit(self, path):
        assert len(LayoutSAMEval(path, image_hw=64, limit=2)) == 2


class TestLayoutSAMTrainRawFormat:
    def test_raw_metadata_rows(self, tmp_path):
        ds_dir, sam_dump = make_raw_train_fixture(tmp_path)
        ds = LayoutSAMTrain(ds_dir, image_hw=64, image_root=sam_dump)
        assert len(ds) == 2
        s = ds[0]
        assert s.image.shape == (64, 64, 3)
        assert s.base_caption == "raw scene 0"
        assert "wooden table" in s.prompt or "red chair" in s.prompt

    def test_flat_rows_still_work(self, tmp_path):
        import datasets
        from PIL import Image

        (tmp_path / "flat" / "data").mkdir(parents=True)
        img = Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (100, 200, 3), dtype=np.uint8)
        )
        d = {
            "image": [img],
            "height": [100],
            "width": [200],
            "global_caption": ["flat scene"],
            "bbox_list": [str([[10, 20, 180, 90]])],
            "region_captions": [str(["a boat"])],
            "detail_region_captions": [str(["a small boat"])],
        }
        datasets.Dataset.from_dict(d).cast_column("image", datasets.Image()).to_parquet(
            str(tmp_path / "flat" / "data" / "train-00000-of-00001.parquet")
        )
        ds = LayoutSAMTrain(str(tmp_path / "flat"), image_hw=64)
        s = ds[0]
        assert "small boat" in s.prompt


class TestEvalPipelineOnCreati:
    def test_run_validation_uni(self, tmp_path):
        """eval --task uni --data creati end to end on the real-format
        fixture: artifact tree + generated images."""
        from plangen_tpu.cli import load_config
        from plangen_tpu.tasks.eval import run_validation

        path = make_eval_fixture(tmp_path / "lse")
        cfg = load_config("configs/toy_smoke.py", [
            f"layoutsam_eval_path={path}",
            "generation.max_new_text_tokens=4",
        ])
        out = tmp_path / "eval_out"
        results = run_validation(
            cfg, task_type="uni", data_name="creati", max_len=1,
            output_dir=str(out), batch_size=2,
        )
        assert len(results) >= 1
        base = out / "creati_uni_1" / "0"
        assert (base / "pr_image").exists()
        import os as _os

        assert len(_os.listdir(base / "pr_image")) >= 1
