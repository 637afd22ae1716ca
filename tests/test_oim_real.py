"""OpenImages loader against real-format fixtures.

Replicates the on-disk formats the reference consumes (data_oim.py:38-157):
  * OID v6 bbox CSV with the real header row and normalized corner columns,
  * the headerless class-descriptions-boxable.csv (two columns: MID, name) —
    pandas' default header=0 consumes the first data row, exactly as the
    reference's read_csv does, so the fixture includes a sacrificial row,
  * per-image caption jsonl where line 0 is a JSON string
    (funcs.load_jsonl()[0] semantics).
"""

import json

import numpy as np

from plangen_tpu.data.oim import OpenImagesDataset

OID_HEADER = (
    "ImageID,Source,LabelName,Confidence,XMin,XMax,YMin,YMax,"
    "IsOccluded,IsTruncated,IsGroupOf,IsDepiction,IsInside"
)


def make_oim_fixture(root):
    from PIL import Image

    (root / "anno").mkdir(parents=True)
    (root / "train").mkdir()
    (root / "caps").mkdir()
    rows = [
        OID_HEADER,
        "img0001,xclick,/m/01g317,1,0.1,0.5,0.2,0.9,0,0,0,0,0",
        "img0001,xclick,/m/0bt9lr,1,0.55,0.95,0.1,0.5,0,0,0,0,0",
        "img0002,xclick,/m/0bt9lr,1,0.2,0.8,0.2,0.8,0,0,0,0,0",
    ]
    (root / "anno" / "oidv6-train-annotations-bbox.csv").write_text(
        "\n".join(rows) + "\n"
    )
    # headerless, like the official file. The reference reads it with
    # pandas' DEFAULT header (data_oim.py:63), silently losing the first
    # class ("Tortoise") and thereby dropping every image that contains it
    # — a silent-data-loss defect we deliberately do NOT replicate
    # (oim.py reads header=None; see SURVEY §7 "defects not to replicate")
    (root / "class-descriptions-boxable.csv").write_text(
        "/m/011k07,Tortoise\n/m/01g317,Person\n/m/0bt9lr,Dog\n"
    )
    for img_id, wh in [("img0001", (200, 100)), ("img0002", (100, 100))]:
        Image.fromarray(
            np.random.RandomState(hash(img_id) % 99).randint(
                0, 255, (wh[1], wh[0], 3), dtype=np.uint8
            )
        ).save(root / "train" / f"{img_id}.jpg")
    with open(root / "caps" / "img0001.jsonl", "w") as f:
        f.write(json.dumps("a person and a dog outside") + "\n")
    return root


class TestOIMRealFormat:
    def test_loads_caption_jsonl_and_boxes(self, tmp_path):
        root = make_oim_fixture(tmp_path)
        ds = OpenImagesDataset(
            str(root),
            str(root / "class-descriptions-boxable.csv"),
            split="train",
            caption_dir=str(root / "caps"),
            image_hw=64,
        )
        assert len(ds) == 2
        s = ds[0]
        assert s.image.shape == (64, 64, 3)
        assert s.base_caption == "a person and a dog outside"
        assert "<ref>person</ref>" in s.prompt
        assert "<ref>dog</ref>" in s.prompt
        # larger-area box (person, 0.4x0.7 of 200x100) serialized first
        assert s.prompt.index("person") < s.prompt.index("dog")

    def test_missing_caption_is_empty(self, tmp_path):
        root = make_oim_fixture(tmp_path)
        ds = OpenImagesDataset(
            str(root),
            str(root / "class-descriptions-boxable.csv"),
            split="train",
            caption_dir=str(root / "caps"),
            image_hw=64,
        )
        s = ds[1]  # img0002 has no caption jsonl
        assert s.base_caption == ""
        assert s.prompt.startswith("<grounding>")


def test_first_class_row_not_eaten_by_header(tmp_path):
    """The official CSV is headerless; the reference's default read_csv
    loses row 1 and silently drops every image containing that class. We
    keep it (header=None) — deliberate divergence from a silent-data-loss
    reference defect."""
    root = make_oim_fixture(tmp_path)
    ds = OpenImagesDataset(
        str(root), str(root / "class-descriptions-boxable.csv"),
        split="train", image_hw=64,
    )
    assert ds.class_map["/m/011k07"] == "Tortoise"
