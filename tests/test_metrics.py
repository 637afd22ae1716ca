"""Layout metric tests."""

import numpy as np

from plangen_tpu.tasks.metrics import (
    aggregate_layout_metrics,
    box_iou,
    greedy_match,
    layout_metrics,
)


class TestMetrics:
    def test_iou_identity(self):
        b = (0.1, 0.1, 0.5, 0.5)
        assert abs(box_iou(b, b) - 1.0) < 1e-9

    def test_iou_disjoint(self):
        assert box_iou((0, 0, 0.2, 0.2), (0.5, 0.5, 0.9, 0.9)) == 0.0

    def test_iou_half(self):
        # [0,0,1,0.5] vs [0,0,1,1]: inter 0.5, union 1.0
        assert abs(box_iou((0, 0, 1, 0.5), (0, 0, 1, 1)) - 0.5) < 1e-9

    def test_greedy_match_prefers_best(self):
        pred = [(0, 0, 0.5, 0.5), (0.5, 0.5, 1, 1)]
        gt = [(0.5, 0.5, 1, 1), (0, 0, 0.5, 0.5)]
        m = greedy_match(pred, gt)
        assert sorted((pi, gi) for pi, gi, _ in m) == [(0, 1), (1, 0)]

    def test_layout_metrics_perfect(self):
        boxes = [(0.1, 0.1, 0.4, 0.4), (0.5, 0.5, 0.9, 0.9)]
        m = layout_metrics(boxes, boxes)
        assert m["miou"] == 1.0 and m["precision"] == 1.0 and m["recall"] == 1.0
        assert m["count_match"] == 1.0

    def test_layout_metrics_miss(self):
        m = layout_metrics([(0, 0, 0.1, 0.1)], [(0.5, 0.5, 0.9, 0.9)])
        assert m["miou"] == 0.0 and m["recall"] == 0.0

    def test_empty_pred(self):
        m = layout_metrics([], [(0, 0, 1, 1)])
        assert m["precision"] == 0.0 and m["recall"] == 0.0
        assert m["count_match"] == 0.0

    def test_aggregate(self):
        agg = aggregate_layout_metrics(
            [{"miou": 1.0}, {"miou": 0.0}]
        )
        assert agg["miou"] == 0.5


class TestVisualize:
    def test_draw_layout(self):
        from plangen_tpu.utils.visualize import draw_layout

        img = np.zeros((64, 64, 3), dtype=np.uint8)
        out = draw_layout(img, [(0.1, 0.1, 0.6, 0.6)], ["a cat"])
        assert out.shape == (64, 64, 3)
        assert out.sum() > 0  # something was drawn

    def test_draw_layout_float_input(self):
        from plangen_tpu.utils.visualize import draw_layout

        img = np.zeros((32, 32, 3), dtype=np.float32) - 1.0  # [-1,1] black
        out = draw_layout(img, [(0, 0, 1, 1)], None)
        assert out.dtype == np.uint8

    def test_save_image_grid(self, tmp_path):
        from plangen_tpu.utils.visualize import save_image_grid

        imgs = [np.full((8, 8, 3), c, dtype=np.uint8) for c in [0, 128, 255]]
        path = tmp_path / "grid.png"
        save_image_grid(imgs, str(path), cols=2)
        from PIL import Image

        g = np.asarray(Image.open(path))
        assert g.shape == (16, 16, 3)  # 2x2 grid of 8x8 (one cell padding)
