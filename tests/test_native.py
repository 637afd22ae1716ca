"""Native data-path library tests (numerics vs numpy reference + perf sanity)."""

import numpy as np
import pytest

from plangen_tpu.data.native import (
    native_available,
    resize_bilinear_batch_native,
    resize_bilinear_native,
    resize_to_model_input,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="libplangen_data.so not built (make -C native)"
)


def ref_bilinear(src_u8, dh, dw, normalize=True):
    """Half-pixel-center bilinear, edge-clamped (numpy reference)."""
    h, w, c = src_u8.shape
    src = src_u8.astype(np.float32)
    ys = (np.arange(dh) + 0.5) * (h / dh) - 0.5
    xs = (np.arange(dw) + 0.5) * (w / dw) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    ty = np.clip(ys - y0, 0, None)[:, None, None]
    tx = np.clip(xs - x0, 0, None)[None, :, None]
    top = src[y0][:, x0] * (1 - tx) + src[y0][:, x1] * tx
    bot = src[y1][:, x0] * (1 - tx) + src[y1][:, x1] * tx
    out = top * (1 - ty) + bot * ty
    if normalize:
        out = out * (2.0 / 255.0) - 1.0
    return out


@needs_native
class TestNativeResize:
    def test_matches_numpy_reference(self):
        rs = np.random.RandomState(0)
        img = rs.randint(0, 256, (100, 160, 3), dtype=np.uint8)
        out = resize_bilinear_native(img, (64, 48), normalize=True)
        ref = ref_bilinear(img, 64, 48, normalize=True)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_identity_resize(self):
        rs = np.random.RandomState(1)
        img = rs.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        out = resize_bilinear_native(img, (32, 32), normalize=False)
        np.testing.assert_allclose(out, img.astype(np.float32), atol=1e-4)

    def test_normalize_range(self):
        img = np.full((16, 16, 3), 255, dtype=np.uint8)
        out = resize_bilinear_native(img, (8, 8), normalize=True)
        np.testing.assert_allclose(out, 1.0, atol=1e-5)

    def test_batch(self):
        rs = np.random.RandomState(2)
        imgs = rs.randint(0, 256, (4, 50, 50, 3), dtype=np.uint8)
        out = resize_bilinear_batch_native(imgs, (24, 24))
        assert out.shape == (4, 24, 24, 3)
        single = resize_bilinear_native(imgs[2], (24, 24))
        np.testing.assert_allclose(out[2], single, atol=1e-5)

    def test_threads_consistent(self):
        rs = np.random.RandomState(3)
        img = rs.randint(0, 256, (200, 200, 3), dtype=np.uint8)
        a = resize_bilinear_native(img, (128, 128), threads=1)
        b = resize_bilinear_native(img, (128, 128), threads=8)
        np.testing.assert_array_equal(a, b)


class TestFallback:
    def test_resize_to_model_input_shape(self):
        img = np.zeros((60, 80, 3), dtype=np.uint8)
        out = resize_to_model_input(img, 32)
        assert out.shape == (32, 32, 3)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, -1.0, atol=1e-5)


class TestLoaderWiring:
    def test_resize_short_side_uses_native_when_built(self):
        """The train loaders' resize routes through the native lib when the
        .so is built (backend='auto'); box math is backend-independent."""
        import pytest

        from plangen_tpu.data.native import native_available
        from plangen_tpu.data.transforms import resize_short_side_center_crop

        if not native_available():
            pytest.skip("native lib not built")
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (100, 150, 3), dtype=np.uint8)
        boxes = np.array([[10.0, 20.0, 40.0, 30.0]])
        auto_img, auto_b = resize_short_side_center_crop(
            img, boxes, target=64, backend="auto"
        )
        nat_img, nat_b = resize_short_side_center_crop(
            img, boxes, target=64, backend="native"
        )
        pil_img, pil_b = resize_short_side_center_crop(
            img, boxes, target=64, backend="pil"
        )
        np.testing.assert_array_equal(auto_img, nat_img)
        np.testing.assert_array_equal(auto_b, nat_b)
        np.testing.assert_array_equal(nat_b, pil_b)  # boxes: pure math
        assert nat_img.shape == pil_img.shape == (64, 64, 3)
        assert nat_img.dtype == np.uint8
        # content agreement on a SMOOTH image: the conventions only differ
        # materially on high-frequency content (2-tap half-pixel bilinear
        # vs PIL's antialiased area filter — the former is the reference's
        # cv2/torch train-path convention)
        yy, xx = np.mgrid[0:100, 0:150]
        smooth = np.stack(
            [yy * 2 % 256, xx % 256, (yy + xx) % 256], -1
        ).astype(np.uint8)
        n2, _ = resize_short_side_center_crop(
            smooth, boxes, target=64, backend="native"
        )
        p2, _ = resize_short_side_center_crop(
            smooth, boxes, target=64, backend="pil"
        )
        diff = np.abs(n2.astype(int) - p2.astype(int)).mean()
        assert diff < 2.0, f"native vs PIL mean abs diff {diff} on smooth"
