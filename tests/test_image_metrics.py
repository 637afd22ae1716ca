"""Image-quality metrics: FID/KID math + SigLIP featurizer + eval wiring.

The math is validated against closed forms and scipy.linalg.sqrtm; the
featurizer against shape/padding/dtype invariants on the tiny tower; the
eval integration end-to-end on the toy dataset (train.val_image_metrics).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import vlm
from plangen_tpu.tasks.image_metrics import (
    SigLIPFeaturizer,
    feature_stats,
    fid_kid_from_features,
    frechet_distance,
    kid_poly,
)

TINY = PlanGenModelConfig.tiny()


class TestFrechet:
    def test_identical_stats_zero(self):
        rng = np.random.default_rng(0)
        f = rng.normal(size=(64, 8))
        mu, s = feature_stats(f)
        assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-8)

    def test_equal_covariance_reduces_to_mean_shift(self):
        # FID = ||mu1 - mu2||^2 exactly when sigma1 == sigma2
        rng = np.random.default_rng(1)
        a = rng.normal(size=(200, 6))
        mu, s = feature_stats(a)
        mu2 = mu + 3.0
        assert frechet_distance(mu, s, mu2, s) == pytest.approx(
            float(((mu - mu2) ** 2).sum()), rel=1e-9
        )

    def test_diagonal_closed_form(self):
        # diagonal gaussians: FID = sum (sqrt(v1) - sqrt(v2))^2 + ||dmu||^2
        v1 = np.array([1.0, 4.0, 9.0])
        v2 = np.array([4.0, 1.0, 16.0])
        mu1 = np.zeros(3)
        mu2 = np.array([1.0, 0.0, 2.0])
        want = float(((np.sqrt(v1) - np.sqrt(v2)) ** 2).sum() + 5.0)
        got = frechet_distance(mu1, np.diag(v1), mu2, np.diag(v2))
        assert got == pytest.approx(want, rel=1e-9)

    def test_matches_scipy_sqrtm(self):
        scipy_linalg = pytest.importorskip("scipy.linalg")
        rng = np.random.default_rng(2)
        for _ in range(3):
            a = rng.normal(size=(10, 6))
            b = rng.normal(size=(12, 6))
            mu1, s1 = feature_stats(a)
            mu2, s2 = feature_stats(b)
            covmean = scipy_linalg.sqrtm(s1 @ s2)
            ref = float(
                ((mu1 - mu2) ** 2).sum()
                + np.trace(s1)
                + np.trace(s2)
                - 2.0 * np.trace(covmean).real
            )
            assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(
                max(0.0, ref), rel=1e-6, abs=1e-8
            )

    def test_needs_two_samples(self):
        with pytest.raises(ValueError):
            feature_stats(np.ones((1, 4)))


class TestKID:
    def test_same_distribution_near_zero(self):
        rng = np.random.default_rng(3)
        f1 = rng.normal(size=(300, 8))
        f2 = rng.normal(size=(300, 8))
        mean, _ = kid_poly(f1, f2, n_subsets=50, subset_size=100)
        # unbiased estimator: expectation 0 for identical distributions
        assert abs(mean) < 0.05

    def test_shifted_distribution_positive(self):
        rng = np.random.default_rng(4)
        f1 = rng.normal(size=(200, 8))
        f2 = rng.normal(size=(200, 8)) + 2.0
        near, _ = kid_poly(f1, f1.copy(), n_subsets=20, subset_size=64)
        far, _ = kid_poly(f1, f2, n_subsets=20, subset_size=64)
        assert far > near + 1.0  # poly kernel: mean shift of 2 is huge

    def test_deterministic_for_seed(self):
        rng = np.random.default_rng(5)
        f1 = rng.normal(size=(50, 4))
        f2 = rng.normal(size=(60, 4))
        assert kid_poly(f1, f2, seed=7) == kid_poly(f1, f2, seed=7)
        assert kid_poly(f1, f2, seed=7) != kid_poly(f1, f2, seed=8)


@pytest.fixture(scope="module")
def tiny_params():
    return vlm.init(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)


def _images(n, seed=0):
    size = TINY.vision.image_size
    k = jax.random.PRNGKey(seed)
    return np.asarray(
        jax.random.uniform(k, (n, size, size, 3), minval=-1.0, maxval=1.0),
        dtype=np.float32,
    )


class TestFeaturizer:
    def test_shape_and_padding_invariance(self, tiny_params):
        imgs = _images(5)
        # batch 2 forces a padded final chunk; batch 8 runs one chunk
        f_pad = SigLIPFeaturizer(tiny_params, TINY, batch_size=2)(imgs)
        f_one = SigLIPFeaturizer(tiny_params, TINY, batch_size=8)(imgs)
        assert f_pad.shape == (5, TINY.vision.width)
        np.testing.assert_allclose(f_pad, f_one, rtol=2e-5, atol=2e-5)

    def test_uint8_matches_float(self, tiny_params):
        feat = SigLIPFeaturizer(tiny_params, TINY, batch_size=4)
        u8 = np.asarray(
            jax.random.randint(
                jax.random.PRNGKey(1),
                (3, TINY.vision.image_size, TINY.vision.image_size, 3),
                0,
                256,
            ),
            dtype=np.uint8,
        )
        as_float = u8.astype(np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(
            feat(u8), feat(as_float), rtol=1e-5, atol=1e-5
        )

    def test_resizes_mismatched_inputs(self, tiny_params):
        feat = SigLIPFeaturizer(tiny_params, TINY, batch_size=2)
        big = np.zeros(
            (2, TINY.vision.image_size * 2, TINY.vision.image_size * 2, 3),
            np.float32,
        )
        assert feat(big).shape == (2, TINY.vision.width)

    def test_fid_zero_on_identical_images(self, tiny_params):
        feat = SigLIPFeaturizer(tiny_params, TINY, batch_size=4)
        f = feat(_images(6))
        out = fid_kid_from_features(f, f.copy(), kid_subsets=10)
        assert out["fid_siglip"] == pytest.approx(0.0, abs=1e-6)
        assert out["n_gt"] == 6.0


class TestEvalIntegration:
    def test_run_validation_reports_fid(self, tmp_path):
        from plangen_tpu.cli import load_config
        from plangen_tpu.tasks.eval import run_validation

        cfg = load_config(
            "configs/toy_smoke.py", ["train.val_image_metrics=true"]
        )
        out = run_validation(
            cfg,
            task_type="uni",
            data_name="toy",
            max_len=1,
            output_dir=str(tmp_path),
            batch_size=2,
        )
        assert out and out[0]["pr_image"] is not None
        metrics = json.loads(
            open(os.path.join(tmp_path, "toy_uni_1", "0_metrics.json")).read()
        )
        assert "fid_siglip" in metrics and np.isfinite(metrics["fid_siglip"])
        assert metrics["fid_siglip"] > 0  # random model != toy gt image
        assert metrics["n_gt"] == 2.0


class TestTorchScriptFeaturizer:
    """External feature model path (VERDICT r5 #7): literature-comparable
    FID when a scripted feature module (e.g. pytorch-fid InceptionV3) is
    available. CI stands in a tiny traced torch module."""

    @pytest.fixture(scope="class")
    def feat_module(self, tmp_path_factory):
        import torch

        class TinyFeats(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = torch.nn.Conv2d(3, 8, 3, stride=4)

            def forward(self, x):
                y = self.conv(x)
                # pytorch-fid wrapper shape: [N, D, 1, 1]
                return torch.nn.functional.adaptive_avg_pool2d(y, 1)

        path = tmp_path_factory.mktemp("feats") / "tiny_feats.pt"
        m = TinyFeats().eval()
        traced = torch.jit.trace(m, torch.zeros(1, 3, 32, 32))
        traced.save(str(path))
        return str(path)

    def test_features_and_fid(self, feat_module):
        from plangen_tpu.tasks.image_metrics import (
            TorchScriptFeaturizer, fid_kid_from_features)

        rng = np.random.RandomState(0)
        a = rng.randint(0, 256, (6, 48, 40, 3), dtype=np.uint8)
        feat = TorchScriptFeaturizer(feat_module, size=32, batch_size=4)
        fa = feat(a)
        assert fa.shape == (6, 8) and fa.dtype == np.float32
        # identical sets -> FID 0; keys carry the torchscript tag
        m = fid_kid_from_features(fa, fa.copy(), tag="torchscript")
        assert m["fid_torchscript"] < 1e-8
        # uint8 and the equivalent [-1,1] float agree (range contract)
        f_float = feat(a.astype(np.float32) / 127.5 - 1.0)
        np.testing.assert_allclose(f_float, fa, rtol=1e-4, atol=1e-5)

    def test_cli_metrics_with_torch_features(self, feat_module, tmp_path):
        import subprocess
        import sys as _sys

        from PIL import Image

        rng = np.random.RandomState(1)
        for d in ("gt", "pr"):
            (tmp_path / d).mkdir()
            for i in range(3):
                arr = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
                Image.fromarray(arr).save(tmp_path / d / f"{i}.png")
        r = subprocess.run(
            [_sys.executable, "-m", "plangen_tpu.cli", "metrics",
             str(tmp_path / "gt"), str(tmp_path / "pr"),
             "--features", f"torch:{feat_module}", "--feature-size", "32",
             "--batch", "2"],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        assert r.returncode == 0, r.stdout + r.stderr
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert "fid_torchscript" in out and np.isfinite(out["fid_torchscript"])

    def test_unknown_features_spec_rejected(self):
        from plangen_tpu.tasks.image_metrics import make_featurizer

        with pytest.raises(ValueError, match="unknown --features"):
            make_featurizer("inception", None, None)
