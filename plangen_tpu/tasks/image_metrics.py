"""Built-in image-quality metrics: FID and KID over SigLIP features.

The reference computes FID OUTSIDE the repo (SURVEY §4: validation() only
dumps gt_image/ + pr_image/ artifact trees for external tooling). Here the
metric is built in, with two deliberate departures from the usual recipe:

  * **Feature model = the framework's own SigLIP-L/16-384 tower** (the
    Janus-Pro understanding encoder), not InceptionV3. There is no Inception
    checkpoint in a zero-egress environment, and SigLIP features are a
    strictly stronger image representation. Absolute values are therefore
    NOT comparable to Inception-FID numbers from the literature — they are
    valid for *relative* comparison between runs of this framework (the only
    use the reference's external-FID workflow supports anyway).
  * Images enter the tower in the [-1, 1] pixel convention — the same
    pass-through convention PlanGen feeds SigLIP during MMU
    (hack_image_proc, plangen_base.py:136-147) — so GT and generated images
    go through an identical path.

Math is plain fp64 numpy:
  * FID (Fréchet distance, Heusel et al. 2017): the matrix sqrt trace is
    computed via the symmetric-eigh trick — tr√(Σ₁Σ₂) = Σᵢ√λᵢ(A Σ₂ A) with
    A = √Σ₁ — which is exact for PSD inputs and avoids scipy.linalg.sqrtm's
    complex drift (cross-checked against scipy in tests).
  * KID (polynomial-kernel MMD², Bińkowski et al. 2018): unbiased block
    estimator with kernel k(x,y) = (xᵀy/d + 1)³, reported as mean ± std
    over subsets.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "feature_stats",
    "frechet_distance",
    "kid_poly",
    "SigLIPFeaturizer",
    "TorchScriptFeaturizer",
    "make_featurizer",
    "fid_kid_from_features",
    "load_image_dir",
]


# --------------------------------------------------------------------- math


def feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Mean and covariance of a feature matrix [N, D] in fp64."""
    f = np.asarray(feats, dtype=np.float64)
    if f.ndim != 2 or f.shape[0] < 2:
        raise ValueError(f"need [N>=2, D] features, got {f.shape}")
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrt_trace_of_product(sigma1: np.ndarray, sigma2: np.ndarray) -> float:
    """tr sqrtm(sigma1 @ sigma2) for PSD sigma1/sigma2, via eigh.

    With A = sqrtm(sigma1) (symmetric PSD), sigma1@sigma2 is similar to
    A @ sigma2 @ A, which is symmetric PSD — its eigenvalues are real and
    the trace of the sqrt is the sum of their square roots.
    """
    w1, v1 = np.linalg.eigh(sigma1)
    a = (v1 * np.sqrt(np.clip(w1, 0.0, None))) @ v1.T
    m = a @ sigma2 @ a
    w = np.linalg.eigvalsh((m + m.T) / 2.0)
    return float(np.sqrt(np.clip(w, 0.0, None)).sum())


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """||mu1-mu2||² + tr(Σ1 + Σ2 - 2·sqrtm(Σ1Σ2)), clipped at 0."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = float(((mu1 - mu2) ** 2).sum())
    cov_term = float(np.trace(sigma1) + np.trace(sigma2)) - 2.0 * (
        _sqrt_trace_of_product(sigma1, sigma2)
    )
    return max(0.0, diff + cov_term)


def _poly_kernel(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    d = x.shape[1]
    return (x @ y.T / d + 1.0) ** 3


def _mmd2_unbiased(x: np.ndarray, y: np.ndarray) -> float:
    """Unbiased MMD² estimate between equal-size blocks x, y [m, D]."""
    m = x.shape[0]
    kxx = _poly_kernel(x, x)
    kyy = _poly_kernel(y, y)
    kxy = _poly_kernel(x, y)
    sum_off = lambda k: (k.sum() - np.trace(k)) / (m * (m - 1))
    return float(sum_off(kxx) + sum_off(kyy) - 2.0 * kxy.mean())


def kid_poly(
    feats1: np.ndarray,
    feats2: np.ndarray,
    n_subsets: int = 100,
    subset_size: Optional[int] = None,
    seed: int = 0,
) -> Tuple[float, float]:
    """KID mean ± std via the standard subset estimator (deterministic seed)."""
    f1 = np.asarray(feats1, np.float64)
    f2 = np.asarray(feats2, np.float64)
    m = min(len(f1), len(f2), subset_size or 1000)
    if m < 2:
        raise ValueError("KID needs at least 2 samples per side")
    if m >= len(f1) and m >= len(f2):
        # no subsampling possible: every "subset" is a permutation of the
        # full sets and the unbiased MMD is permutation-invariant — compute
        # once; std 0.0 here means "no subsampling", not high confidence
        return _mmd2_unbiased(f1, f2), 0.0
    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(n_subsets):
        i = rng.choice(len(f1), m, replace=False)
        j = rng.choice(len(f2), m, replace=False)
        vals.append(_mmd2_unbiased(f1[i], f2[j]))
    return float(np.mean(vals)), float(np.std(vals))


def fid_kid_from_features(
    gt_feats: np.ndarray, pr_feats: np.ndarray, kid_subsets: int = 100,
    tag: str = "siglip",
) -> Dict[str, float]:
    """Both metrics from two feature matrices; keys carry the feature model
    (`tag`) so an Inception-feature run is never mistaken for a SigLIP one."""
    mu1, s1 = feature_stats(gt_feats)
    mu2, s2 = feature_stats(pr_feats)
    kid_mean, kid_std = kid_poly(gt_feats, pr_feats, n_subsets=kid_subsets)
    return {
        f"fid_{tag}": frechet_distance(mu1, s1, mu2, s2),
        f"kid_{tag}": kid_mean,
        f"kid_{tag}_std": kid_std,
        "n_gt": float(len(gt_feats)),
        "n_pr": float(len(pr_feats)),
    }


# ------------------------------------------------------------- feature model


class SigLIPFeaturizer:
    """Mean-pooled SigLIP patch features for image batches.

    One jitted program at a FIXED batch size (partial batches pad up), so a
    whole eval run costs exactly one compile — essential on axon where each
    remote compile is minutes (CLAUDE.md). Accepts uint8 [0,255] or float
    [-1,1] images of any HxW (resized on device to the tower's input size).
    """

    def __init__(self, params, model_cfg, batch_size: int = 16):
        import jax
        import jax.numpy as jnp

        from plangen_tpu.models import siglip

        self.batch = int(batch_size)
        self._vision_params = params["vision_model"]
        vcfg = model_cfg.vision
        size = vcfg.image_size

        @partial(jax.jit, static_argnames=())
        def _feats(vp, images):
            x = images.astype(jnp.float32)
            if x.shape[1] != size or x.shape[2] != size:
                x = jax.image.resize(
                    x, (x.shape[0], size, size, 3), "linear", antialias=True
                )
            feats = siglip.forward(vp, vcfg, x.astype(jnp.bfloat16))
            return feats.astype(jnp.float32).mean(axis=1)

        self._fn = _feats

    @staticmethod
    def to_model_range(images: np.ndarray) -> np.ndarray:
        """uint8 [0,255] -> float32 [-1,1]; float input passes through."""
        if images.dtype == np.uint8:
            # the ONE owner of the [-1,1] pixel contract (same fn the
            # train/eval loaders use) so the convention cannot fork
            from plangen_tpu.data.preprocess import to_model_range

            return to_model_range(images)
        return np.asarray(images, np.float32)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images [N, H, W, 3] (uint8 or [-1,1] float) -> fp32 [N, width]."""
        x = self.to_model_range(np.asarray(images))
        if x.ndim != 4 or x.shape[-1] != 3:
            raise ValueError(f"need [N, H, W, 3] images, got {x.shape}")
        out = []
        for s in range(0, len(x), self.batch):
            chunk = x[s : s + self.batch]
            n = len(chunk)
            if n < self.batch:  # pad to the compiled shape, slice after
                pad = np.zeros((self.batch - n,) + chunk.shape[1:], np.float32)
                chunk = np.concatenate([chunk, pad], axis=0)
            out.append(np.asarray(self._fn(self._vision_params, chunk))[:n])
        return np.concatenate(out, axis=0)


class TorchScriptFeaturizer:
    """Features from an EXTERNAL TorchScript module (CPU torch) — the
    weights-day path to literature-comparable FID.

    The zero-egress default (SigLIP) is honestly relative-only (module
    docstring); the literature's numbers use InceptionV3 pool3 features.
    When a feature checkpoint IS available, script it once

        m = torch.jit.trace(feature_model.eval(), example_nchw)
        m.save("inception_feats.pt")

    (for pytorch-fid parity: their `InceptionV3([3])` wrapper, whose
    forward returns pool3 features) and point `cli metrics --features
    torch:<path>` at it. FID math on top is this module's exact
    eigh-Fréchet — only the feature model changes.

    Contract: module(float32 NCHW in [0,1] at --feature-size) -> [N, D];
    tuple/list outputs take the first element; trailing 1x1 spatial dims
    are squeezed (the pytorch-fid wrapper's output shape is [N,2048,1,1]).
    """

    def __init__(self, path: str, size: int = 299, batch_size: int = 16):
        import torch

        self._torch = torch
        self.size = int(size)
        self.batch = int(batch_size)
        self.mod = torch.jit.load(path, map_location="cpu").eval()

    def _unit_range(self, images: np.ndarray) -> np.ndarray:
        """uint8 [0,255] or float [-1,1] -> float32 [0,1]."""
        if images.dtype == np.uint8:
            return images.astype(np.float32) / 255.0
        x = np.asarray(images, np.float32)
        return np.clip((x + 1.0) / 2.0, 0.0, 1.0)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        torch = self._torch
        x = self._unit_range(np.asarray(images))
        if x.ndim != 4 or x.shape[-1] != 3:
            raise ValueError(f"need [N, H, W, 3] images, got {x.shape}")
        out = []
        with torch.no_grad():
            for s in range(0, len(x), self.batch):
                t = torch.from_numpy(x[s : s + self.batch]).permute(0, 3, 1, 2)
                if t.shape[-1] != self.size or t.shape[-2] != self.size:
                    t = torch.nn.functional.interpolate(
                        t, size=(self.size, self.size), mode="bilinear",
                        align_corners=False,
                    )
                y = self.mod(t)
                if isinstance(y, (tuple, list)):
                    y = y[0]
                y = y.reshape(y.shape[0], -1)  # squeeze [N,D,1,1] -> [N,D]
                out.append(y.cpu().numpy().astype(np.float32))
        return np.concatenate(out, axis=0)


def make_featurizer(spec: str, params, model_cfg, batch_size: int = 16,
                    size: int = 299):
    """'siglip' (default, zero-egress) or 'torch:<path>' -> (featurizer,
    tag). The tag lands in the metric keys (fid_<tag>) so reports are
    self-describing about comparability."""
    if spec == "siglip":
        return SigLIPFeaturizer(params, model_cfg, batch_size=batch_size), \
            "siglip"
    if spec.startswith("torch:"):
        path = spec[len("torch:"):]
        return TorchScriptFeaturizer(path, size=size, batch_size=batch_size), \
            "torchscript"
    raise ValueError(
        f"unknown --features {spec!r}; options: 'siglip' or 'torch:<path>' "
        "(a TorchScript feature module, e.g. scripted pytorch-fid "
        "InceptionV3 for literature-comparable numbers)"
    )


# ------------------------------------------------------------ directory mode


_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def load_image_dir(path: str, limit: Optional[int] = None) -> np.ndarray:
    """Read every image in a directory (sorted) -> uint8 [N,H,W,3].

    This is the weights-day entry: point it at the gt_image/ and pr_image/
    trees an eval run wrote (tasks/eval.py artifact layout) and compute
    FID/KID without re-running generation. Stays uint8 (4x smaller than
    float) — SigLIPFeaturizer converts per compiled batch, so a 10k-image
    tree costs ~4.4 GB host RAM instead of ~18.
    """
    from PIL import Image

    names = sorted(
        n for n in os.listdir(path) if n.lower().endswith(_IMG_EXTS)
    )
    if limit is not None:
        names = names[:limit]
    if not names:
        raise ValueError(f"no images under {path}")
    imgs = []
    shape = None
    for n in names:
        img = Image.open(os.path.join(path, n)).convert("RGB")
        if shape is not None and img.size != (shape[1], shape[0]):
            # mixed sizes: resize on host to the first image's shape
            img = img.resize((shape[1], shape[0]), Image.BICUBIC)
        arr = np.asarray(img, dtype=np.uint8)
        if shape is None:
            shape = arr.shape
        imgs.append(arr)
    return np.stack(imgs)
