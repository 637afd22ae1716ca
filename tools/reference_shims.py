"""Import shims for running the torch reference (/root/reference) on CPU.

The reference (360CVGroup/PlanGen) pins a GPU-era dependency set; this image
deliberately lacks several of those packages (diffusers, mmengine, wandb,
torchvision, kornia, lightning, pycocotools, timm, attrdict, omegaconf, fire).
`install_stubs()` registers minimal stand-ins in sys.modules BEFORE the
reference is imported so `tools/capture_reference.py` can drive the reference
System's inference paths:

  * symbols on the reference's hot inference paths get REAL minimal
    implementations (timm.layers used by siglip_vit.py:42-51; the
    torchvision transforms used at plangen_base.py:49-50);
  * everything else (diffusers schedulers, wandb, dataset-only deps) gets an
    inert attribute-factory so module-level imports succeed.

Also provides `cpu_patches()` (maps the reference's hardcoded .cuda()/
torch.Generator('cuda')/autocast('cuda') onto CPU equivalents — the reference
assumes a CUDA box, plangen_base.py:526,571,360) and `load_reference_args()`
(execs project/plangen/cfg/base.py, the mmengine-config flat namespace, into
a dot-accessible namespace without mmengine).

Nothing here is imported by the framework itself — tools-only.
"""

from __future__ import annotations

import sys
import types
from typing import Any, Dict


# ---------------------------------------------------------------------------
# inert attribute factory for never-executed dependency surface
# ---------------------------------------------------------------------------


class _Inert:
    """Callable/attribute sink: absorbs any use without side effects."""

    def __init__(self, name="stub"):
        self._name = name

    def __call__(self, *a, **k):
        return _Inert(self._name + "()")

    def __getattr__(self, item):
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        return _Inert(f"{self._name}.{item}")

    def __repr__(self):
        return f"<stub {self._name}>"


def _inert_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)

    def getattr_(item, _n=name):
        if item.startswith("__") and item.endswith("__"):
            # introspection (inspect/getmodule) must see a normal module
            raise AttributeError(item)
        return _Inert(f"{_n}.{item}")

    mod.__getattr__ = getattr_  # type: ignore
    return mod


# ---------------------------------------------------------------------------
# real minimal implementations (inference-path symbols)
# ---------------------------------------------------------------------------


def _build_torchvision():
    import numpy as np
    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    utils = types.ModuleType("torchvision.utils")

    class ToTensor:
        def __call__(self, pic):
            if isinstance(pic, Image.Image):
                arr = np.asarray(pic, dtype=np.uint8)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
                return t.float().div(255.0)
            if isinstance(pic, np.ndarray):
                t = torch.from_numpy(pic.copy())
                if t.ndim == 3:
                    t = t.permute(2, 0, 1).contiguous()
                return t.float().div(255.0)
            return pic

    class ToPILImage:
        def __call__(self, t):
            arr = t.detach().cpu().float().clamp(0, 1).mul(255).round()
            arr = arr.to(torch.uint8).permute(1, 2, 0).numpy()
            if arr.shape[2] == 1:
                arr = arr[:, :, 0]
            return Image.fromarray(arr)

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean.to(t)) / self.std.to(t)

    class Resize:
        def __init__(self, size, interpolation=None, antialias=True):
            self.size = size
            self.antialias = antialias

        def __call__(self, img):
            if isinstance(img, Image.Image):
                size = self.size
                if isinstance(size, int):
                    w, h = img.size
                    if w < h:
                        size = (int(round(h * size / w)), size)
                    else:
                        size = (size, int(round(w * size / h)))
                return img.resize((size[1], size[0]), Image.BICUBIC)
            return img

    class CenterCrop:
        def __init__(self, size):
            self.size = size if not isinstance(size, int) else (size, size)

        def __call__(self, img):
            if isinstance(img, Image.Image):
                w, h = img.size
                th, tw = self.size
                left = (w - tw) // 2
                top = (h - th) // 2
                return img.crop((left, top, left + tw, top + th))
            return img

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    def pil_to_tensor(pic):
        arr = np.asarray(pic, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()

    def resize_tensor(img, size, interpolation="bicubic", antialias=True):
        # torch tensor [..., H, W] resize (used by VLMImageProcessor.resize
        # when fed tensors — the capture driver feeds PIL or pre-sized
        # tensors, so this is a fallback)
        mode = "bicubic" if "cubic" in str(interpolation).lower() else "bilinear"
        if isinstance(size, int):
            size = (size, size)
        x = img[None] if img.ndim == 3 else img
        out = torch.nn.functional.interpolate(
            x.float(), size=tuple(size), mode=mode, antialias=antialias
        )
        return out[0] if img.ndim == 3 else out

    def make_grid(t, *a, **k):
        return t

    def crop(img, top, left, height, width):
        if isinstance(img, Image.Image):
            return img.crop((left, top, left + width, top + height))
        return img[..., top:top + height, left:left + width]

    functional.resize = resize_tensor
    functional.pil_to_tensor = pil_to_tensor
    functional.to_tensor = ToTensor()
    functional.crop = crop
    functional.InterpolationMode = InterpolationMode
    # dataset-only symbols resolve to inert stubs (dunders stay module-like)
    def _fallback(prefix):
        def getattr_(item):
            if item.startswith("__") and item.endswith("__"):
                raise AttributeError(item)
            return _Inert(f"{prefix}.{item}")

        return getattr_

    functional.__getattr__ = _fallback("torchvision.transforms.functional")  # type: ignore
    transforms.__getattr__ = _fallback("torchvision.transforms")  # type: ignore
    for cls in (ToTensor, ToPILImage, Normalize, Resize, CenterCrop, Compose,
                InterpolationMode):
        setattr(transforms, cls.__name__, cls)
    transforms.functional = functional
    utils.make_grid = make_grid
    datasets = _inert_module("torchvision.datasets")
    tv.transforms = transforms
    tv.utils = utils
    tv.datasets = datasets
    tv.__version__ = "0.0-stub"
    mods = {
        "torchvision": tv,
        "torchvision.transforms": transforms,
        "torchvision.transforms.functional": functional,
        "torchvision.utils": utils,
        "torchvision.datasets": datasets,
    }
    for m in mods.values():
        m.__path__ = []  # present as packages so `import a.b` resolves
    return mods


def _build_timm():
    """Minimal timm.layers surface for janus/models/siglip_vit.py.

    Module/parameter NAMES match real timm so HF checkpoint loading maps
    cleanly (blocks.N.mlp.fc1, patch_embed.proj, attn_pool.*)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")
    models = types.ModuleType("timm.models")
    manipulate = types.ModuleType("timm.models._manipulate")

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, norm_layer=None, bias=True, drop=0.0,
                     use_conv=False):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.norm = norm_layer(hidden_features) if norm_layer else nn.Identity()
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True, bias=True,
                     dynamic_img_pad=False, **kwargs):
            super().__init__()
            self.patch_size = (patch_size, patch_size) if isinstance(
                patch_size, int) else tuple(patch_size)
            if img_size is not None:
                img_size = (img_size, img_size) if isinstance(
                    img_size, int) else tuple(img_size)
                self.img_size = img_size
                self.grid_size = tuple(
                    s // p for s, p in zip(img_size, self.patch_size))
                self.num_patches = self.grid_size[0] * self.grid_size[1]
            else:
                self.img_size = None
                self.grid_size = None
                self.num_patches = None
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)  # NCHW -> NLC
            return self.norm(x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
            return x * mask / keep

    class PatchDropout(nn.Module):
        def __init__(self, prob=0.0, **kwargs):
            super().__init__()
            self.prob = prob

        def forward(self, x):
            return x

    class AttentionPoolLatent(nn.Module):
        """timm-compatible latent attention pool (param names match timm so a
        real checkpoint's attn_pool.* weights load; PlanGen nulls the module
        after load anyway — plangen_base.py:105-106)."""

        def __init__(self, in_features, out_features=None, embed_dim=None,
                     num_heads=8, mlp_ratio=4.0, qkv_bias=True, qk_norm=False,
                     latent_len=1, latent_dim=None, pos_embed="", pool_type="token",
                     norm_layer=None, drop=0.0, **kwargs):
            super().__init__()
            embed_dim = embed_dim or in_features
            out_features = out_features or in_features
            self.embed_dim = embed_dim
            self.num_heads = num_heads
            self.head_dim = embed_dim // num_heads
            self.latent_dim = latent_dim or embed_dim
            self.latent_len = latent_len
            self.latent = nn.Parameter(torch.zeros(1, latent_len, embed_dim))
            self.q = nn.Linear(embed_dim, embed_dim, bias=qkv_bias)
            self.kv = nn.Linear(embed_dim, embed_dim * 2, bias=qkv_bias)
            self.q_norm = nn.Identity()
            self.k_norm = nn.Identity()
            self.proj = nn.Linear(embed_dim, embed_dim)
            self.proj_drop = nn.Dropout(drop)
            self.pos_embed = None
            self.norm = (norm_layer(out_features) if norm_layer else nn.Identity())
            self.mlp = Mlp(embed_dim, int(embed_dim * mlp_ratio))

        def init_weights(self):
            pass

        def forward(self, x):
            B, N, C = x.shape
            q = self.q(self.latent.expand(B, -1, -1))
            q = q.reshape(B, self.latent_len, self.num_heads, self.head_dim
                          ).transpose(1, 2)
            kv = self.kv(x).reshape(B, N, 2, self.num_heads, self.head_dim
                                    ).permute(2, 0, 3, 1, 4)
            k, v = kv.unbind(0)
            x = F.scaled_dot_product_attention(q, k, v)
            x = x.transpose(1, 2).reshape(B, self.latent_len, C)
            x = self.proj_drop(self.proj(x))
            x = x + self.mlp(self.norm(x))
            return x[:, 0]

    def resample_abs_pos_embed(posemb, new_size, old_size=None, num_prefix_tokens=0,
                               interpolation="bicubic", antialias=True, verbose=False):
        num_pos = posemb.shape[1] - num_prefix_tokens
        if old_size is None:
            hw = int(num_pos ** 0.5)
            old_size = (hw, hw)
        if tuple(new_size) == tuple(old_size):
            return posemb
        prefix = posemb[:, :num_prefix_tokens]
        grid = posemb[:, num_prefix_tokens:]
        dim = grid.shape[-1]
        grid = grid.reshape(1, old_size[0], old_size[1], dim).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=tuple(new_size), mode="bicubic",
                             antialias=antialias)
        grid = grid.permute(0, 2, 3, 1).reshape(1, -1, dim)
        return torch.cat([prefix, grid], dim=1)

    def named_apply(fn, module, name="", depth_first=True, include_root=False):
        if not depth_first and include_root:
            fn(module=module, name=name)
        for child_name, child in module.named_children():
            child_full = f"{name}.{child_name}" if name else child_name
            named_apply(fn, child, child_full, depth_first, True)
        if depth_first and include_root:
            fn(module=module, name=name)
        return module

    def checkpoint_seq(functions, x, *a, **k):
        for fn in functions:
            x = fn(x)
        return x

    LayerType = object

    layers.Mlp = Mlp
    layers.PatchEmbed = PatchEmbed
    layers.DropPath = DropPath
    layers.PatchDropout = PatchDropout
    layers.AttentionPoolLatent = AttentionPoolLatent
    layers.resample_abs_pos_embed = resample_abs_pos_embed
    layers.LayerType = LayerType
    manipulate.checkpoint_seq = checkpoint_seq
    manipulate.named_apply = named_apply
    timm.layers = layers
    timm.models = models
    models._manipulate = manipulate
    mods = {
        "timm": timm,
        "timm.layers": layers,
        "timm.models": models,
        "timm.models._manipulate": manipulate,
    }
    for m in mods.values():
        m.__path__ = []
    return mods


def _build_attrdict():
    mod = types.ModuleType("attrdict")

    class AttrDict(dict):
        def __getattr__(self, item):
            try:
                v = self[item]
            except KeyError as e:
                raise AttributeError(item) from e
            if isinstance(v, dict) and not isinstance(v, AttrDict):
                return AttrDict(v)
            return v

        def __setattr__(self, k, v):
            self[k] = v

    mod.AttrDict = AttrDict
    return {"attrdict": mod}


def _build_misc():
    import torch

    out: Dict[str, types.ModuleType] = {}
    # diffusers + the specific submodules the reference imports from
    for name in [
        "diffusers", "diffusers.optimization", "diffusers.training_utils",
        "diffusers.utils", "diffusers.utils.torch_utils", "diffusers.models",
        "diffusers.models.attention", "diffusers.models.attention_processor",
        "wandb", "kornia", "fire", "albumentations",
        "pycocotools", "pycocotools.coco", "pycocotools.mask",
    ]:
        out[name] = _inert_module(name)

    mm = types.ModuleType("mmengine")
    mmc = types.ModuleType("mmengine.config")
    mmc.Config = _Inert("mmengine.Config")
    mmc.DictAction = _Inert("mmengine.DictAction")
    mm.config = mmc
    out["mmengine"] = mm
    out["mmengine.config"] = mmc

    pl = types.ModuleType("pytorch_lightning")
    pl.seed_everything = lambda seed=0, **k: torch.manual_seed(seed)
    out["pytorch_lightning"] = pl

    lightning = types.ModuleType("lightning")
    lpt = types.ModuleType("lightning.pytorch")
    lptu = types.ModuleType("lightning.pytorch.utilities")
    lptu.CombinedLoader = _Inert("CombinedLoader")
    lightning.pytorch = lpt
    lpt.utilities = lptu
    out["lightning"] = lightning
    out["lightning.pytorch"] = lpt
    out["lightning.pytorch.utilities"] = lptu

    om = types.ModuleType("omegaconf")

    class OmegaConf:
        @staticmethod
        def load(path):
            raise RuntimeError("omegaconf stub: dataset configs not supported")

        @staticmethod
        def create(obj=None):
            return obj

    om.OmegaConf = OmegaConf
    out["omegaconf"] = om
    return out


def install_stubs(reference_root: str) -> None:
    """Register stand-ins for the reference's missing deps, add the reference
    and its vendored Janus to sys.path, and pre-register the broken
    `src.utils.seg_palette` module (missing from the release,
    base_system.py:41 — SURVEY.md 'reference defects')."""
    import importlib.machinery

    stubs: Dict[str, types.ModuleType] = {}
    for builder in (_build_torchvision, _build_timm, _build_attrdict, _build_misc):
        stubs.update(builder())
    for name, mod in stubs.items():
        if getattr(mod, "__spec__", None) is None:
            # transformers probes deps via importlib.util.find_spec, which
            # raises on registered modules whose __spec__ is None
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        if not hasattr(mod, "__path__"):
            mod.__path__ = []  # package-like: `import stub.sub` resolves
        sys.modules.setdefault(name, mod)

    for p in (reference_root, f"{reference_root}/three_party/Janus"):
        if p not in sys.path:
            sys.path.insert(0, p)

    # the released reference imports a module it doesn't ship
    seg = types.ModuleType("src.utils.seg_palette")
    seg.palette = [[i % 256, (i * 37) % 256, (i * 97) % 256] for i in range(151)]
    sys.modules.setdefault("src.utils.seg_palette", seg)


def cpu_patches() -> None:
    """Map the reference's CUDA-hardcoded calls onto CPU when CUDA is absent
    (plangen_base.py: torch.Generator(device='cuda') :526, .cuda() :544,
    autocast('cuda') :360, empty_cache in clean())."""
    import torch

    if torch.cuda.is_available():
        return

    # NOTE: torch.Generator is left untouched — replacing it breaks torch's
    # own `torch.Generator | None` annotations. The reference's only
    # Generator(device='cuda') site is t2i (plangen_base.py:526), which the
    # capture driver bypasses (it seeds its own CPU generator and calls
    # sample_image directly).
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore
    torch.cuda.empty_cache = lambda: None  # type: ignore
    torch.cuda.is_available = lambda: False  # type: ignore

    _autocast = torch.autocast

    class autocast(_autocast):
        def __init__(self, device_type="cpu", *a, **k):
            super().__init__("cpu", *a, **k)

    torch.autocast = autocast  # type: ignore


class DotDict(dict):
    """Attribute-style access over nested dicts (stands in for mmengine's
    ConfigDict: the reference reads args.test_data.task_type etc.)."""

    def __getattr__(self, item):
        try:
            v = self[item]
        except KeyError as e:
            raise AttributeError(item) from e
        if isinstance(v, dict) and not isinstance(v, DotDict):
            v = DotDict(v)
            self[item] = v
        return v

    def __setattr__(self, k, v):
        self[k] = v


def load_reference_args(reference_root: str, overrides: Dict[str, Any]) -> DotDict:
    """Exec project/plangen/cfg/base.py (a flat mmengine-style python config)
    into a DotDict and apply overrides. No mmengine required."""
    ns: Dict[str, Any] = {}
    path = f"{reference_root}/project/plangen/cfg/base.py"
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), ns)
    args = DotDict({k: v for k, v in ns.items() if not k.startswith("__")})
    args.update(overrides)
    return args
