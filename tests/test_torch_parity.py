"""Module-level numerics parity vs torch (the reference's substrate).

Independent torch compositions of the documented reference semantics
(GroupNorm(32, eps 1e-6) + swish + 3x3 convs; 1x1-conv spatial attention;
pre-norm ViT block) are fed the SAME weights through the converter's layout
transforms and compared against our JAX modules. This proves the converter +
NHWC kernels reproduce torch numerics without needing the real checkpoint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF

from plangen_tpu.config import SigLIPConfig, VQConfig
from plangen_tpu.models import siglip, vq

RS = np.random.RandomState(0)
VQC = VQConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=16,
               group_norm_groups=4, codebook_size=32, codebook_dim=8)


def t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def conv_params(cin, cout, k):
    w = RS.randn(cout, cin, k, k).astype(np.float32) * 0.2  # torch OIHW
    b = RS.randn(cout).astype(np.float32) * 0.1
    return w, b


def as_jax_conv(w, b):
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}


def gn_params(c):
    return RS.randn(c).astype(np.float32) * 0.1 + 1.0, RS.randn(c).astype(np.float32) * 0.1


class TestVQModulesVsTorch:
    def test_resblock(self):
        cin, cout = 8, 16
        n1s, n1b = gn_params(cin)
        c1w, c1b = conv_params(cin, cout, 3)
        n2s, n2b = gn_params(cout)
        c2w, c2b = conv_params(cout, cout, 3)
        shw, shb = conv_params(cin, cout, 1)
        p = {
            "norm1": {"scale": jnp.asarray(n1s), "bias": jnp.asarray(n1b)},
            "conv1": as_jax_conv(c1w, c1b),
            "norm2": {"scale": jnp.asarray(n2s), "bias": jnp.asarray(n2b)},
            "conv2": as_jax_conv(c2w, c2b),
            "nin_shortcut": as_jax_conv(shw, shb),
        }
        x = RS.randn(2, 6, 6, cin).astype(np.float32)
        ours = np.asarray(vq.resblock(p, VQC, jnp.asarray(x)))

        xt = t(x).permute(0, 3, 1, 2)  # NCHW
        h = TF.group_norm(xt, 4, t(n1s), t(n1b), eps=1e-6)
        h = h * torch.sigmoid(h)
        h = TF.conv2d(h, t(c1w), t(c1b), padding=1)
        h = TF.group_norm(h, 4, t(n2s), t(n2b), eps=1e-6)
        h = h * torch.sigmoid(h)
        h = TF.conv2d(h, t(c2w), t(c2b), padding=1)
        ref = (TF.conv2d(xt, t(shw), t(shb)) + h).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_attnblock(self):
        c = 8
        ns, nb = gn_params(c)
        qw, qb = conv_params(c, c, 1)
        kw, kb = conv_params(c, c, 1)
        vw, vb = conv_params(c, c, 1)
        pw, pb = conv_params(c, c, 1)
        p = {
            "norm": {"scale": jnp.asarray(ns), "bias": jnp.asarray(nb)},
            "q": as_jax_conv(qw, qb),
            "k": as_jax_conv(kw, kb),
            "v": as_jax_conv(vw, vb),
            "proj_out": as_jax_conv(pw, pb),
        }
        x = RS.randn(1, 4, 4, c).astype(np.float32)
        ours = np.asarray(vq.attnblock(p, VQC, jnp.asarray(x)))

        xt = t(x).permute(0, 3, 1, 2)
        h = TF.group_norm(xt, 4, t(ns), t(nb), eps=1e-6)
        q = TF.conv2d(h, t(qw), t(qb))
        k = TF.conv2d(h, t(kw), t(kb))
        v = TF.conv2d(h, t(vw), t(vb))
        B, C, H, W = q.shape
        qf = q.reshape(B, C, H * W).permute(0, 2, 1)
        kf = k.reshape(B, C, H * W)
        w_ = torch.softmax(torch.bmm(qf, kf) * (C ** -0.5), dim=2)
        vf = v.reshape(B, C, H * W)
        hf = torch.bmm(vf, w_.permute(0, 2, 1)).reshape(B, C, H, W)
        ref = (xt + TF.conv2d(hf, t(pw), t(pb))).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_downsample_asymmetric_pad(self):
        c = 8
        w, b = conv_params(c, c, 3)
        p = {"conv": as_jax_conv(w, b)}
        x = RS.randn(1, 6, 6, c).astype(np.float32)
        ours = np.asarray(vq.downsample(p, jnp.asarray(x)))
        xt = TF.pad(t(x).permute(0, 3, 1, 2), (0, 1, 0, 1))
        ref = TF.conv2d(xt, t(w), t(b), stride=2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_upsample_nearest(self):
        x = RS.randn(1, 3, 3, 4).astype(np.float32)
        ours = np.asarray(vq.upsample_nearest2x(jnp.asarray(x)))
        ref = TF.interpolate(t(x).permute(0, 3, 1, 2), scale_factor=2.0, mode="nearest")
        np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)

    def test_codebook_lookup_l2norm(self):
        cb = RS.randn(VQC.codebook_size, VQC.codebook_dim).astype(np.float32)
        params = {"codebook": jnp.asarray(cb)}
        idx = jnp.asarray([[0, 5, 9, 31]])
        ours = np.asarray(vq.decode_code.__wrapped__ if False else
                          vq._normalized_codebook(params, VQC))
        ref = TF.normalize(t(cb), p=2.0, dim=-1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestSigLIPBlockVsTorch:
    def test_block(self):
        cfg = SigLIPConfig(image_size=32, patch_size=16, width=16, layers=1, heads=2)
        d = cfg.width
        mlp = int(d * cfg.mlp_ratio)

        def lin(cin, cout):
            w = RS.randn(cout, cin).astype(np.float32) * 0.2
            b = RS.randn(cout).astype(np.float32) * 0.1
            return w, b

        n1s, n1b = gn_params(d)
        qkvw, qkvb = lin(d, 3 * d)
        pw, pb = lin(d, d)
        n2s, n2b = gn_params(d)
        f1w, f1b = lin(d, mlp)
        f2w, f2b = lin(mlp, d)
        p = {
            "norm1": {"scale": jnp.asarray(n1s), "bias": jnp.asarray(n1b)},
            "qkv": {"w": jnp.asarray(qkvw.T), "b": jnp.asarray(qkvb)},
            "proj": {"w": jnp.asarray(pw.T), "b": jnp.asarray(pb)},
            "norm2": {"scale": jnp.asarray(n2s), "bias": jnp.asarray(n2b)},
            "fc1": {"w": jnp.asarray(f1w.T), "b": jnp.asarray(f1b)},
            "fc2": {"w": jnp.asarray(f2w.T), "b": jnp.asarray(f2b)},
        }
        x = RS.randn(2, 4, d).astype(np.float32)
        ours = np.asarray(siglip._block(p, cfg, jnp.asarray(x)))

        xt = t(x)
        h = TF.layer_norm(xt, (d,), t(n1s), t(n1b), eps=1e-6)
        qkv = h @ t(qkvw).T + t(qkvb)
        B, N, _ = qkv.shape
        qkv = qkv.reshape(B, N, 3, 2, d // 2).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = TF.scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(1, 2).reshape(B, N, d)
        xt = xt + (attn @ t(pw).T + t(pb))
        h = TF.layer_norm(xt, (d,), t(n2s), t(n2b), eps=1e-6)
        h = TF.gelu(h @ t(f1w).T + t(f1b))
        ref = (xt + (h @ t(f2w).T + t(f2b))).numpy()
        np.testing.assert_allclose(ours, ref, atol=3e-5)


class TestSigLIPFullForwardVsTorch:
    def test_full_tower(self):
        """Patch-embed conv + pos embed + pre-norm block + final LN, end to
        end, through the converter's layout transforms."""
        cfg = SigLIPConfig(image_size=32, patch_size=16, width=16, layers=1, heads=2)
        d = cfg.width
        mlp = int(d * cfg.mlp_ratio)

        def lin(cin, cout):
            w = RS.randn(cout, cin).astype(np.float32) * 0.2
            b = RS.randn(cout).astype(np.float32) * 0.1
            return w, b

        pw_conv, pb_conv = conv_params(3, d, 16)  # OIHW patch conv
        pos = RS.randn(1, cfg.num_patches, d).astype(np.float32) * 0.02
        n1s, n1b = gn_params(d)
        qkvw, qkvb = lin(d, 3 * d)
        prw, prb = lin(d, d)
        n2s, n2b = gn_params(d)
        f1w, f1b = lin(d, mlp)
        f2w, f2b = lin(mlp, d)
        fns, fnb = gn_params(d)

        # converter-mapped params (conv OIHW->HWIO, linear [out,in]->[in,out])
        params = {
            "patch_embed": {
                "w": jnp.asarray(pw_conv.transpose(2, 3, 1, 0)),
                "b": jnp.asarray(pb_conv),
            },
            "pos_embed": jnp.asarray(pos),
            "final_norm": {"scale": jnp.asarray(fns), "bias": jnp.asarray(fnb)},
            "layers": siglip.stack_blocks([
                {
                    "norm1": {"scale": jnp.asarray(n1s), "bias": jnp.asarray(n1b)},
                    "qkv": {"w": jnp.asarray(qkvw.T), "b": jnp.asarray(qkvb)},
                    "proj": {"w": jnp.asarray(prw.T), "b": jnp.asarray(prb)},
                    "norm2": {"scale": jnp.asarray(n2s), "bias": jnp.asarray(n2b)},
                    "fc1": {"w": jnp.asarray(f1w.T), "b": jnp.asarray(f1b)},
                    "fc2": {"w": jnp.asarray(f2w.T), "b": jnp.asarray(f2b)},
                }
            ]),
        }
        img = RS.randn(2, 32, 32, 3).astype(np.float32)
        ours = np.asarray(siglip.forward(params, cfg, jnp.asarray(img)))

        # torch reference composition (timm VisionTransformer semantics)
        xt = t(img).permute(0, 3, 1, 2)
        h = TF.conv2d(xt, t(pw_conv), t(pb_conv), stride=16)  # [B, d, 2, 2]
        B = h.shape[0]
        h = h.flatten(2).transpose(1, 2)  # [B, 4, d] row-major patches
        h = h + t(pos)
        # block
        hn = TF.layer_norm(h, (d,), t(n1s), t(n1b), eps=1e-6)
        qkv = (hn @ t(qkvw).T + t(qkvb)).reshape(B, 4, 3, 2, d // 2).permute(2, 0, 3, 1, 4)
        attn = TF.scaled_dot_product_attention(qkv[0], qkv[1], qkv[2])
        attn = attn.transpose(1, 2).reshape(B, 4, d)
        h = h + (attn @ t(prw).T + t(prb))
        hn = TF.layer_norm(h, (d,), t(n2s), t(n2b), eps=1e-6)
        h = h + (TF.gelu(hn @ t(f1w).T + t(f1b)) @ t(f2w).T + t(f2b))
        ref = TF.layer_norm(h, (d,), t(fns), t(fnb), eps=1e-6).numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-5)


class TestVQDecoderFullVsTorch:
    def test_full_decoder(self):
        """conv_in -> mid(res,attn,res) -> levels(res x2 [+attn deepest],
        upsample) -> GN+swish+conv_out, vs a torch composition with the same
        weights (ch_mult=(1,2): deepest level first, one upsample)."""
        q = VQC  # ch=8, ch_mult=(1,2), num_res_blocks=1, z=16, groups=4

        def res_params(cin, cout):
            n1 = gn_params(cin); c1 = conv_params(cin, cout, 3)
            n2 = gn_params(cout); c2 = conv_params(cout, cout, 3)
            sh = conv_params(cin, cout, 1) if cin != cout else None
            return n1, c1, n2, c2, sh

        def res_jax(pp):
            (n1, c1, n2, c2, sh) = pp
            d = {
                "norm1": {"scale": jnp.asarray(n1[0]), "bias": jnp.asarray(n1[1])},
                "conv1": as_jax_conv(*c1),
                "norm2": {"scale": jnp.asarray(n2[0]), "bias": jnp.asarray(n2[1])},
                "conv2": as_jax_conv(*c2),
            }
            if sh is not None:
                d["nin_shortcut"] = as_jax_conv(*sh)
            return d

        def res_torch(pp, x):
            (n1, c1, n2, c2, sh) = pp
            h = TF.group_norm(x, 4, t(n1[0]), t(n1[1]), eps=1e-6)
            h = h * torch.sigmoid(h)
            h = TF.conv2d(h, t(c1[0]), t(c1[1]), padding=1)
            h = TF.group_norm(h, 4, t(n2[0]), t(n2[1]), eps=1e-6)
            h = h * torch.sigmoid(h)
            h = TF.conv2d(h, t(c2[0]), t(c2[1]), padding=1)
            if sh is not None:
                x = TF.conv2d(x, t(sh[0]), t(sh[1]))
            return x + h

        def attn_params(c):
            return (gn_params(c), conv_params(c, c, 1), conv_params(c, c, 1),
                    conv_params(c, c, 1), conv_params(c, c, 1))

        def attn_jax(pp):
            (n, qw, kw, vw, pw) = pp
            return {
                "norm": {"scale": jnp.asarray(n[0]), "bias": jnp.asarray(n[1])},
                "q": as_jax_conv(*qw), "k": as_jax_conv(*kw),
                "v": as_jax_conv(*vw), "proj_out": as_jax_conv(*pw),
            }

        def attn_torch(pp, x):
            (n, qw, kw, vw, pw) = pp
            h = TF.group_norm(x, 4, t(n[0]), t(n[1]), eps=1e-6)
            qq = TF.conv2d(h, t(qw[0]), t(qw[1]))
            kk = TF.conv2d(h, t(kw[0]), t(kw[1]))
            vv = TF.conv2d(h, t(vw[0]), t(vw[1]))
            B, C, H, W = qq.shape
            w_ = torch.softmax(
                torch.bmm(qq.reshape(B, C, H * W).permute(0, 2, 1),
                          kk.reshape(B, C, H * W)) * (C ** -0.5), dim=2)
            hf = torch.bmm(vv.reshape(B, C, H * W), w_.permute(0, 2, 1)).reshape(B, C, H, W)
            return x + TF.conv2d(hf, t(pw[0]), t(pw[1]))

        block_in = q.ch * q.ch_mult[-1]  # 16
        conv_in = conv_params(q.z_channels, block_in, 3)
        mid_r1 = res_params(block_in, block_in)
        mid_at = attn_params(block_in)
        mid_r2 = res_params(block_in, block_in)
        # level 0 of the reversed walk = deepest (ch 16, attn, upsample)
        l0_res = [res_params(16, 16), res_params(16, 16)]
        l0_attn = [attn_params(16), attn_params(16)]
        l0_up = conv_params(16, 16, 3)
        # level 1 = shallowest (ch 8)
        l1_res = [res_params(16, 8), res_params(8, 8)]
        norm_out = gn_params(8)
        conv_out = conv_params(8, q.out_channels, 3)

        params = {
            "conv_in": as_jax_conv(*conv_in),
            "mid": {"res1": res_jax(mid_r1), "attn": attn_jax(mid_at), "res2": res_jax(mid_r2)},
            "levels": [
                {"res": [res_jax(r) for r in l0_res],
                 "attn": [attn_jax(a) for a in l0_attn],
                 "up": {"conv": as_jax_conv(*l0_up)}},
                {"res": [res_jax(r) for r in l1_res], "attn": []},
            ],
            "norm_out": {"scale": jnp.asarray(norm_out[0]), "bias": jnp.asarray(norm_out[1])},
            "conv_out": as_jax_conv(*conv_out),
        }
        z = RS.randn(1, 4, 4, q.z_channels).astype(np.float32)
        ours = np.asarray(vq.decoder_forward(params, q, jnp.asarray(z)))

        # torch composition
        x = TF.conv2d(t(z).permute(0, 3, 1, 2), t(conv_in[0]), t(conv_in[1]), padding=1)
        x = res_torch(mid_r1, x)
        x = attn_torch(mid_at, x)
        x = res_torch(mid_r2, x)
        for r, a in zip(l0_res, l0_attn):
            x = res_torch(r, x)
            x = attn_torch(a, x)
        x = TF.interpolate(x, scale_factor=2.0, mode="nearest")
        x = TF.conv2d(x, t(l0_up[0]), t(l0_up[1]), padding=1)
        for r in l1_res:
            x = res_torch(r, x)
        x = TF.group_norm(x, 4, t(norm_out[0]), t(norm_out[1]), eps=1e-6)
        x = x * torch.sigmoid(x)
        x = TF.conv2d(x, t(conv_out[0]), t(conv_out[1]), padding=1)
        ref = x.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-5)
