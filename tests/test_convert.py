"""Weight-converter parity tests.

The decisive check: a tiny HF `LlamaForCausalLM` (the exact module Janus-Pro
wraps, modeling_vlm.py:219) converted through `convert_state_dict`'s LM path
must reproduce HF logits bit-close in fp32 — validating RMSNorm, RoPE
conventions, GQA layout, position-id semantics, and the [out,in]->[in,out]
transposes in one shot. Conv-layout conversion is validated against
torch.nn.functional.conv2d directly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from plangen_tpu.config import LlamaConfig, PlanGenModelConfig
from plangen_tpu.convert.torch_to_jax import _convert_lm, _conv_w
from plangen_tpu.models import llama


def make_hf_llama(cfg: LlamaConfig):
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        attention_bias=False,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


TINY_LM = LlamaConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,  # exercise GQA
    head_dim=16,
)


class TestHFLlamaParity:
    @pytest.fixture(scope="class")
    def converted(self):
        model = make_hf_llama(TINY_LM)
        sd = {f"language_model.{k}": v for k, v in model.state_dict().items()}
        params = _convert_lm(sd, PlanGenModelConfig(llama=TINY_LM), "language_model.")
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params)
        return model, params

    def test_logits_match(self, converted):
        model, params = converted
        ids = np.random.RandomState(0).randint(0, TINY_LM.vocab_size, (2, 7))
        with torch.no_grad():
            ref = model(torch.tensor(ids)).logits.numpy()
        embeds = llama.embed(params, jnp.asarray(ids))
        hidden, _ = llama.forward(params, TINY_LM, embeds, jnp.ones(ids.shape))
        ours = np.asarray(llama.lm_head(params, hidden))
        np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-4)

    def test_left_padded_logits_match(self, converted):
        """Left-padded batch with attention mask — the PlanGen serving case."""
        model, params = converted
        ids = np.array([[9, 9, 5, 6, 7], [1, 2, 3, 4, 5]])
        mask = np.array([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]])
        with torch.no_grad():
            ref = model(
                torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).logits.numpy()
        embeds = llama.embed(params, jnp.asarray(ids))
        hidden, _ = llama.forward(params, TINY_LM, embeds, jnp.asarray(mask))
        ours = np.asarray(llama.lm_head(params, hidden))
        # compare only non-pad positions (pad positions differ by masking conv.)
        np.testing.assert_allclose(ours[0, 2:], ref[0, 2:], atol=3e-4, rtol=1e-4)
        np.testing.assert_allclose(ours[1], ref[1], atol=3e-4, rtol=1e-4)

    def test_kv_cached_decode_matches_hf_generate(self, converted):
        model, params = converted
        ids = np.random.RandomState(1).randint(0, TINY_LM.vocab_size, (1, 5))
        n_new = 6
        with torch.no_grad():
            ref = model.generate(
                torch.tensor(ids),
                max_new_tokens=n_new,
                do_sample=False,
                pad_token_id=0,
            ).numpy()[:, 5:]

        from plangen_tpu.runtime.generate import greedy_decode_text

        # greedy_decode_text needs full params tree shape {language_model: ...}
        full = {"language_model": params}
        cfg = PlanGenModelConfig(llama=TINY_LM)
        embeds = llama.embed(params, jnp.asarray(ids))
        mask = jnp.ones((1, 5 + n_new), dtype=jnp.int32)
        # eos that never fires
        ours = np.asarray(
            greedy_decode_text(
                full, cfg, embeds, mask, jnp.int32(-1), max_new_tokens=n_new
            )
        )
        np.testing.assert_array_equal(ours, ref)


class TestConvLayout:
    def test_conv_weight_conversion(self):
        """OIHW->HWIO conversion: jax NHWC conv == torch NCHW conv."""
        import torch.nn.functional as F

        rs = np.random.RandomState(0)
        x = rs.randn(1, 5, 5, 3).astype(np.float32)  # NHWC
        w = rs.randn(4, 3, 3, 3).astype(np.float32)  # OIHW
        ref = F.conv2d(
            torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w), padding=1
        ).numpy().transpose(0, 2, 3, 1)
        w_hwio = _conv_w({"w": w}, "w")
        ours = jax.lax.conv_general_dilated(
            jnp.asarray(x),
            jnp.asarray(w_hwio),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


class TestStructure:
    def test_converted_tree_matches_init_tree(self):
        """Converted pytree structure must match vlm.init's (so orbax restore
        and sharding rules apply uniformly). Uses a synthetic state dict built
        from the expected HF key inventory for the tiny config."""
        cfg = PlanGenModelConfig.tiny()
        sd = synth_state_dict(cfg)
        from plangen_tpu.convert.torch_to_jax import convert_state_dict

        converted = convert_state_dict(sd, cfg)
        ref = vlm_init_np(cfg)
        t1 = jax.tree_util.tree_structure(converted)
        t2 = jax.tree_util.tree_structure(ref)
        assert t1 == t2, f"\n{t1}\n!=\n{t2}"
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(converted),
            jax.tree_util.tree_leaves_with_path(ref),
        ):
            assert np.asarray(a).shape == np.asarray(b).shape, f"{p1}: {np.asarray(a).shape} vs {np.asarray(b).shape}"

    def test_janus_pro_7b_shapes(self):
        """The 7B family member: init tree shapes (via eval_shape — no 28 GB
        allocation) are self-consistent and a 7B forward traces end to end."""
        import jax.numpy as jnp

        from plangen_tpu.models import llama, vlm

        cfg = PlanGenModelConfig.janus_pro_7b()
        shapes = jax.eval_shape(
            lambda k: vlm.init(k, cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
        )
        lm = shapes["language_model"]
        assert lm["layers"]["q_proj"].shape == (30, 4096, 32 * 128)
        assert lm["embed_tokens"].shape == (102400, 4096)
        assert shapes["aligner"]["layers"][0]["w"].shape == (1024, 4096)
        assert shapes["gen_head"]["fc2"]["w"].shape == (4096, 16384)
        n_params = sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes)
        )
        assert 6.5e9 < n_params < 8.5e9, n_params

        # full forward traces with the 7B dims (abstract, no memory)
        def fwd(params, ids):
            x = vlm.embed_text(params, ids)
            h, _ = llama.forward(
                params["language_model"], cfg.llama, x,
                jnp.ones(ids.shape, jnp.int32),
            )
            return vlm.image_gen_logits(params, h[:, -1])

        out = jax.eval_shape(
            fwd, shapes, jax.ShapeDtypeStruct((2, 8), jnp.int32)
        )
        assert out.shape == (2, 16384)


def vlm_init_np(cfg):
    from plangen_tpu.models import vlm

    return jax.tree_util.tree_map(
        np.asarray, vlm.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    )


def synth_state_dict(cfg: PlanGenModelConfig):
    """Synthesize the HF-side key inventory (zeros) for the tiny config."""
    sd = {}
    h, i, qd, kvd = (
        cfg.llama.hidden_size,
        cfg.llama.intermediate_size,
        cfg.llama.q_dim,
        cfg.llama.kv_dim,
    )
    sd["language_model.model.embed_tokens.weight"] = np.zeros((cfg.llama.vocab_size, h))
    sd["language_model.model.norm.weight"] = np.zeros((h,))
    sd["language_model.lm_head.weight"] = np.zeros((cfg.llama.vocab_size, h))
    for l in range(cfg.llama.num_layers):
        p = f"language_model.model.layers.{l}."
        sd[p + "input_layernorm.weight"] = np.zeros((h,))
        sd[p + "post_attention_layernorm.weight"] = np.zeros((h,))
        sd[p + "self_attn.q_proj.weight"] = np.zeros((qd, h))
        sd[p + "self_attn.k_proj.weight"] = np.zeros((kvd, h))
        sd[p + "self_attn.v_proj.weight"] = np.zeros((kvd, h))
        sd[p + "self_attn.o_proj.weight"] = np.zeros((h, qd))
        sd[p + "mlp.gate_proj.weight"] = np.zeros((i, h))
        sd[p + "mlp.up_proj.weight"] = np.zeros((i, h))
        sd[p + "mlp.down_proj.weight"] = np.zeros((h, i))
    # vision tower
    v = cfg.vision
    p = "vision_model.vision_tower."
    sd[p + "patch_embed.proj.weight"] = np.zeros((v.width, 3, v.patch_size, v.patch_size))
    sd[p + "patch_embed.proj.bias"] = np.zeros((v.width,))
    sd[p + "pos_embed"] = np.zeros((1, v.num_patches, v.width))
    sd[p + "norm.weight"] = np.zeros((v.width,))
    sd[p + "norm.bias"] = np.zeros((v.width,))
    mlp_dim = int(v.width * v.mlp_ratio)
    for l in range(v.layers):
        b = f"{p}blocks.{l}."
        for nm in ["norm1", "norm2"]:
            sd[b + nm + ".weight"] = np.zeros((v.width,))
            sd[b + nm + ".bias"] = np.zeros((v.width,))
        sd[b + "attn.qkv.weight"] = np.zeros((3 * v.width, v.width))
        sd[b + "attn.qkv.bias"] = np.zeros((3 * v.width,))
        sd[b + "attn.proj.weight"] = np.zeros((v.width, v.width))
        sd[b + "attn.proj.bias"] = np.zeros((v.width,))
        sd[b + "mlp.fc1.weight"] = np.zeros((mlp_dim, v.width))
        sd[b + "mlp.fc1.bias"] = np.zeros((mlp_dim,))
        sd[b + "mlp.fc2.weight"] = np.zeros((v.width, mlp_dim))
        sd[b + "mlp.fc2.bias"] = np.zeros((v.width,))
    # aligners
    for name, in_dim in [("aligner", cfg.aligner.input_dim), ("gen_aligner", cfg.gen_aligner.input_dim)]:
        n = cfg.aligner.n_embed if name == "aligner" else cfg.gen_aligner.n_embed
        sd[f"{name}.layers.0.weight"] = np.zeros((n, in_dim))
        sd[f"{name}.layers.0.bias"] = np.zeros((n,))
        sd[f"{name}.layers.2.weight"] = np.zeros((n, n))
        sd[f"{name}.layers.2.bias"] = np.zeros((n,))
    sd["gen_head.output_mlp_projector.weight"] = np.zeros(
        (cfg.image_token_embed, cfg.llama.hidden_size)
    )
    sd["gen_head.output_mlp_projector.bias"] = np.zeros((cfg.image_token_embed,))
    sd["gen_head.vision_head.weight"] = np.zeros(
        (cfg.image_token_size, cfg.image_token_embed)
    )
    sd["gen_head.vision_head.bias"] = np.zeros((cfg.image_token_size,))
    sd["gen_embed.weight"] = np.zeros((cfg.image_token_size, cfg.gen_embed_dim))
    # vq
    q = cfg.vq
    g = "gen_vision_model."
    in_mult = (1,) + tuple(q.ch_mult)
    sd[g + "quantize.embedding.weight"] = np.zeros((q.codebook_size, q.codebook_dim))
    sd[g + "quant_conv.weight"] = np.zeros((q.codebook_dim, q.z_channels, 1, 1))
    sd[g + "quant_conv.bias"] = np.zeros((q.codebook_dim,))
    sd[g + "post_quant_conv.weight"] = np.zeros((q.z_channels, q.codebook_dim, 1, 1))
    sd[g + "post_quant_conv.bias"] = np.zeros((q.z_channels,))

    def add_gn(name, c):
        sd[name + ".weight"] = np.zeros((c,))
        sd[name + ".bias"] = np.zeros((c,))

    def add_conv(name, cin, cout, k=3):
        sd[name + ".weight"] = np.zeros((cout, cin, k, k))
        sd[name + ".bias"] = np.zeros((cout,))

    def add_res(prefix, cin, cout):
        add_gn(prefix + "norm1", cin)
        add_conv(prefix + "conv1", cin, cout)
        add_gn(prefix + "norm2", cout)
        add_conv(prefix + "conv2", cout, cout)
        if cin != cout:
            add_conv(prefix + "nin_shortcut", cin, cout, k=1)

    def add_attn(prefix, c):
        add_gn(prefix + "norm", c)
        for nm in ["q", "k", "v", "proj_out"]:
            add_conv(prefix + nm, c, c, k=1)

    n_levels = len(q.ch_mult)
    # encoder
    add_conv(g + "encoder.conv_in", 3, q.ch)
    c = q.ch
    for li in range(n_levels):
        cin = q.ch * in_mult[li]
        cout = q.ch * q.ch_mult[li]
        cc = cin
        for r in range(q.num_res_blocks):
            add_res(f"{g}encoder.conv_blocks.{li}.res.{r}.", cc, cout)
            cc = cout
            if li == n_levels - 1:
                add_attn(f"{g}encoder.conv_blocks.{li}.attn.{r}.", cc)
        if li != n_levels - 1:
            add_conv(f"{g}encoder.conv_blocks.{li}.downsample.conv", cc, cc)
        c = cc
    add_res(g + "encoder.mid.0.", c, c)
    add_attn(g + "encoder.mid.1.", c)
    add_res(g + "encoder.mid.2.", c, c)
    add_gn(g + "encoder.norm_out", c)
    add_conv(g + "encoder.conv_out", c, q.z_channels)
    # decoder
    block_in = q.ch * q.ch_mult[-1]
    add_conv(g + "decoder.conv_in", q.z_channels, block_in)
    add_res(g + "decoder.mid.0.", block_in, block_in)
    add_attn(g + "decoder.mid.1.", block_in)
    add_res(g + "decoder.mid.2.", block_in, block_in)
    c = block_in
    for idx, li in enumerate(reversed(range(n_levels))):
        cout = q.ch * q.ch_mult[li]
        for r in range(q.num_res_blocks + 1):
            add_res(f"{g}decoder.conv_blocks.{idx}.res.{r}.", c, cout)
            c = cout
            if li == n_levels - 1:
                add_attn(f"{g}decoder.conv_blocks.{idx}.attn.{r}.", c)
        if li != 0:
            add_conv(f"{g}decoder.conv_blocks.{idx}.upsample.conv", c, c)
    add_gn(g + "decoder.norm_out", c)
    add_conv(g + "decoder.conv_out", c, q.out_channels)
    return sd


class TestConvertCLI:
    def test_convert_subcommand(self, tmp_path, monkeypatch):
        """convert CLI: synthetic safetensors checkpoint -> orbax artifact."""
        from safetensors.numpy import save_file

        import plangen_tpu.config as config
        from plangen_tpu.cli import main

        tiny = PlanGenModelConfig.tiny()
        monkeypatch.setattr(config, "PlanGenModelConfig", lambda: tiny)

        sd = synth_state_dict(tiny)
        ckpt_dir = tmp_path / "janus"
        ckpt_dir.mkdir()
        save_file(
            {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()},
            str(ckpt_dir / "model.safetensors"),
        )
        out = tmp_path / "params_out"
        main(["convert", "--janus-path", str(ckpt_dir), "--out", str(out)])
        assert out.exists()


class TestJaxToTorchExport:
    """Inverse converter: torch->jax->torch and jax->torch->jax round trips
    must be exact (transposes only), and the trainable filter must match
    the tuning-mode predicates training froze with."""

    @pytest.fixture(scope="class")
    def tiny(self):
        return PlanGenModelConfig.tiny()

    @pytest.fixture(scope="class")
    def rand_sd(self, tiny):
        rng = np.random.default_rng(7)
        return {
            k: rng.standard_normal(v.shape).astype(np.float32)
            for k, v in synth_state_dict(tiny).items()
        }

    def test_torch_jax_torch_roundtrip_exact(self, tiny, rand_sd):
        from plangen_tpu.convert.jax_to_torch import export_state_dict
        from plangen_tpu.convert.torch_to_jax import convert_state_dict

        params = convert_state_dict(rand_sd, tiny, dtype=np.float32)
        back = export_state_dict(params, tiny)
        assert set(back) == set(rand_sd)
        for k in rand_sd:
            np.testing.assert_array_equal(back[k], rand_sd[k], err_msg=k)

    def test_jax_torch_jax_roundtrip_exact(self, tiny):
        from plangen_tpu.convert.jax_to_torch import export_state_dict
        from plangen_tpu.convert.torch_to_jax import convert_state_dict

        params = vlm_init_np(tiny)
        sd = export_state_dict(params, tiny)
        back = convert_state_dict(sd, tiny, dtype=np.float32)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = jax.tree_util.tree_leaves_with_path(back)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                          err_msg=str(pa))

    def test_trainable_filter_matches_tuning_modes(self, tiny, rand_sd):
        from plangen_tpu.convert.jax_to_torch import (
            export_state_dict,
            export_trainable_state_dict,
        )
        from plangen_tpu.convert.torch_to_jax import convert_state_dict

        params = convert_state_dict(rand_sd, tiny, dtype=np.float32)
        full = export_state_dict(params, tiny)
        s1 = export_trainable_state_dict(params, tiny, "stage1")
        # the reference saves from System.named_parameters() where the VLM
        # is self.vl_gpt (base_system.py:188-189, plangen_base.py:104) —
        # bare HF names would match ZERO keys in its strict=False reload
        assert s1 and all(k.startswith("vl_gpt.") for k in s1)
        stripped = {k[len("vl_gpt."):] for k in s1}
        assert stripped < set(full)
        assert all(k.startswith(("vl_gpt.aligner.", "vl_gpt.gen_aligner.",
                                 "vl_gpt.gen_head.")) for k in s1)
        s3 = export_trainable_state_dict(params, tiny, "stage3")
        assert not any(k.startswith("vl_gpt.gen_vision_model.") for k in s3)
        assert any(k.startswith("vl_gpt.language_model.") for k in s3)
        assert any(k.startswith("vl_gpt.vision_model.") for k in s3)
        # prefix="" gives bare HF names for direct HF-model overlays
        bare = export_trainable_state_dict(params, tiny, "stage1", prefix="")
        assert set(bare) == stripped
        with pytest.raises(ValueError, match="tuning_mode"):
            export_trainable_state_dict(params, tiny, "nope")

    def test_overlay_reloads_like_reference_finetune(self, tiny, rand_sd):
        # the exported trainable dict must function as a strict=False
        # overlay on the base sd (base_system.py:158-162 semantics)
        from plangen_tpu.convert.jax_to_torch import (
            export_trainable_state_dict,
        )
        from plangen_tpu.convert.torch_to_jax import convert_state_dict

        params = convert_state_dict(rand_sd, tiny, dtype=np.float32)
        # "train" stage1: scale the aligner weights
        params["aligner"]["layers"][0]["w"] = (
            params["aligner"]["layers"][0]["w"] * 2.0
        )
        overlay = export_trainable_state_dict(params, tiny, "stage1")
        # keys arrive vl_gpt.-prefixed (reference System naming); the
        # loader strips the prefix before merging — emulate that here,
        # end-to-end coverage in test_finetune_overlay_via_loader below
        merged = {**rand_sd, **{k[len("vl_gpt."):]: v
                                for k, v in overlay.items()}}
        re = convert_state_dict(merged, tiny, dtype=np.float32)
        np.testing.assert_array_equal(
            re["aligner"]["layers"][0]["w"],
            params["aligner"]["layers"][0]["w"],
        )
        np.testing.assert_array_equal(
            re["language_model"]["layers"]["q_proj"],
            params["language_model"]["layers"]["q_proj"],
        )

    def test_lora_tree_merges_before_export(self, tiny, rand_sd):
        from plangen_tpu.convert.jax_to_torch import export_state_dict
        from plangen_tpu.convert.torch_to_jax import convert_state_dict
        from plangen_tpu.train.lora import add_lora, init_lora, merge_lora

        params = convert_state_dict(rand_sd, tiny, dtype=np.float32)
        lora = init_lora(jax.random.PRNGKey(3), tiny.llama, rank=2)
        # make B nonzero so the merge actually changes the weights
        lora["q_proj"]["b"] = jnp.ones_like(lora["q_proj"]["b"]) * 0.01
        with_lora = add_lora(params, lora)
        sd = export_state_dict(with_lora, tiny)
        merged = merge_lora(with_lora)
        np.testing.assert_array_equal(
            sd["language_model.model.layers.0.self_attn.q_proj.weight"],
            np.asarray(
                merged["language_model"]["layers"]["q_proj"][0]
            ).T,
        )
        assert not any("lora" in k for k in sd)

    def test_lora_trainable_export_is_merged_projections(self, tiny, rand_sd):
        from plangen_tpu.convert.jax_to_torch import (
            export_trainable_state_dict,
        )
        from plangen_tpu.convert.torch_to_jax import convert_state_dict
        from plangen_tpu.train.lora import add_lora, init_lora

        params = convert_state_dict(rand_sd, tiny, dtype=np.float32)
        with_lora = add_lora(
            params, init_lora(jax.random.PRNGKey(3), tiny.llama, rank=2)
        )
        out = export_trainable_state_dict(with_lora, tiny, "lora")
        assert out and all(
            any(t in k for t in ("q_proj", "k_proj", "v_proj", "o_proj"))
            for k in out
        )
        toks = export_trainable_state_dict(with_lora, tiny, "lora_tokens")
        assert "vl_gpt.language_model.model.embed_tokens.weight" in toks

    def test_finetune_overlay_via_loader(self, tiny, rand_sd, tmp_path):
        # END-TO-END: cli-export trainable payload -> load_janus_checkpoint
        # finetune_path overlay, exercising the vl_gpt. strip the real
        # reference checkpoints require (base_system.py:188, :153-154)
        from safetensors.numpy import save_file

        from plangen_tpu.convert.jax_to_torch import (
            export_trainable_state_dict,
            save_torch_state_dict,
        )
        from plangen_tpu.convert.torch_to_jax import (
            convert_state_dict,
            load_janus_checkpoint,
        )

        base_dir = tmp_path / "janus"
        base_dir.mkdir()
        save_file({k: np.ascontiguousarray(v) for k, v in rand_sd.items()},
                  str(base_dir / "model.safetensors"))

        params = convert_state_dict(rand_sd, tiny, dtype=np.float32)
        params["aligner"]["layers"][0]["w"] = (
            params["aligner"]["layers"][0]["w"] * 3.0
        )
        overlay = export_trainable_state_dict(params, tiny, "stage1")
        assert all(k.startswith("vl_gpt.") for k in overlay)
        ft = save_torch_state_dict(overlay, str(tmp_path / "trainable.pth"))

        re = load_janus_checkpoint(str(base_dir), tiny, finetune_path=ft,
                                   dtype=np.float32)
        np.testing.assert_array_equal(
            re["aligner"]["layers"][0]["w"],
            params["aligner"]["layers"][0]["w"],
        )
        # untouched weights come from the base
        np.testing.assert_array_equal(
            re["language_model"]["layers"]["q_proj"],
            params["language_model"]["layers"]["q_proj"],
        )

    def test_finetune_overlay_skips_unknown_keys(self, tiny, rand_sd,
                                                 tmp_path, capsys):
        # peft wrapper leftovers / renamed keys in a real payload must not
        # crash the converter — skipped with a visible diagnostic
        import torch

        from safetensors.numpy import save_file

        from plangen_tpu.convert.torch_to_jax import load_janus_checkpoint

        base_dir = tmp_path / "janus"
        base_dir.mkdir()
        save_file({k: np.ascontiguousarray(v) for k, v in rand_sd.items()},
                  str(base_dir / "model.safetensors"))
        ft = str(tmp_path / "trainable.pth")
        torch.save({"vl_gpt.base_model.model.lora_A.weight":
                    torch.zeros(2, 2)}, ft)
        re = load_janus_checkpoint(str(base_dir), tiny, finetune_path=ft,
                                   dtype=np.float32)
        assert "language_model" in re
        assert "overlay keys" in capsys.readouterr().err

    def test_quantized_tree_refused(self, tiny, rand_sd):
        from plangen_tpu.convert.jax_to_torch import export_state_dict
        from plangen_tpu.convert.torch_to_jax import convert_state_dict
        from plangen_tpu.ops.quant import quantize_lm_params

        params = convert_state_dict(rand_sd, tiny, dtype=np.float32)
        qparams = quantize_lm_params(
            jax.tree_util.tree_map(jnp.asarray, params)
        )
        with pytest.raises(ValueError, match="quantized"):
            export_state_dict(qparams, tiny)

    def test_save_formats(self, tiny, rand_sd, tmp_path):
        from plangen_tpu.convert.jax_to_torch import (
            export_trainable_state_dict,
            save_torch_state_dict,
        )
        from plangen_tpu.convert.torch_to_jax import convert_state_dict

        params = convert_state_dict(rand_sd, tiny, dtype=np.float32)
        sd = export_trainable_state_dict(params, tiny, "stage1")
        p = save_torch_state_dict(sd, str(tmp_path / "trainable.pth"))
        loaded = torch.load(p, map_location="cpu")
        assert set(loaded) == set(sd)
        np.testing.assert_array_equal(
            loaded[next(iter(sd))].numpy(), sd[next(iter(sd))]
        )
        z = np.load(save_torch_state_dict(sd, str(tmp_path / "t.npz")))
        assert set(z.files) == set(sd)
        with pytest.raises(ValueError, match="extension"):
            save_torch_state_dict(sd, str(tmp_path / "t.xyz"))
