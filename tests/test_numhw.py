"""numhw (<h>/<w> token) mode end-to-end.

The reference's alternative coordinate encoding (`use_textual=False` +
`use_numhw_tokens=True`): boxes serialize as `<box><h12>,<w34>,<h56>,<w78>
</box>` with 0-99 coords over 200 dedicated tokenizer tokens
(plangen_base.py:121-127 adds them; data_hico.py:165-180 serializes).
This drives the WHOLE pipeline in that mode: dataset serialization ->
tokenizer (atomic hw tokens) -> uni generation -> plan decode -> parse ->
eval metrics.
"""

import json
import os

import numpy as np
import pytest

from plangen_tpu.cli import load_config
from plangen_tpu.data.registry import get_dataset
from plangen_tpu.tasks.eval import build_pipeline, run_validation
from plangen_tpu.text.grounding import parse_grounding, serialize_grounding

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "toy_smoke.py")


def numhw_cfg(extra=()):
    return load_config(
        CFG_PATH,
        ["use_textual=false", "use_numhw_tokens=true",
         "generation.max_new_text_tokens=8", *extra],
    )


class TestNumhwSerialization:
    def test_dataset_emits_numhw_groundings(self):
        cfg = numhw_cfg()
        ds = get_dataset(cfg, "toy")
        s = ds[0]
        assert "<h" in s.gt_grounding and "<w" in s.gt_grounding
        assert "[" not in s.gt_grounding  # no textual int lists
        boxes, descs = parse_grounding(s.gt_grounding, textual=False)
        assert len(boxes) == len(ds.boxes)
        np.testing.assert_allclose(
            np.asarray(boxes), np.asarray(ds.boxes), atol=1 / 99 + 1e-6
        )
        assert descs == ds.classes

    def test_textual_default_unchanged(self):
        cfg = load_config(CFG_PATH, [])
        s = get_dataset(cfg, "toy")[0]
        assert "<h" not in s.gt_grounding and "[" in s.gt_grounding

    def test_roundtrip_through_tokenizer(self):
        """hw tokens must encode atomically and decode back verbatim, so a
        plan decode can be regex-parsed (tokenizer.py:44-51 token registry)."""
        cfg = numhw_cfg()
        pipe = build_pipeline(cfg)
        g = serialize_grounding(
            "", [(0.1, 0.2, 0.5, 0.9)], ["a cat"], textual=False
        )
        assert "<h10>" in g and "<w20>" in g and "<h50>" in g and "<w89>" in g
        ids = pipe.proc.tok.encode(g, add_bos=False)
        # each hw token is ONE id (atomic): 7 structural tokens + "a cat"
        hw_ids = [pipe.proc.tok.token_id(t)
                  for t in ("<h10>", "<w20>", "<h50>", "<w89>")]
        for t in hw_ids:
            assert t in ids
        decoded = pipe.proc.tok.decode(ids)
        assert g in decoded or decoded == g
        boxes, descs = parse_grounding(decoded, textual=False)
        assert descs == ["a cat"]
        np.testing.assert_allclose(
            np.asarray(boxes[0]), [0.1, 0.2, 0.5, 0.9], atol=1 / 99 + 1e-6
        )


class TestNumhwPipeline:
    @pytest.fixture(scope="class")
    def pipe(self):
        return build_pipeline(numhw_cfg())

    def test_layout_to_image_with_numhw_grounding(self, pipe):
        g = serialize_grounding(
            "", [(0.1, 0.15, 0.45, 0.8)], ["a red rectangle"], textual=False
        )
        out = pipe.layout_to_image(["two rectangles"], [g], seed=3)
        toks = np.asarray(out.image_tokens)
        assert toks.shape == (1, pipe.cfg.image_seq_len)
        assert (toks >= 0).all() and (toks < pipe.cfg.image_token_size).all()

    def test_plan_decode_parse_roundtrip(self, pipe):
        """plan() must produce a grounding string whose parse path is the
        numhw regex; random tiny weights rarely emit well-formed layouts, so
        assert the decode/truncate/parse plumbing (types + no crash) and that
        a numhw continuation injected through the same decode path parses."""
        outs = pipe.plan(["two colored rectangles"])
        assert isinstance(outs[0], str) and outs[0].startswith("<grounding>")
        parse_grounding(outs[0], textual=False)  # must not raise

        # decode path fidelity: ids -> text -> parse for a known layout
        g = serialize_grounding(
            "", [(0.0, 0.5, 1.0, 1.0)], ["a wooden table"], textual=False
        )
        ids = pipe.proc.tok.encode(g + "</grounding>", add_bos=False)
        text = pipe.proc.tok.decode(ids)
        boxes, descs = parse_grounding(text, textual=False)
        assert descs == ["a wooden table"]

    def test_joint_generate_runs(self, pipe):
        out = pipe.joint_generate(["two colored rectangles"], seed=5)
        assert np.asarray(out.image_tokens).shape[1] == pipe.cfg.image_seq_len
        assert isinstance(out.groundings[0], str)


class TestNumhwEval:
    def test_run_validation_plan_metrics_use_numhw_parse(self, tmp_path):
        cfg = numhw_cfg()
        out = run_validation(
            cfg, task_type="plan", data_name="toy", max_len=1,
            output_dir=str(tmp_path), batch_size=2,
        )
        assert out
        base = os.path.join(str(tmp_path), "toy_plan_1")
        metrics = json.loads(
            open(os.path.join(base, "0_metrics.json")).read()
        )
        # gt groundings parsed with the numhw regex -> metrics see real boxes
        assert metrics["n_gt"] >= 2
