"""Config / ModelSpec contract tests: the reference-INI surface
(scripts/main.py:292-293 reads these sections via configparser) plus the
[TPU] extension knobs — in particular the round-5 piecemeal LAYOUT_V2
tri-states (LV2_ASSEMBLY / LV2_SPLIT_DECODER / LV2_FENCE)."""

import pytest

from superslomo_tpu.config import ModelSpec, default_config


class TestLv2Tristates:
    def test_defaults_follow_layout_v2(self):
        for master in (False, True):
            s = ModelSpec(layout_v2=master)
            assert s.v2_assembly is master
            assert s.v2_split_decoder is master
            assert s.v2_fence is master

    def test_explicit_overrides_win(self):
        s = ModelSpec(layout_v2=True, lv2_split_decoder=False)
        assert s.v2_assembly and s.v2_fence and not s.v2_split_decoder
        s = ModelSpec(lv2_assembly=True, lv2_fence=True)
        assert s.v2_assembly and s.v2_fence and not s.v2_split_decoder

    def test_spec_stays_hashable(self):
        """ModelSpec is closed over in jit — it must stay hashable, and
        distinct flag combinations must hash apart (separate traces)."""
        a = ModelSpec(lv2_assembly=True)
        b = ModelSpec(layout_v2=True)
        assert hash(a) != hash(b) or a != b
        assert len({a, b, ModelSpec()}) == 3

    def test_config_auto_maps_to_none(self):
        cfg = default_config()
        spec = cfg.model_spec()
        assert spec.lv2_assembly is None
        assert spec.lv2_split_decoder is None
        assert spec.lv2_fence is None

    @pytest.mark.parametrize("raw,expect", [("TRUE", True), ("FALSE", False)])
    def test_config_explicit_booleans(self, raw, expect):
        cfg = default_config()
        cfg.set("TPU", "LV2_ASSEMBLY", raw)
        assert cfg.model_spec().lv2_assembly is expect

    def test_layout_v2_master_switch_from_ini(self):
        cfg = default_config()
        cfg.set("TPU", "LAYOUT_V2", "TRUE")
        spec = cfg.model_spec()
        assert spec.v2_assembly and spec.v2_split_decoder and spec.v2_fence


class TestDefaultsAndValidation:
    def test_validate_passes_on_defaults(self):
        default_config().validate()

    def test_validate_rejects_bad_bottleneck(self):
        cfg = default_config()
        cfg.set("STAGE1", "BOTTLENECK", "LSTM")
        with pytest.raises(ValueError):
            cfg.validate()

    def test_eval_mode_tsample_invariant(self):
        cfg = default_config()
        cfg.set("EVAL", "EVAL_MODE", "TRUE")  # T_SAMPLE stays RANDOM
        with pytest.raises(ValueError):
            cfg.validate()
