"""INI-compatible configuration for superslomo_tpu.

Mirrors the reference config schema (reference: configs/superslomo_original.ini,
read via configparser at scripts/main.py:292-293) so that a user of the
reference can point this framework at their existing .ini files unchanged.
Sections / keys: PROJECT, DATA, {ADOBE,VIMEO,NFS,SINTEL_HFR,SINTEL_EPE,
SLOWFLOW}_DATA, MODEL, TRAIN, VAL, STAGE1, STAGE2, DATALOADER, EVAL, SEED.

Improvements over the reference (which has no defaults layer — missing keys
raise at the read site): a typed accessor object with a defaults table and
validation collected in one place.
"""

from __future__ import annotations

import configparser
import dataclasses
from typing import Tuple

_DEFAULTS = {
    ("DATA", "DATASET"): "ADOBE",
    ("DATA", "WINDOW_LENGTH"): "57",
    ("MODEL", "PIXEL_MEAN"): "0.485,0.456,0.406",
    ("MODEL", "PIXEL_STD"): "0.229,0.224,0.225",
    ("TRAIN", "BATCH_SIZE"): "32",
    ("TRAIN", "N_EPOCHS"): "200",
    ("TRAIN", "LEARNING_RATE"): "0.0001",
    ("TRAIN", "LR_PERIOD"): "50",
    ("TRAIN", "LR_DECAY"): "0.1",
    ("TRAIN", "SAVE_EVERY"): "25",
    ("TRAIN", "CROP_IMH"): "224",
    ("TRAIN", "CROP_IMW"): "224",
    ("TRAIN", "LAMBDA_R"): "60",
    ("TRAIN", "LAMBDA_W"): "10",
    ("TRAIN", "LAMBDA_P"): "20",
    # Training with random VGG features can never reach published quality
    # (perceptual loss, reference losses.py:12-41); require explicit opt-in.
    ("TRAIN", "ALLOW_RANDOM_VGG"): "FALSE",
    ("TRAIN", "N_FRAMES"): "2",
    ("TRAIN", "CKPT_DIR"): "checkpoints",
    ("VAL", "BATCH_SIZE"): "8",
    ("VAL", "CROP_IMH"): "256",
    ("VAL", "CROP_IMW"): "256",
    ("STAGE1", "ENCODER"): "UNET",
    ("STAGE1", "WEIGHTS"): "",
    ("STAGE1", "LOADPREV"): "FALSE",
    ("STAGE1", "FREEZE"): "FALSE",
    ("STAGE1", "BOTTLENECK"): "CONV",
    ("STAGE2", "ENCODER"): "UNET",
    ("STAGE2", "WEIGHTS"): "",
    ("STAGE2", "LOADPREV"): "FALSE",
    ("STAGE2", "FREEZE"): "FALSE",
    ("STAGE2", "BOTTLENECK"): "CONV",
    ("STAGE2", "CROSS_SKIP"): "TRUE",
    ("DATALOADER", "N_WORKERS"): "4",
    ("DATALOADER", "T_SAMPLE"): "RANDOM",
    ("EVAL", "EVAL_MODE"): "FALSE",
    ("SEED", "VALUE"): "42",
    ("PROJECT", "DIR"): ".",
    ("PROJECT", "LOGDIR"): "logs",
    # TPU-specific knobs (absent in the reference; safe defaults).
    ("TPU", "COMPUTE_DTYPE"): "float32",   # float32 | bfloat16
    ("TPU", "DATA_AXIS"): "data",
    ("TPU", "SPATIAL_AXIS"): "spatial",
    ("TPU", "USE_PALLAS_WARP"): "AUTO",    # AUTO | TRUE | FALSE
    # Bidirectional ConvLSTM/GRU layout knobs (the reference's CLSTM
    # submodule is un-vendored, so checkpoint portability needs an explicit
    # contract — see models/bottleneck.py):
    ("TPU", "CLSTM_MERGE"): "CONCAT",      # CONCAT (hidden/2 per dir) | SUM (full)
    ("TPU", "CLSTM_GATE_ORDER"): "IFOG",   # CLSTM: perm of I,F,O,G; CGRU: perm of Z,R
    # Rematerialize U-Net activations in the backward pass (jax.checkpoint):
    # trades ~30% step time for ~2x activation memory — enables batch>=8
    # training at 352² per chip.
    ("TPU", "REMAT"): "FALSE",
    # Layout-friendly decoder/epilogue (round-3 profiling: XLA propagated
    # the planar epilogue's exotic layout preferences INTO the adjacent
    # full-res convs, running them at 8-66% efficiency, and lowered the
    # decoder skip concats + stage-2 input assembly as multi-pass relayout
    # copies — together ~20 ms of a 166 ms 720p step). LAYOUT_V2 splits
    # every decoder conv over its concat operands (conv is linear in input
    # channels — exact), assembles the fused multi-t stage-2 input in
    # grouped (c, r, s) channel order consumed via a free weight
    # permutation, and fences the U-Net heads from the epilogue's layout
    # preferences. Numerically exact in f32; in bf16 the split-conv sums
    # round once more (same magnitude as the existing bf16 quantization).
    ("TPU", "LAYOUT_V2"): "FALSE",
    # Piecemeal overrides of the three LAYOUT_V2 rewrites (AUTO = follow
    # LAYOUT_V2). LV2_ASSEMBLY and LV2_FENCE are memory-neutral and can
    # ship at the B=8 headline shape; LV2_SPLIT_DECODER is what OOMs there
    # (see ModelSpec / ARCHITECTURE.md).
    ("TPU", "LV2_ASSEMBLY"): "AUTO",
    ("TPU", "LV2_SPLIT_DECODER"): "AUTO",
    ("TPU", "LV2_FENCE"): "AUTO",
}

VALID_BOTTLENECKS = ("CONV", "CLSTM", "CGRU")
VALID_T_SAMPLE = ("RANDOM", "MIDDLE", "NIL")
VALID_DATASETS = ("ALL", "ADOBE", "NFS", "VIMEO", "SLOWFLOW", "SINTEL_HFR")
REQD_IMAGES = {2: 9, 4: 25, 6: 41, 8: 57}  # reference: default_reader.py:36


class Config:
    """Typed view over a configparser with a defaults layer.

    Exposes the same get/getint/getfloat/getboolean(SECTION, KEY) surface the
    reference threads through every constructor (e.g. flow_computation.py:20),
    so either a Config or a raw RawConfigParser works everywhere.
    """

    def __init__(self, parser: configparser.RawConfigParser | None = None):
        self._p = parser if parser is not None else configparser.RawConfigParser()

    # -- reference-compatible accessors ------------------------------------
    def get(self, section: str, key: str) -> str:
        try:
            return self._p.get(section, key)
        except (configparser.NoSectionError, configparser.NoOptionError):
            dk = (section.upper(), key.upper())
            if dk in _DEFAULTS:
                return _DEFAULTS[dk]
            raise

    def getint(self, section: str, key: str) -> int:
        return int(self.get(section, key))

    def getfloat(self, section: str, key: str) -> float:
        return float(self.get(section, key))

    def getboolean(self, section: str, key: str) -> bool:
        v = self.get(section, key).strip().lower()
        if v in ("true", "1", "yes", "on"):
            return True
        if v in ("false", "0", "no", "off"):
            return False
        raise ValueError(f"Not a boolean: [{section}] {key} = {v!r}")

    def set(self, section: str, key: str, value) -> None:
        if not self._p.has_section(section):
            self._p.add_section(section)
        self._p.set(section, key, str(value))

    def has(self, section: str, key: str) -> bool:
        try:
            self.get(section, key)
            return True
        except (configparser.NoSectionError, configparser.NoOptionError):
            return False

    # -- convenience typed views -------------------------------------------
    def pixel_mean(self) -> Tuple[float, ...]:
        return tuple(float(p) for p in self.get("MODEL", "PIXEL_MEAN").split(","))

    def pixel_std(self) -> Tuple[float, ...]:
        return tuple(float(p) for p in self.get("MODEL", "PIXEL_STD").split(","))

    def n_frames(self) -> int:
        return self.getint("TRAIN", "N_FRAMES")

    def model_spec(self) -> "ModelSpec":
        return ModelSpec(
            stage1_bottleneck=self.get("STAGE1", "BOTTLENECK").upper(),
            stage2_bottleneck=self.get("STAGE2", "BOTTLENECK").upper(),
            cross_skip=self.getboolean("STAGE2", "CROSS_SKIP"),
            n_frames=self.n_frames(),
            stage1_freeze=self.getboolean("STAGE1", "FREEZE"),
            stage2_freeze=self.getboolean("STAGE2", "FREEZE"),
            compute_dtype=self.get("TPU", "COMPUTE_DTYPE"),
            clstm_merge=self.get("TPU", "CLSTM_MERGE").upper(),
            clstm_gate_order=self.get("TPU", "CLSTM_GATE_ORDER").upper(),
            remat=self.getboolean("TPU", "REMAT"),
            layout_v2=self.getboolean("TPU", "LAYOUT_V2"),
            lv2_assembly=self._tristate("LV2_ASSEMBLY"),
            lv2_split_decoder=self._tristate("LV2_SPLIT_DECODER"),
            lv2_fence=self._tristate("LV2_FENCE"),
        )

    def _tristate(self, key: str) -> bool | None:
        """[TPU] AUTO → None (follow LAYOUT_V2); else a boolean."""
        if self.get("TPU", key).strip().upper() == "AUTO":
            return None
        return self.getboolean("TPU", key)

    def validate(self) -> None:
        """Fail-fast schema validation (the reference validates lazily via
        assertion decorators, utils/validators.py:18-27)."""
        spec = self.model_spec()
        if spec.stage1_bottleneck not in VALID_BOTTLENECKS:
            raise ValueError(f"STAGE1 BOTTLENECK must be one of {VALID_BOTTLENECKS}")
        if spec.stage2_bottleneck not in VALID_BOTTLENECKS:
            raise ValueError(f"STAGE2 BOTTLENECK must be one of {VALID_BOTTLENECKS}")
        if spec.n_frames not in REQD_IMAGES:
            raise ValueError(f"N_FRAMES must be one of {sorted(REQD_IMAGES)}")
        if self.get("DATA", "DATASET").upper() not in VALID_DATASETS:
            raise ValueError(f"DATASET must be one of {VALID_DATASETS}")
        t_sample = self.get("DATALOADER", "T_SAMPLE").upper()
        if t_sample not in VALID_T_SAMPLE:
            raise ValueError(f"T_SAMPLE must be one of {VALID_T_SAMPLE}")
        # reference invariant: EVAL_MODE <=> T_SAMPLE == NIL (validators.py:18-27)
        if self.getboolean("EVAL", "EVAL_MODE") != (t_sample == "NIL"):
            raise ValueError("EVAL_MODE requires T_SAMPLE=NIL (and vice versa)")
        if self.get("STAGE1", "ENCODER").upper() != "UNET":
            raise NotImplementedError("Only the UNET encoder is implemented")


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static (hashable) model hyperparameters — safe to close over in jit."""

    stage1_bottleneck: str = "CONV"
    stage2_bottleneck: str = "CONV"
    cross_skip: bool = True
    n_frames: int = 2
    stage1_freeze: bool = False
    stage2_freeze: bool = False
    compute_dtype: str = "float32"
    clstm_merge: str = "CONCAT"  # CONCAT | SUM (models/bottleneck.py)
    clstm_gate_order: str = "IFOG"
    remat: bool = False  # jax.checkpoint each U-Net stage (training memory)
    layout_v2: bool = False  # split-conv decoder + layout-fenced epilogue
    # Round-5 piecemeal LAYOUT_V2 (VERDICT r4 item 2): the full v2 program
    # OOMs by 11.6 MB at the 720p B=8 headline shape (the split-conv
    # decoder keeps two half-channel conv outputs live; the fences pin
    # full-res temps) — but its three rewrites are independent, so each can
    # ship alone where it fits. None = follow ``layout_v2``.
    lv2_assembly: bool | None = None  # grouped (c,r,s) stage-2 assembly
    lv2_split_decoder: bool | None = None  # split-conv decoder joins
    lv2_fence: bool | None = None  # U-Net head layout fences

    @property
    def v2_assembly(self) -> bool:
        return self.layout_v2 if self.lv2_assembly is None else self.lv2_assembly

    @property
    def v2_split_decoder(self) -> bool:
        return (
            self.layout_v2
            if self.lv2_split_decoder is None
            else self.lv2_split_decoder
        )

    @property
    def v2_fence(self) -> bool:
        return self.layout_v2 if self.lv2_fence is None else self.lv2_fence


def load_config(path: str) -> Config:
    parser = configparser.RawConfigParser()
    read = parser.read(path)
    if not read:
        raise FileNotFoundError(f"Config file not found: {path}")
    cfg = Config(parser)
    return cfg


def default_config(**overrides) -> Config:
    """In-memory config with all defaults; overrides as SECTION_KEY=value or
    (section, key) tuples via cfg.set."""
    cfg = Config()
    for (section, key), value in _DEFAULTS.items():
        cfg.set(section, key, value)
    for skey, value in overrides.items():
        section, _, key = skey.partition("_")
        # allow e.g. TRAIN_N_FRAMES=4 → ("TRAIN", "N_FRAMES")
        cfg.set(section, key, value)
    return cfg
