"""Typed configuration with argparse + JSON-override parity.

The reference parses ~45 CLI flags (mafed/train.py:304-478) and merges a JSON
config where explicit CLI flags win per-key (mafed/utils/misc.py:26-35). We
keep identical flag names and merge semantics so reference run scripts port
unchanged, but back them with typed dataclasses.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class VisionConfig:
    """EVA-02 ViT encoder configuration.

    Defaults describe timm's ``eva02_large_patch14_clip_224`` — the frozen
    encoder used by every reference experiment (mafed/train.py:477).
    """

    name: str = "timm/eva02_large_patch14_clip_224"
    backbone: str = "eva02"  # "eva02" (timm Eva) or "clip" (HF CLIPVisionModel)
    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4 * 2 / 3  # SwiGLU keeps params ~const vs GELU 4x
    use_rot_pos_emb: bool = True
    use_abs_pos_emb: bool = True
    class_token: bool = True
    qkv_fused: bool = False
    swiglu_mlp: bool = True
    scale_mlp: bool = True  # LayerNorm inside the MLP (EVA-02 "sub-LN")
    scale_attn_inner: bool = True  # LayerNorm on attn output pre-projection
    rope_temperature: float = 10000.0  # timm RotaryEmbeddingCat default
    # timm ref_feat_shape side: rope positions are rescaled by ref/feat per
    # axis when a pretrained model runs at a different img_size (the
    # reference's create_eva2_model(img_size=336) path keeps the pretrained
    # (16, 16) reference grid — mafed/model/vl_pythia.py:163-172). None means
    # ref == feat (the canonical 224 config, mafed/train.py:477).
    rope_ref_feat_side: Optional[int] = None
    layer_norm_eps: float = 1e-6
    # image preprocessing (CLIP stats; mafed/train.py:95-104)
    crop_pct: float = 0.9
    mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    std: tuple = (0.26862954, 0.26130258, 0.27577711)

    @property
    def num_patches(self) -> int:
        side = self.img_size // self.patch_size
        return side * side

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


@dataclass
class ModelConfig:
    """VL-Pythia model configuration.

    Field names mirror the HF GPT-NeoX config JSON so reference model-config
    files (config/vlpythia-base.json) load directly via ``from_json``.
    """

    vocab_size: int = 50304
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "gelu"
    rotary_pct: float = 0.25
    rotary_emb_base: float = 10000.0
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    use_parallel_residual: bool = True
    attention_bias: bool = True
    tie_word_embeddings: bool = False
    initializer_range: float = 0.02
    eos_token_id: int = 0
    # Vision side
    vision_encoder_name: str = "timm/eva02_large_patch14_clip_224"
    select_layer: int = -2
    select_feature: str = "patch"
    vision: VisionConfig = field(default_factory=VisionConfig)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_ndims(self) -> int:
        return int(self.head_dim * self.rotary_pct)

    @classmethod
    def from_json(cls, path: str) -> "ModelConfig":
        with open(path) as f:
            data = json.load(f)
        return cls.from_dict(data)

    @classmethod
    def from_dict(cls, data: dict) -> "ModelConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in data.items() if k in names and k != "vision"}
        if "rotary_emb_base" in kwargs:
            kwargs["rotary_emb_base"] = float(kwargs["rotary_emb_base"])
        cfg = cls(**kwargs)
        if isinstance(data.get("vision"), dict):
            cfg.vision = VisionConfig(**data["vision"])
        return cfg

    def to_dict(self) -> dict:
        out = dataclasses.asdict(self)
        return out


# Model scale presets: VL-Pythia-EVA 160M / 410M / 1B
# (reference: mafed/utils/download_models.py:6-24; Pythia scales).
MODEL_PRESETS = {
    "160m": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072),
    "410m": dict(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16, intermediate_size=4096),
    "1b": dict(hidden_size=2048, num_hidden_layers=16, num_attention_heads=8, intermediate_size=8192),
}


def model_config_for_preset(preset: str, **overrides: Any) -> ModelConfig:
    kwargs = dict(MODEL_PRESETS[preset])
    kwargs.update(overrides)
    return ModelConfig(**kwargs)


@dataclass
class TrainConfig:
    """Full training/CL configuration. Flag names match mafed/train.py:304-478."""

    # Required-ish paths
    output_dir: str = "output"
    model_config: str = ""
    # Checkpointing
    checkpoint: Optional[str] = None
    resume_from_checkpoint: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    checkpoint_extension: str = ".safetensors"
    init_ckpt_extension: str = ".safetensors"
    # Preprocessing
    max_txt_len: int = 60
    # Training
    batch_size: int = 32
    val_batch_size: int = 32
    accumulate_grad_batches: int = 1
    learning_rate: float = 5e-5
    lr_mul: float = 10.0
    lr_schedule: str = "triangular"
    epochs: list = field(default_factory=lambda: [15, 15])
    optim: str = "adam"
    betas: list = field(default_factory=lambda: [0.9, 0.98])
    dropout: float = 0.1
    weight_decay: float = 0.0
    grad_norm: float = 2.0
    warmup_perc: float = 0.1
    patience: int = 5
    n_workers: int = 4
    pin_mem: bool = False
    gpus: int = 1  # kept for CLI parity; device count comes from the mesh
    start_task_idx: int = 0
    exp: str = "question_types"
    # CL
    seed: int = 42
    tasks: Optional[list] = None
    cl_method: str = "naive"
    reg_lambda: float = 1.0
    # EWC Fisher + anchor params dtype. f32 doubles the model size in HBM
    # (fisher + old params); "bfloat16" halves it — required headroom at the
    # 1B scale, where f32 EWC state (~8GB) cannot sit next to Adam state on
    # a 16GB chip. The penalty is still accumulated in f32.
    ewc_state_dtype: str = "float32"
    cl_memory: int = 4000
    replay_coeff: float = 1.0
    replay_interval: int = 4
    # Feature distillation
    distillation_modality_weighing_strategy: str = "equal"
    distillation_layer_weighing_strategy: str = "single"
    distillation_coeff: float = 1.0
    distillation_layer_discount: float = 0.9
    distillation_layer: Optional[int] = None
    distillation_loss: str = "mse"
    cls_distillation: bool = False
    # Logging
    run_entity: Optional[str] = None
    run_project: str = "continual-vl-pythia-finetune"
    run_group: Optional[str] = None
    run_name: Optional[str] = None
    # Model
    model_type: str = "vlpythia"
    model_name: str = "storage/models/vl-pythia-eva-1b"
    tokenizer_name: str = "EleutherAI/pythia-410m"
    # opt-in ONLY: byte-level tokenizer when the real one is unavailable
    # (changes the vocabulary — synthetic/test runs, never real training)
    allow_tokenizer_fallback: bool = False
    vision_encoder_name: str = "timm/eva02_large_patch14_clip_224"
    # Data locations (reference: config/train-vqa-base-cl-local-vlpythia.json)
    data_dir: str = "storage/data/VQA"
    train_img_dirs: list = field(default_factory=list)
    val_img_dirs: list = field(default_factory=list)
    test_img_dirs: list = field(default_factory=list)
    question_task_ids: str = ""
    val_num_workers: int = 4
    valid_steps: int = 75
    # TPU-specific (new, no reference counterpart)
    mesh_shape: list = field(default_factory=lambda: [-1, 1])  # (data, model)
    mesh_axis_names: list = field(default_factory=lambda: ["data", "model"])
    # force jax.distributed.initialize() (multi-host pods; coordinator env
    # vars also trigger it — see core/dist.py)
    distributed_init: bool = False
    # mid-task resume bundles (params + best + orbax optimizer state, several
    # GB at 410M) are written every N epochs; 0 disables. Epoch-granular
    # resume only restarts from the last saved bundle.
    resume_bundle_every: int = 1
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    adam_mu_dtype: Optional[str] = None  # "bfloat16" halves first-moment memory (1B scale)
    text_pad_multiple: int = 16  # bucket question lengths for shape stability
    val_max_batches: Optional[int] = None
    remat: bool = False
    # jax.checkpoint policy for rematerialized decoder layers (window steps
    # and remat=True): '' = plain per-layer remat; 'attn' saves attention
    # outputs (skips recomputing the HBM-bound attention subgraph in
    # backward); see training/step.resolve_remat_policy for the full set.
    remat_policy: str = ""
    # Restrict the training lm_head + CE to the last `label_tail` text
    # positions. Under the CL layout (left padding; labels = -100 on the
    # question, answer⊕EOS as a suffix) the loss is bit-identical while the
    # [B, T, vocab] projection shrinks ~60%. collate_train validates the
    # invariant per batch. 0 disables (pretraining captions supervise every
    # position and set 0).
    label_tail: int = 32
    # fuse each gradient-accumulation window into ONE jit step (training/
    # step.py window steps): numerically equivalent to optax.MultiSteps over
    # the microbatches (tested) but pays one optimizer update + dispatch per
    # window. Falls back to per-microbatch MultiSteps when a strategy's
    # replay cadence can't fold into windows (replay_interval < accum).
    fused_window: bool = True
    # disk cache of frozen vision-tower features (data/vision_cache.py),
    # primed once per unique image; steady-state train/eval steps then skip
    # the EVA-02 tower AND host JPEG decode entirely. Bit-identical
    # gradients (the tower is frozen and the transform deterministic).
    vision_cache: bool = True
    vision_cache_dir: Optional[str] = None  # default: {output_dir}/vision_cache
    # HBM budget for the per-task device-resident feature table
    # (data/vision_table.py): when a task's unique images (train + replay
    # memory) fit, the loader ships 4-byte row indices instead of ~0.5 MB
    # feature blocks and the step gathers rows on device — removing the
    # per-epoch re-streaming of identical features. Tasks over budget fall
    # back to streaming. 0 disables. Requires vision_cache.
    device_vision_table_mb: int = 1024
    # row storage for the device vision table: "bfloat16" (default —
    # value-identical to the streamed features) or "int8" (per-patch
    # symmetric quantization + f32 scale: ~2x rows per MB of budget and ~2x
    # less gather traffic at <=0.8%/element error into a TRAINABLE
    # projector; for budget-constrained tasks that would otherwise fall
    # back to streaming)
    vision_table_dtype: str = "bfloat16"
    # Teacher-state cache policy (data/teacher_cache.py): the frozen
    # per-task teacher's hidden states over the fixed memory set are primed
    # once per task transition and the steady-state distill step skips the
    # teacher forward entirely (99.8 -> 103.8 ex/s/chip step-isolated at
    # 410M).
    #   "auto" (default) — engage ONLY when the primed states fit the
    #     --device_teacher_table_mb HBM table: the step win with KB-scale
    #     wire traffic (memory batches carry 4-byte t_idx rows). Memory
    #     sets over budget keep the in-step early-exited teacher — never
    #     the disk-streaming tier, whose ~15.8 MB/example t_hs rows cost
    #     ~410 MB/s/chip sustained disk+PCIe at canonical 410M shapes.
    #   "on" — always prime; over-budget sets stream from disk (a net win
    #     only on bandwidth-rich hosts — measured: integrated MAFED epochs
    #     collapse 12x through a ~30 MB/s transport while the step gains 4%).
    #   "off" — in-step teacher always. Bool True/False mean "on"/"off".
    teacher_state_cache: str = "auto"
    teacher_cache_dir: Optional[str] = None  # default: {output_dir}/teacher_cache
    # HBM budget for the device-resident TEACHER-STATE table
    # (teacher_cache.DeviceTeacherTable): with --teacher_state_cache, a
    # memory set whose primed states fit this budget ships to HBM once per
    # task transition and memory batches carry 4-byte t_idx rows — the
    # cache's +4% step win without its streaming-bandwidth tax. Memory sets
    # over budget use the streaming TeacherStateView (the opt-in trade
    # above). 0 forces streaming.
    device_teacher_table_mb: int = 4096
    # host->device transfer pipelining (data/prefetch.py); 2 measured best
    # on the tunneled single chip, tune upward on real hosts
    prefetch_depth: int = 2
    log_every: int = 50
    profile_dir: Optional[str] = None  # capture a jax.profiler trace of steps 10-20

    def replace(self, **kwargs: Any) -> "TrainConfig":
        return dataclasses.replace(self, **kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, data: dict) -> "TrainConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in names})


def _add_bool_flag(parser: argparse.ArgumentParser, name: str, default: bool) -> None:
    # default-True flags (e.g. fused_window) need a --no_<name> off switch;
    # store_true alone could never disable them from the CLI
    parser.add_argument(f"--{name}", dest=name, action="store_true", default=default)
    parser.add_argument(f"--no_{name}", dest=name, action="store_false")


def build_arg_parser() -> argparse.ArgumentParser:
    """CLI surface mirroring mafed/train.py:304-478 (same flag names)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None, help="JSON config file")
    defaults = TrainConfig()
    for f in dataclasses.fields(TrainConfig):
        flag = f"--{f.name}"
        default = getattr(defaults, f.name)
        if f.name in ("epochs", "betas", "tasks", "train_img_dirs", "val_img_dirs", "test_img_dirs", "mesh_shape", "mesh_axis_names"):
            typ = str if f.name in ("tasks", "mesh_axis_names", "train_img_dirs", "val_img_dirs", "test_img_dirs") else (int if f.name in ("epochs", "mesh_shape") else float)
            parser.add_argument(flag, nargs="+", type=typ, default=default)
        elif isinstance(default, bool):
            _add_bool_flag(parser, f.name, default)
        elif isinstance(default, int):
            parser.add_argument(flag, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(flag, type=float, default=default)
        else:
            parser.add_argument(flag, type=str, default=default)
    return parser


def parse_with_config(parser: argparse.ArgumentParser, argv: Optional[list] = None) -> TrainConfig:
    """argparse + JSON merge with CLI-wins-per-key semantics.

    Parity: mafed/utils/misc.py:26-35 — any key in the JSON config that was
    not explicitly passed on the command line is taken from the JSON.
    """
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    args = parser.parse_args(argv)
    if args.config is not None:
        with open(args.config) as f:
            config_args = json.load(f)
        override_keys = {arg[2:].split("=")[0] for arg in argv if arg.startswith("--")}
        # --no_<flag> negations override the underlying <flag> key
        override_keys |= {k[3:] for k in override_keys if k.startswith("no_")}
        for k, v in config_args.items():
            if k not in override_keys:
                setattr(args, k, v)
    data = vars(args)
    data.pop("config", None)
    return TrainConfig.from_dict(data)
