"""Captioning pretrain entry point.

Parity: mafed/pretrain_vlpythia.py — dataclass argument surface
(ModelArguments / DataArguments / PretrainConfig), frozen vision encoder,
Pythia tokenizer with pad=eos, then the TPU-native PretrainTrainer.

    python -m mafed_tpu.pretrain_vlpythia --manifest train.jsonl \
        --eval_manifest val.jsonl --output_dir storage/pretrain
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass

from mafed_tpu.core.config import ModelConfig
from mafed_tpu.core.logging import LOGGER
from mafed_tpu.data.tokenizer import build_tokenizer
from mafed_tpu.models import vl_pythia
from mafed_tpu.models.weights import load_pretrained
from mafed_tpu.pretrain.dataset import PretrainDataset
from mafed_tpu.pretrain.trainer import PretrainConfig, PretrainTrainer


@dataclass
class ModelArguments:
    """Parity: pretrain_vlpythia.py:16-37."""

    model_name: str = "EleutherAI/pythia-410m"
    vision_encoder_name: str = "timm/eva02_large_patch14_clip_224"
    select_layer: int = -2
    select_feature: str = "patch"
    tokenizer_name: str = "EleutherAI/pythia-410m"
    tokenizer_truncation_side: str = "right"
    tokenizer_padding_side: str = "right"
    tokenizer_add_special_tokens: bool = True
    allow_tokenizer_fallback: bool = False
    model_max_length: int = 100


@dataclass
class DataArguments:
    """Parity: pretrain_vlpythia.py:39-48."""

    dataset_path: str = ""
    dataset_cache_dir: str = ""
    root_dataset_path: str = ""
    train_dataset_subset: str = "pretrain"
    eval_dataset_subset: str = "pretrain"
    manifest: str = ""
    eval_manifest: str = ""


def compute_trainable_params(params) -> int:
    """Log trainable vs frozen param counts (utils/vl_pythia.py parity)."""
    import numpy as np

    from mafed_tpu.training.train_state import split_params

    trainable, frozen = split_params(params)
    n_train = sum(int(np.prod(x.shape)) for x in __import__("jax").tree.leaves(trainable))
    n_frozen = sum(int(np.prod(x.shape)) for x in __import__("jax").tree.leaves(frozen))
    LOGGER.info("trainable params: %.1fM, frozen (vision): %.1fM", n_train / 1e6, n_frozen / 1e6)
    return n_train


def train(argv=None):
    from mafed_tpu.core.cache import enable_compilation_cache

    # persistent XLA cache + JAX_PLATFORMS env honored over site-pinned
    # config (same contract as the CL CLI, mafed_tpu/train.py)
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    for dc in (ModelArguments, DataArguments, PretrainConfig):
        for f in dataclasses.fields(dc):
            default = f.default if f.default is not dataclasses.MISSING else None
            if isinstance(default, bool):
                parser.add_argument(f"--{f.name}", action="store_true", default=default)
            elif isinstance(default, tuple):
                elem = int if all(isinstance(x, int) for x in default) else float
                parser.add_argument(f"--{f.name}", nargs="+", type=elem, default=list(default))
            else:
                parser.add_argument(f"--{f.name}", type=type(default) if default is not None else str, default=default)
    ns = parser.parse_args(argv)

    def pick(dc):
        names = {f.name for f in dataclasses.fields(dc)}
        kwargs = {k: v for k, v in vars(ns).items() if k in names}
        if dc is PretrainConfig and isinstance(kwargs.get("betas"), list):
            kwargs["betas"] = tuple(kwargs["betas"])
        return dc(**kwargs)

    model_args, data_args, train_args = pick(ModelArguments), pick(DataArguments), pick(PretrainConfig)

    # must precede ANY jax computation (load_pretrained/init_params below)
    from mafed_tpu.core.dist import maybe_initialize_distributed

    maybe_initialize_distributed(train_args)

    if os.path.isdir(model_args.model_name):
        params, model_cfg = load_pretrained(model_args.model_name)
    else:
        model_cfg = ModelConfig(vision_encoder_name=model_args.vision_encoder_name,
                                select_layer=model_args.select_layer,
                                select_feature=model_args.select_feature)
        import jax

        params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(train_args.seed))
        LOGGER.warning("model dir %s not found; random init", model_args.model_name)
    compute_trainable_params(params)

    tokenizer = build_tokenizer(
        model_args.tokenizer_name,
        model_max_length=model_args.model_max_length,
        padding_side=model_args.tokenizer_padding_side,
        truncation_side=model_args.tokenizer_truncation_side,
        allow_fallback=model_args.allow_tokenizer_fallback,
    )

    train_ds = PretrainDataset(
        tokenizer, model_cfg.vision, manifest_path=data_args.manifest or None,
        model_max_length=model_args.model_max_length,
    )
    eval_ds = (
        PretrainDataset(
            tokenizer, model_cfg.vision, manifest_path=data_args.eval_manifest,
            model_max_length=model_args.model_max_length,
        )
        if data_args.eval_manifest
        else None
    )

    from mafed_tpu.core.mesh import make_mesh

    mesh = make_mesh(tuple(train_args.mesh_shape), ("data", "model"))
    trainer = PretrainTrainer(
        model_cfg, train_args, train_ds, eval_ds, tokenizer, init_params=params, mesh=mesh
    )
    return trainer.train()


if __name__ == "__main__":
    train()
