"""Remat-policy equivalence: jax.checkpoint save policies over the tagged
layer intermediates (gpt_neox checkpoint_name taps) must not change any
training numerics — they only trade HBM for backward recompute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from mafed_tpu.core.config import ModelConfig, TrainConfig, VisionConfig
from mafed_tpu.models import vl_pythia
from mafed_tpu.optim.optimizer import build_optimizer
from mafed_tpu.optim.sched import linear_warmup_schedule
from mafed_tpu.training.step import make_mafed_window_step, resolve_remat_policy
from mafed_tpu.training.train_state import TrainState, split_params


def test_resolve_remat_policy_names():
    assert resolve_remat_policy("") is None
    assert resolve_remat_policy("full") is None
    for name in ("attn", "attn_qkv", "attn_mlp", "attn_qkv_mlp", "dots"):
        assert resolve_remat_policy(name) is not None
    with pytest.raises(ValueError):
        resolve_remat_policy("bogus")


def test_remat_policies_identical_mafed_window_loss_and_update():
    mc = ModelConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64,
        vision=VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
    )
    base = dict(
        batch_size=4, accumulate_grad_batches=1, optim="adamw", weight_decay=0.01,
        replay_coeff=1.0, distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
    )
    params = vl_pythia.init_params(mc, jax.random.PRNGKey(0))
    tr, fz = split_params(params)
    teacher = jax.tree.map(lambda x: x.astype(jnp.bfloat16), tr)
    batch = _example_batch(mc, 4, 16)
    ce = {k: np.stack([_example_batch(mc, 4, 16, seed=s)[k] for s in range(3)]) for k in batch}
    lc = jnp.full((mc.num_hidden_layers - 1,), 0.5, jnp.float32)

    outs = {}
    for pol in ("", "attn", "attn_qkv_mlp"):
        cfg = TrainConfig(**base, remat_policy=pol)
        tx = build_optimizer(cfg, tr, linear_warmup_schedule(1e-3, 2, 100))
        st = TrainState(jnp.zeros((), jnp.int32), tr, fz, tx.init(tr))
        step = make_mafed_window_step(mc, cfg, tx, n_ce=3, donate=False)
        new_st, m = step(st, teacher, ce, batch, lc)
        outs[pol] = (float(m["loss"]), float(m["grad_norm"]),
                     float(jnp.sum(jnp.abs(new_st.trainable["projector"]["fc1"]["weight"]))))
    ref = outs[""]
    for pol, got in outs.items():
        assert got == pytest.approx(ref, abs=1e-5), (pol, got, ref)


def test_mafed_window_patches_with_scan_fallback():
    """Vision-cached window batches must work with fuse_ce_batch=False too:
    the lax.scan body consumes each microbatch's own patches (regression for
    merged ce_patches leaking into per-microbatch passes)."""
    mc = ModelConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64,
        vision=VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
    )
    cfg = TrainConfig(
        batch_size=4, accumulate_grad_batches=1, optim="adamw", weight_decay=0.01,
        replay_coeff=1.0, distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
    )
    params = vl_pythia.init_params(mc, jax.random.PRNGKey(0))
    tr, fz = split_params(params)
    teacher = jax.tree.map(lambda x: x.astype(jnp.bfloat16), tr)
    rng = np.random.default_rng(0)
    vis = mc.vision

    def patches_batch(seed):
        from __graft_entry__ import _example_batch

        b = _example_batch(mc, 4, 16, seed=seed)
        del b["pixels"]
        b["patches"] = rng.standard_normal((4, vis.num_patches, vis.embed_dim)).astype(np.float32)
        return b

    batch = patches_batch(9)
    ce = {k: np.stack([patches_batch(s)[k] for s in range(3)]) for k in batch}
    lc = jnp.full((mc.num_hidden_layers - 1,), 0.5, jnp.float32)
    tx = build_optimizer(cfg, tr, linear_warmup_schedule(1e-3, 2, 100))
    state = TrainState(jnp.zeros((), jnp.int32), tr, fz, tx.init(tr))

    losses = {}
    for fuse in (True, False):
        step = make_mafed_window_step(mc, cfg, tx, n_ce=3, donate=False, fuse_ce_batch=fuse)
        _, m = step(state, teacher, ce, batch, lc)
        losses[fuse] = float(m["loss"])
    assert np.isfinite(losses[True]) and np.isfinite(losses[False])
    assert losses[True] == pytest.approx(losses[False], abs=1e-4)
