"""Fused distillation step behavior: pulling the student toward the teacher."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mafed_tpu.core.config import TrainConfig
from mafed_tpu.models import vl_pythia
from mafed_tpu.optim.optimizer import build_optimizer
from mafed_tpu.optim.sched import linear_warmup_schedule
from mafed_tpu.training.step import make_distill_step
from mafed_tpu.training.train_state import TrainState, split_params
from tests.helpers import tiny_model_cfg
from __graft_entry__ import _example_batch


@pytest.mark.slow
def test_distill_only_loss_decreases():
    model_cfg = tiny_model_cfg()
    train_cfg = TrainConfig(
        batch_size=4,
        learning_rate=5e-3,
        optim="adamw",
        replay_coeff=0.0,  # pure distillation
        distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
        distillation_layer_discount=0.5,
        grad_norm=-1,
    )
    params_s = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    params_t = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(7))
    # teacher shares the (frozen) vision tower with the student
    params_t["vision"] = params_s["vision"]

    trainable, frozen = split_params(params_s)
    teacher_trainable, _ = split_params(params_t)
    tx = build_optimizer(train_cfg, trainable, linear_warmup_schedule(5e-3, 1, 10000))
    state = TrainState(jnp.zeros((), jnp.int32), trainable, frozen, tx.init(trainable))

    batch = {k: jnp.asarray(v) for k, v in _example_batch(model_cfg, 4, 16).items()}
    num_layers = model_cfg.num_hidden_layers - 1
    lang_coeffs = jnp.full((num_layers,), 0.5, jnp.float32)

    step = make_distill_step(model_cfg, train_cfg, tx, attn_impl="xla", donate=False)
    losses = []
    for _ in range(12):
        state, m = step(state, teacher_trainable, batch, lang_coeffs)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, f"distill loss did not decrease: {losses}"


def test_distill_loss_zero_when_student_equals_teacher():
    model_cfg = tiny_model_cfg()
    train_cfg = TrainConfig(
        batch_size=2, replay_coeff=0.0, distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="equal",
        learning_rate=0.0, optim="adamw", grad_norm=-1,
    )
    params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    tx = build_optimizer(train_cfg, trainable, linear_warmup_schedule(0.0, 1, 10))
    state = TrainState(jnp.zeros((), jnp.int32), trainable, frozen, tx.init(trainable))
    batch = {k: jnp.asarray(v) for k, v in _example_batch(model_cfg, 2, 12).items()}
    lang_coeffs = jnp.full((model_cfg.num_hidden_layers - 1,), 0.5, jnp.float32)
    step = make_distill_step(model_cfg, train_cfg, tx, attn_impl="xla", donate=False)
    _, m = step(state, trainable, batch, lang_coeffs)  # teacher == student
    assert abs(float(m["loss"])) < 1e-5
    # per-tap distill losses (reference task_{t}/distill_loss_{layer},
    # distillation.py:165): one per tap, all ~0 for an identical teacher
    per_layer = np.asarray(m["distill_layer_losses"])
    assert per_layer.shape == (model_cfg.num_hidden_layers - 1,)
    assert np.all(np.abs(per_layer) < 1e-5)


@pytest.mark.parametrize("fuse_ce_batch", [True, False])
def test_window_step_matches_multisteps_microbatches(fuse_ce_batch):
    """The fused accumulation-window step (n_ce CE microbatches + 1 distill
    microbatch, one optimizer update) must produce the same parameters as the
    reference cadence expressed through optax.MultiSteps: 3 CE microbatch
    steps then 1 distill microbatch step at every_k=4."""
    from mafed_tpu.training.step import make_mafed_window_step, make_train_step

    model_cfg = tiny_model_cfg()
    kw = dict(
        learning_rate=1e-3, optim="adamw", weight_decay=0.01,
        replay_coeff=1.0, distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
        distillation_layer_discount=0.5, grad_norm=2.0,
    )
    n_ce = 3
    params_s = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    params_t = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(7))
    params_t["vision"] = params_s["vision"]
    trainable, frozen = split_params(params_s)
    teacher_trainable, _ = split_params(params_t)

    ce_batches_np = [_example_batch(model_cfg, 4, 16, seed=s) for s in range(n_ce)]
    distill_batch = {k: jnp.asarray(v) for k, v in _example_batch(model_cfg, 4, 16, seed=9).items()}
    lang_coeffs = jnp.full((model_cfg.num_hidden_layers - 1,), 0.5, jnp.float32)

    # --- reference cadence: MultiSteps over 4 microbatches -------------------
    train_cfg_ms = TrainConfig(batch_size=4, accumulate_grad_batches=n_ce + 1, **kw)
    tx_inner = build_optimizer(train_cfg_ms, trainable)
    tx_ms = optax.MultiSteps(tx_inner, every_k_schedule=n_ce + 1)
    state = TrainState(jnp.zeros((), jnp.int32), trainable, frozen, tx_ms.init(trainable))
    ce_step = make_train_step(model_cfg, train_cfg_ms, tx_ms, attn_impl="xla", donate=False)
    from mafed_tpu.training.step import make_distill_step as _mds

    d_step = _mds(model_cfg, train_cfg_ms, tx_ms, attn_impl="xla", donate=False)
    for mb in ce_batches_np:
        state, _ = ce_step(state, {k: jnp.asarray(v) for k, v in mb.items()})
    state, _ = d_step(state, teacher_trainable, distill_batch, lang_coeffs)
    ref_params = state.trainable

    # --- fused window step ----------------------------------------------------
    train_cfg_w = TrainConfig(batch_size=4, accumulate_grad_batches=1, **kw)
    tx_w = build_optimizer(train_cfg_w, trainable)
    state_w = TrainState(jnp.zeros((), jnp.int32), trainable, frozen, tx_w.init(trainable))
    wstep = make_mafed_window_step(
        model_cfg, train_cfg_w, tx_w, n_ce=n_ce, attn_impl="xla",
        donate=False, fuse_ce_batch=fuse_ce_batch,
    )
    ce_stacked = {
        k: jnp.stack([jnp.asarray(mb[k]) for mb in ce_batches_np])
        for k in ce_batches_np[0]
    }
    state_w, metrics = wstep(state_w, teacher_trainable, ce_stacked, distill_batch, lang_coeffs)

    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
        ref_params, state_w.trainable,
    )
    max_diff = max(jax.tree.leaves(diffs))
    assert max_diff < 5e-5, f"window step diverges from MultiSteps cadence: {max_diff}"
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # per-tap losses (the fit loop logs them as task_{t}/distill_loss_{l}):
    # one finite positive value per tap, and their layer-coeff-weighted sum
    # is the distillation term of the distill-batch loss (which additionally
    # carries the replay CE term, so it upper-bounds the sum)
    from mafed_tpu.training.step import layer_coefficients

    per_layer = np.asarray(metrics["distill_layer_losses"], np.float64)
    assert per_layer.shape == (model_cfg.num_hidden_layers - 1,)
    assert np.all(np.isfinite(per_layer)) and np.all(per_layer > 0)
    coeffs = layer_coefficients(
        train_cfg_w.distillation_layer_weighing_strategy,
        train_cfg_w.distillation_layer_discount, per_layer.shape[0],
    )
    weighted = float(np.sum(coeffs * train_cfg_w.distillation_coeff * per_layer))
    assert 0 < weighted < float(metrics["distill_loss"])
