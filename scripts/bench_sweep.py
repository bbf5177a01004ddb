"""On-TPU sweep of train-step variants (not the headline bench; see bench.py).

Measures the r01 distill-only step and the fused accumulation-window step in
its variants, printing ms/step and examples/sec for each. State is threaded
(donated) through timing iterations — repeated calls with identical buffers
are deduped by the remote tunnel and report absurd times (see
docs/ARCHITECTURE.md measurement notes).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mafed_tpu.core.config import ModelConfig, TrainConfig
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.optim.optimizer import build_optimizer
    from mafed_tpu.optim.sched import linear_warmup_schedule
    from mafed_tpu.training.step import make_distill_step, make_mafed_window_step
    from mafed_tpu.training.train_state import TrainState, split_params
    from __graft_entry__ import _example_batch

    which = set(sys.argv[1:]) or {"distill16", "win_scan", "win_fused", "distill32"}

    model_cfg = ModelConfig()
    base_kw = dict(
        accumulate_grad_batches=1,
        optim="adamw",
        weight_decay=0.01,
        adam_mu_dtype="bfloat16",
        replay_coeff=1.0,
        distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
        distillation_layer_discount=0.5,
    )

    params = vl_pythia.init_params(
        model_cfg, jax.random.PRNGKey(0), dtype=jnp.float32, vision_dtype=jnp.bfloat16
    )
    trainable, frozen = split_params(params)
    teacher = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    num_layers = model_cfg.num_hidden_layers - 1
    lang_coeffs = jnp.full((num_layers,), 0.5, jnp.float32)

    def fresh_state(cfg, tx=None):
        # fresh buffers per variant: donated steps delete their inputs, and
        # the template tree must survive for the next variant
        t = jax.tree.map(jnp.array, trainable)
        tx = tx or build_optimizer(cfg, t, linear_warmup_schedule(5e-5, 100, 10000))
        return tx, TrainState(jnp.zeros((), jnp.int32), t, frozen, tx.init(t))

    def run(name, step_fn, state, args_fn, ex_per_step, iters=10, sync_every_iter=False):
        t0 = time.perf_counter()
        state, m = step_fn(state, *args_fn())
        float(m["loss"])
        compile_s = time.perf_counter() - t0
        start = time.perf_counter()
        for _ in range(iters):
            state, m = step_fn(state, *args_fn())
            if sync_every_iter:
                float(m["loss"])
        # host transfer forces full-chain completion (block_until_ready can
        # return before the last remote dispatch finishes on the tunnel)
        float(m["loss"])
        dt = (time.perf_counter() - start) / iters
        print(
            f"{name}: {dt*1e3:.1f} ms/step, {ex_per_step/dt:.2f} ex/s "
            f"(compile {compile_s:.0f}s, loss {float(m['loss']):.4f})",
            flush=True,
        )

    b = 16
    batch = {k: jax.device_put(v) for k, v in _example_batch(model_cfg, b, 80).items()}
    ce_stack = {
        k: jax.device_put(np.stack([_example_batch(model_cfg, b, 80, seed=s)[k] for s in range(3)]))
        for k in batch
    }

    if "distill16" in which:
        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_distill_step(model_cfg, cfg, tx)
        run("distill b16 (r01 metric)", step, state, lambda: (teacher, batch, lang_coeffs), b)

    if "win_scan" in which:
        cfg = TrainConfig(batch_size=b, remat=True, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3, fuse_ce_batch=False)
        run("window scan(remat) 3xCE16+distill16", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)

    if "win_fused" in which:
        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3, fuse_ce_batch=True, share_vision=True)
        run("window fused CE48+distill16 sharedvis", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)

    if "win_fused_xla" in which:
        # XLA attention for the differentiated passes too: under per-layer
        # remat no [T,T] residual persists across layers, so the memory
        # argument for pallas (custom VJP keeps only o,lse) weakens — and the
        # profile shows the pallas fwd is overhead-bound at these tiny shapes
        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3, attn_impl="xla")
        run("window fused XLA-attn", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)

    if "win_fused_pallas" in which:
        # head-batched flash kernel (grid over batch, heads looped in-kernel)
        # vs the XLA-attention default of the window step
        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3, attn_impl="pallas")
        run("window fused pallas(head-batched)", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)

    if "win_fused_pallas_fullbwd" in which:
        from mafed_tpu.kernels import attention as attn_mod

        attn_mod._PALLAS_BWD_MODE = "always"
        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3, attn_impl="pallas")
        run("window fused pallas fwd+bwd", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)
        attn_mod._PALLAS_BWD_MODE = "auto"

    if "win_fused_nostudentremat" in which:
        # keep the distill student's residuals (b16 pass) instead of
        # rematting: ~3.4GB more HBM for one fewer student fwd recompute
        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3, remat_student=False)
        run("window fused no-student-remat", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)

    if "win_fused_block336" in which:
        from mafed_tpu.kernels import attention as attn_mod

        attn_mod._DEFAULT_BLOCK_Q = 336
        attn_mod._DEFAULT_BLOCK_K = 336
        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3)
        run("window fused pallas block 336", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)
        attn_mod._DEFAULT_BLOCK_Q = 128
        attn_mod._DEFAULT_BLOCK_K = 128

    if "win_fused_block384" in which:
        from mafed_tpu.kernels import attention as attn_mod

        attn_mod._DEFAULT_BLOCK_Q = 384
        attn_mod._DEFAULT_BLOCK_K = 384
        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3)
        run("window fused pallas block 384", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)
        attn_mod._DEFAULT_BLOCK_Q = 128
        attn_mod._DEFAULT_BLOCK_K = 128

    if "win_fused_novis" in which:
        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3, fuse_ce_batch=True, share_vision=False)
        run("window fused CE48+distill16 pervis", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)

    if "win_fused_remat" in which:
        cfg = TrainConfig(batch_size=b, remat=True, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3, fuse_ce_batch=True, share_vision=True)
        run("window fused remat", step, state, lambda: (teacher, ce_stack, batch, lang_coeffs), 4 * b)

    if "ce16" in which:
        from mafed_tpu.training.step import make_train_step

        cfg = TrainConfig(batch_size=b, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_train_step(model_cfg, cfg, tx)
        run("ce b16", step, state, lambda: (batch,), b, iters=20, sync_every_iter=True)

    if "win_multisteps" in which:
        # the runner's real cadence: optax.MultiSteps at microbatch
        # granularity, every 4th microbatch is the distill batch
        import optax

        from mafed_tpu.training.step import make_train_step

        cfg = TrainConfig(batch_size=b, accumulate_grad_batches=4, **{k: v for k, v in base_kw.items() if k != "accumulate_grad_batches"})
        t0_tree = jax.tree.map(jnp.array, trainable)
        tx_inner = build_optimizer(cfg, t0_tree, linear_warmup_schedule(5e-5, 100, 10000))
        tx = optax.MultiSteps(tx_inner, every_k_schedule=4)
        state = TrainState(jnp.zeros((), jnp.int32), t0_tree, frozen, tx.init(t0_tree))
        ce_step = make_train_step(model_cfg, cfg, tx)
        d_step = make_distill_step(model_cfg, cfg, tx)

        def window(state):
            for mb in (batch, batch, batch):
                state, m = ce_step(state, dict(mb))
            state, m = d_step(state, teacher, dict(batch), lang_coeffs)
            return state, m

        t0 = time.perf_counter()
        state, m = window(state)
        jax.block_until_ready(m["loss"])
        compile_s = time.perf_counter() - t0
        iters = 8
        start = time.perf_counter()
        for _ in range(iters):
            state, m = window(state)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - start) / iters
        print(
            f"window MultiSteps 3xCE16+distill16: {dt*1e3:.1f} ms/window, "
            f"{4*b/dt:.2f} ex/s (compile {compile_s:.0f}s, loss {float(m['loss']):.4f})",
            flush=True,
        )

    if "win_fused_b32" in which:
        # headroom probe: same window structure at microbatch 32 (128
        # ex/window) — not the reference cadence, shows batch-scaling room
        b32 = 32
        batch32 = {k: jax.device_put(v) for k, v in _example_batch(model_cfg, b32, 80).items()}
        ce32 = {
            k: jax.device_put(np.stack([_example_batch(model_cfg, b32, 80, seed=s)[k] for s in range(3)]))
            for k in batch32
        }
        cfg = TrainConfig(batch_size=b32, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_mafed_window_step(model_cfg, cfg, tx, n_ce=3)
        run("window fused b32", step, state, lambda: (teacher, ce32, batch32, lang_coeffs), 4 * b32)

    if "distill32" in which:
        b32 = 32
        batch32 = {k: jax.device_put(v) for k, v in _example_batch(model_cfg, b32, 80).items()}
        cfg = TrainConfig(batch_size=b32, **base_kw)
        tx, state = fresh_state(cfg)
        step = make_distill_step(model_cfg, cfg, tx)
        run("distill b32", step, state, lambda: (teacher, batch32, lang_coeffs), b32)


if __name__ == "__main__":
    main()
