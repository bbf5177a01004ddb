"""Capture + summarize a TPU profile of the fused MAFED window step.

Writes a jax.profiler trace of a few steady-state steps, then parses the
xplane with the tensorboard profile plugin to print the top HLO ops by
self-time — the data behind the kernel-optimization ledger in
docs/ARCHITECTURE.md.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/profile_window.py [out_dir]
"""

from __future__ import annotations

import glob
import os
import sys


def capture(out_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from mafed_tpu.core.config import ModelConfig, TrainConfig
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.optim.optimizer import build_optimizer
    from mafed_tpu.optim.sched import linear_warmup_schedule
    from mafed_tpu.training.step import make_mafed_window_step
    from mafed_tpu.training.train_state import TrainState, split_params
    from __graft_entry__ import _example_batch
    import numpy as np

    model_cfg = ModelConfig()
    train_cfg = TrainConfig(
        batch_size=16,
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
    tx = build_optimizer(train_cfg, trainable, linear_warmup_schedule(5e-5, 100, 10000))
    opt_state = tx.init(trainable)
    state = TrainState(jnp.zeros((), jnp.int32), trainable, frozen, opt_state)

    b = 16
    batch = {k: jax.device_put(v) for k, v in _example_batch(model_cfg, b, 80).items()}
    ce_stack = {
        k: jax.device_put(
            np.stack([_example_batch(model_cfg, b, 80, seed=s)[k] for s in range(3)])
        )
        for k in batch
    }
    # MAFED_PROFILE_VISION=cached profiles the vision-cache steady state
    # (the trainer default; same transform as bench.py)
    if os.environ.get("MAFED_PROFILE_VISION") == "cached":
        from mafed_tpu.data.images import make_normalizer

        normalize = make_normalizer(model_cfg.vision)
        vis_params = {"vision": frozen["vision"]}

        @jax.jit
        def feats(p, px):  # params as ARG (closure capture -> HTTP 413)
            return vl_pythia.get_patch_embeddings(
                p, model_cfg, normalize(px), dtype=jnp.bfloat16, attn_impl="xla"
            )

        batch["patches"] = feats(vis_params, batch.pop("pixels"))
        ce_px = ce_stack.pop("pixels")
        ce_stack["patches"] = jnp.stack([feats(vis_params, ce_px[i]) for i in range(3)])
        jax.block_until_ready(ce_stack["patches"])
    lang_coeffs = jnp.full((model_cfg.num_hidden_layers - 1,), 0.5, jnp.float32)

    step = make_mafed_window_step(model_cfg, train_cfg, tx, n_ce=3)
    state, m = step(state, teacher, ce_stack, batch, lang_coeffs)
    jax.block_until_ready(m["loss"])

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        state, m = step(state, teacher, ce_stack, batch, lang_coeffs)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()
    print(f"trace written to {out_dir}")


def summarize(out_dir: str, top: int = 30, steps: int = 3) -> None:
    import json as _json

    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # older installs
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print("no xplane found")
        return
    xplane = max(xplanes, key=os.path.getmtime)
    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    d = _json.loads(data)  # gviz table
    cols = [c["id"] for c in d["cols"]]
    rows = [
        dict(zip(cols, [cell.get("v") if isinstance(cell, dict) else cell for cell in r["c"]]))
        for r in d["rows"]
    ]

    def val(r):
        return r.get("total_self_time") or 0.0

    total = sum(val(r) for r in rows)
    print(f"total self time: {total/1e3:.1f} ms over {steps} steps -> {total/steps/1e3:.0f} ms/step")
    cats: dict = {}
    for r in rows:
        c = r.get("category") or "?"
        cats[c] = cats.get(c, 0.0) + val(r)
    print("== by category (ms/step) ==")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{t/steps/1e3:9.1f}  {100*t/total:5.1f}%  {c}")
    print(f"== top {top} ops ==")
    for r in sorted(rows, key=val, reverse=True)[:top]:
        fw = (r.get("tf_op_name") or "")[-80:]
        print(
            f"{val(r)/steps/1e3:7.1f}ms {100*val(r)/total:5.1f}% "
            f"{int(r.get('occurrences') or 0):5}x {str(r.get('category'))[:16]:16} "
            f"{str(r.get('bound_by') or ''):7} gf={r.get('model_flop_rate') or 0:7.0f} "
            f"bw={r.get('measured_memory_bw') or 0:6.0f} {fw}"
        )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mafed_profile"
    if not os.environ.get("SKIP_CAPTURE"):
        capture(out)
    summarize(out)
