"""Micro-benchmark of attention implementations at the fused-window hot shape.

The r3 profile shows the XLA attention path (bhqd,bhkd einsums + softmax)
HBM-bound at ~222 ms/step (27%) of the MAFED window: the [T,T] score/prob
tensors round-trip HBM in forward, remat-recompute, and backward. This
compares, at the exact decoder shapes ([B,H,T,D], causal, left-pad key
mask), fwd and fwd+bwd wall time of:

  xla          in-repo XLA reference (the current window default)
  pallas       in-repo Pallas flash kernel (custom VJP)
  upstream     jax.experimental.pallas.ops.tpu.flash_attention (seq padded
               to a block multiple; r2 found reading its OUTPUT back hangs
               the tunnel — here outputs are consumed on-device and only a
               scalar crosses, which is how real steps use attention)

Timing threads state through the loop (the tunnel dedupes identical
dispatches) and ends with a scalar host transfer.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_attention.py [B] [T]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 336
    H, D = 16, 64
    PAD_T = ((T + 127) // 128) * 128

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    # left padding on the text suffix region like VQA batches: first 20
    # positions of the text (after the 256-token vision prefix) masked out
    mask_np = np.ones((B, T), np.int32)
    mask_np[:, 256 : 256 + 20] = 0
    mask = jnp.asarray(mask_np)

    from mafed_tpu.kernels.attention import dot_product_attention

    def run_xla(q, k, v):
        return dot_product_attention(q, k, v, key_padding_mask=mask, causal=True, impl="xla")

    def run_pallas(q, k, v):
        return dot_product_attention(q, k, v, key_padding_mask=mask, causal=True, impl="pallas")

    fns = {"xla": run_xla, "pallas": run_pallas}

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        pad = PAD_T - T
        # like-for-like with the key-padding-mask semantics of the xla/pallas
        # paths: ONLY keys are masked (segment 2 = attends/attended by
        # nothing real) — every real query row stays segment 1 so masked-
        # position query rows still attend valid keys exactly as the
        # key-padding paths compute them; the [T, PAD_T) pad tail rows are
        # segment 2 (they don't exist in the unpadded paths) and are sliced
        # off the output
        seg_kv_np = np.pad(mask_np, ((0, 0), (0, pad)), constant_values=0)
        seg_kv = jnp.asarray(np.where(seg_kv_np > 0, 1, 2).astype(np.int32))
        seg_q_np = np.pad(np.ones_like(mask_np), ((0, 0), (0, pad)), constant_values=0)
        seg_q = jnp.asarray(np.where(seg_q_np > 0, 1, 2).astype(np.int32))
        bs = BlockSizes(
            block_q=min(128, PAD_T), block_k_major=min(128, PAD_T), block_k=min(128, PAD_T),
            block_b=1,
            block_q_major_dkv=min(128, PAD_T), block_k_major_dkv=min(128, PAD_T),
            block_k_dkv=min(128, PAD_T), block_q_dkv=min(128, PAD_T),
            block_k_major_dq=min(128, PAD_T), block_k_dq=min(128, PAD_T),
            block_q_dq=min(128, PAD_T),
        )

        def run_upstream(q, k, v):
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            o = flash_attention(
                qp, kp, vp,
                segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
                causal=True, sm_scale=1.0 / float(np.sqrt(D)), block_sizes=bs,
            )
            return o[:, :, :T, :]

        fns["upstream"] = run_upstream
    except Exception as exc:  # pragma: no cover
        print(f"upstream kernel unavailable: {type(exc).__name__}: {exc}")

    iters = 8
    # BENCH_INNER=R repeats the step R+1 times INSIDE one jit program
    # (lax.fori_loop threading q), so per-iter time is pure device time —
    # host dispatch / tunnel round-trip artifacts amortize away. Measured
    # need: fwd-only programs are so short (<5 ms) that per-dispatch timing
    # through the tunnel reads a flat ~195 ms regardless of shape.
    inner = int(os.environ.get("BENCH_INNER", "0"))
    # BENCH_CONSUMER=proj feeds the attention output into a [D, D] projection
    # matmul (what every real decoder layer does) instead of a bare sum.
    # CAUTION on fwd-only WALL readings through the remote-TPU tunnel: the
    # xla fwd rows read 80-93 ms/iter at VQA shapes while a jax.profiler
    # trace of the same program shows 1.2 ms/iter of device self-time — the
    # wall is per-dispatch host/tunnel overhead (plausibly the ~350 MB
    # [B,H,T,T] f32 transient's per-call allocation), not compute, and a
    # proj consumer doesn't change it. For cross-impl decisions use device
    # self-time (scripts/profile_window.py summarize over a trace of this
    # step); the r4 numbers live in docs/ARCHITECTURE.md.
    consumer = os.environ.get("BENCH_CONSUMER", "sum")
    w_proj = jnp.asarray(rng.standard_normal((D, D)), jnp.bfloat16)

    def consume(o):
        if consumer == "proj":
            o = jnp.einsum("bhqd,de->bhqe", o, w_proj)
        return jnp.sum(o.astype(jnp.float32))

    for name, fn in fns.items():
        for mode in ("fwd", "grad"):
            # k/v must be jit ARGUMENTS: closure-captured device arrays bake
            # into the program as multi-MB constants, which the remote-
            # compile tunnel turns into minutes-long compiles and a flat
            # ~195 ms/dispatch re-upload tax (same trap bench.py documents)
            if mode == "fwd":
                def step(q, k, v):
                    return consume(fn(q, k, v))
            else:
                def step(q, k, v):
                    return jax.grad(
                        lambda qq: jnp.sum(fn(qq, k, v).astype(jnp.float32) ** 2)
                    )(q).astype(jnp.float32).sum()

            if inner:
                def repeated(q0, k, v, _step=step):
                    def body(i, qq):
                        r = _step(qq, k, v)
                        return qq + (r * 1e-12).astype(qq.dtype)
                    return _step(jax.lax.fori_loop(0, inner, body, q0), k, v)

                jstep = jax.jit(repeated)
                calls, per_call = 2, inner + 1
            else:
                jstep = jax.jit(step)
                calls, per_call = iters, 1
            try:
                t0 = time.perf_counter()
                out = jstep(q, k, v)
                float(out)
                compile_s = time.perf_counter() - t0
                # thread state: q shifts by a tiny multiple of the result
                qq = q
                t0 = time.perf_counter()
                acc = 0.0
                for _ in range(calls):
                    r = jstep(qq, k, v)
                    qq = qq + (r * 1e-12).astype(qq.dtype)
                acc = float(r)
                dt = (time.perf_counter() - t0) / (calls * per_call)
                tag = f" inner={inner}" if inner else ""
                print(f"{name:9s} {mode:4s}: {dt*1e3:8.2f} ms/iter{tag}  (compile {compile_s:.1f}s, chk {acc:.1f})", flush=True)
            except Exception as exc:
                print(f"{name:9s} {mode:4s}: FAILED {type(exc).__name__}: {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
