"""Micro-bench: pallas flash attention fwd+bwd block-size variants at the
canonical decoder shape (b16, 16 heads, 336 tokens, d64, causal, key-padding
mask), plus the non-causal vision shape (b16, 16 heads, 256, d64, no mask).

State threading: fresh random q each iter via a carried key to defeat the
remote tunnel's identical-buffer dedupe.
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mafed_tpu.kernels import attention as A

    variants = [(128, 128), (384, 384), (128, 384), (384, 128), (256, 256)]
    if len(sys.argv) > 1:
        variants = [tuple(map(int, v.split("x"))) for v in sys.argv[1:]]

    def bench(name, b, h, t, d, causal, masked, bq, bk):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, h, t, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, t, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, t, d), jnp.bfloat16)
        mask = jnp.ones((b, t), jnp.int32)
        if masked:
            mask = mask.at[:, : t // 4].set(0)

        @jax.jit
        def fwd_bwd(q, k, v):
            def loss(q, k, v):
                o = A.dot_product_attention(
                    q, k, v,
                    key_padding_mask=mask if masked else None,
                    causal=causal, impl="pallas", block_q=bq, block_k=bk,
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)

            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            # thread state: next q depends on grads (defeats dedupe)
            return l, q + 1e-6 * grads[0]

        l, q = fwd_bwd(q, k, v)
        jax.block_until_ready(l)
        iters = 50
        start = time.perf_counter()
        for _ in range(iters):
            l, q = fwd_bwd(q, k, v)
        jax.block_until_ready(l)
        dt = (time.perf_counter() - start) / iters
        print(f"{name} bq{bq} bk{bk}: {dt*1e6:.0f} us/iter", flush=True)

    for bq, bk in variants:
        bench("decoder b16h16t336d64 causal+mask", 16, 16, 336, 64, True, True, bq, bk)
    for bq, bk in variants:
        bench("vision  b16h16t256d64 plain      ", 16, 16, 256, 64, False, False, bq, bk)


if __name__ == "__main__":
    main()
