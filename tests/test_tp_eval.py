"""Generative validation of a TENSOR-PARALLEL-trained model (VERDICT r3 #5).

The 1B config trains TP on 16GB chips (docs/ARCHITECTURE.md); the reference
evaluates after every task at every scale (mafed/train.py:43-70), so TP
params must flow through validate_vqa too. Two mechanisms, both on the
8-virtual-device (4, 2) mesh:

  * single-controller: the jitted decoder runs DIRECTLY on TP-sharded
    params — XLA partitions the decode over the model axis; tokens match
    the unsharded decode bit-for-bit
  * multi-process pods: localize_params first gathers TP leaves to
    replicated collectively (validate.gather_to_replicated), after which
    per-process placement works; gather is value-identical
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafed_tpu.core.mesh import batch_sharding, make_mesh, shard_params
from mafed_tpu.evaluation.decode import make_greedy_decoder
from mafed_tpu.evaluation.validate import gather_to_replicated, localize_params, validate_vqa
from mafed_tpu.models import vl_pythia
from tests.helpers import tiny_model_cfg


def _tp_cfg():
    from mafed_tpu.core.config import ModelConfig, VisionConfig

    # heads divisible by the model axis (2) so attention shards
    return ModelConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2, num_attention_heads=8,
        intermediate_size=256, rotary_pct=0.25,
        vision=VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
    )


def _decode_batch(cfg, b=4, t=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(1, 200, size=(b, t)).astype(np.int32),
        "attention_mask": np.ones((b, t), np.int32),
        "pixels": rng.integers(0, 256, size=(b, cfg.vision.img_size, cfg.vision.img_size, 3)).astype(np.uint8),
    }


def test_decoder_on_tp_sharded_params_matches_unsharded(eight_devices):
    cfg = _tp_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(0))
    decoder = make_greedy_decoder(cfg, max_new_tokens=5, eos_token_id=0, dtype=jnp.float32, attn_impl="xla")
    batch = _decode_batch(cfg)

    plain = np.asarray(decoder(params, batch))

    mesh = make_mesh((4, 2), ("data", "model"))
    tp_params = shard_params(params, mesh)
    # the 1B layout really shards: at least one leaf is not replicated
    assert any(
        hasattr(x, "is_fully_replicated") and not x.is_fully_replicated
        for x in jax.tree.leaves(tp_params)
    )
    sh = batch_sharding(mesh)
    tp_batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
    sharded = np.asarray(decoder(tp_params, tp_batch))
    np.testing.assert_array_equal(plain, sharded)


class _FakeTokenizer:
    def batch_decode(self, toks, skip_special_tokens=True):
        return [" ".join(str(int(t)) for t in row if int(t) != 0) for row in np.asarray(toks)]


def _val_loader(cfg, n_batches=3, b=4):
    batches = []
    for i in range(n_batches):
        batch = _decode_batch(cfg, b=b, seed=10 + i)
        batch["answers"] = [["1", "1", "2"]] * b
        batch["qids"] = [f"q{i}_{j}" for j in range(b)]
        batches.append(batch)
    return batches


def test_validate_vqa_on_tp_sharded_params(eight_devices):
    cfg = _tp_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(1))
    decoder = make_greedy_decoder(cfg, max_new_tokens=4, eos_token_id=0, dtype=jnp.float32, attn_impl="xla")
    tok = _FakeTokenizer()

    plain_log, plain_results = validate_vqa(
        params, decoder, _val_loader(cfg), tok, batch_size=4
    )

    mesh = make_mesh((4, 2), ("data", "model"))
    tp_params = shard_params(params, mesh)
    tp_log, tp_results = validate_vqa(
        tp_params, decoder, _val_loader(cfg), tok, batch_size=4,
        sharding=batch_sharding(mesh),
    )
    assert tp_log["valid/n_ex"] == plain_log["valid/n_ex"] == 12
    assert tp_log["valid/acc"] == pytest.approx(plain_log["valid/acc"])
    assert tp_results == plain_results


def test_gather_to_replicated_values_and_layout(eight_devices):
    cfg = _tp_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(2))
    mesh = make_mesh((4, 2), ("data", "model"))
    tp_params = shard_params(params, mesh)
    gathered = gather_to_replicated(tp_params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(gathered),
    ):
        assert b.sharding.is_fully_replicated, path
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))
    # replicated-only trees pass through untouched
    again = gather_to_replicated(gathered)
    assert again is gathered


def test_localize_params_handles_tp_sharded_tree(eight_devices):
    """The multi-process decode prelude: TP-sharded global params localize
    via the collective gather instead of raising (pre-r4 behavior)."""
    cfg = _tp_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(3))
    mesh = make_mesh((4, 2), ("data", "model"))
    tp_params = shard_params(params, mesh)
    target = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    local = localize_params(tp_params, target)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(local),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))
