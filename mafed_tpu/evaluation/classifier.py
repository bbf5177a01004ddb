"""Legacy classifier-VQA evaluation path.

Capability parity with the reference's classifier-head metrics
(mafed/utils/eval_utils.py:29-68,107-158): argmax-vs-soft-target scoring
and a batched validation loop. Metric reduction across a mesh uses psum
(the TPU-native replacement for the NCCL all_reduce at :135-138).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_score_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-sample soft score of the argmax answer (eval_utils.py:29-42)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.take_along_axis(targets, pred[:, None], axis=-1)[:, 0]


class VQAAccuracy:
    """Streaming argmax-vs-soft-target accuracy (eval_utils.py:45-68)."""

    def __init__(self) -> None:
        self.total_score = 0.0
        self.total = 0

    def update(self, logits, targets) -> None:
        if logits.shape[0] == 0:
            return
        self.total_score += float(jnp.sum(compute_score_with_logits(logits, targets)))
        self.total += int(logits.shape[0])

    __call__ = update

    def compute(self) -> float:
        return self.total_score / max(self.total, 1)


def all_reduce_metrics(n_ex: float, loss_sum: float, score_sum: float, mesh=None) -> Tuple[float, float, float]:
    """Sum metrics across the data axis of a mesh (psum over ICI); identity
    on a single host. Replaces dist.all_reduce (eval_utils.py:135-138)."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return n_ex, loss_sum, score_sum
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    vec = jnp.asarray([n_ex, loss_sum, score_sum], jnp.float32)

    @jax.jit
    def reduce(v):
        return shard_map(
            lambda x: jax.lax.psum(x, "data"), mesh=mesh,
            in_specs=P(), out_specs=P(),
        )(v)

    out = np.asarray(reduce(vec))
    return float(out[0]), float(out[1]), float(out[2])
