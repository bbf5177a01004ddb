"""PRNG discipline: a single seed fans out into named streams.

Replaces the reference's global seeding (pl.seed_everything, train.py:38;
np.random.default_rng for memory sampling, replay.py:25) with explicit,
reproducible JAX keys plus a numpy RNG for host-side sampling.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def seed_everything(seed: int) -> None:
    np.random.seed(seed)
    try:  # torch only matters for parity tests
        import torch

        torch.manual_seed(seed)
    except Exception:
        pass


def key_for(seed: int, *names: str) -> jax.Array:
    """Derive a jax PRNG key from a seed and a path of stream names."""
    h = hashlib.sha256(("/".join(names)).encode()).digest()
    fold = int.from_bytes(h[:4], "little")
    return jax.random.fold_in(jax.random.PRNGKey(seed), fold)


def host_rng(seed: int) -> np.random.Generator:
    """Numpy RNG for host-side (data-order / memory-sampling) randomness.

    Matches the reference's np.random.default_rng(opts.seed) usage so memory
    subsets are reproducible under a fixed seed (replay.py:38-41).
    """
    return np.random.default_rng(seed)
