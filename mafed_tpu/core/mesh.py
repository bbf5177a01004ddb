"""Device mesh + sharding helpers.

TPU-native replacement for the reference's vestigial torch.distributed paths
(mafed/methods/replay.py:46, mafed/utils/eval_utils.py:135): a 2D
(data, model) jax.sharding.Mesh; the batch dimension shards over "data",
weight matrices optionally shard over "model" for the 1B scale. Gradient and
metric reductions become XLA collectives over ICI inserted by the compiler.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Sequence[int] = (-1, 1),
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh; a -1 in mesh_shape absorbs the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = max(1, len(devices) // known)
    total = int(np.prod(shape))
    if total > len(devices):
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {len(devices)}")
    mesh_devices = np.asarray(devices[:total]).reshape(shape)
    return Mesh(mesh_devices, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_partition_spec(path: tuple, leaf, model_axis: str = "model") -> P:
    """Heuristic tensor-parallel layout for VL-Pythia params.

    Megatron-style: column-parallel for QKV / h->4h (shard output features),
    row-parallel for attn-out / 4h->h (shard input features), vocab-parallel
    embeddings. Falls back to replication for vectors and norms. XLA inserts
    the psum/all-gather collectives implied by these layouts.

    Layer-stacked tensors (leading [depth] dim from the lax.scan layout:
    weights [L, in, out], biases [L, out]) shard their FEATURE dims, never
    the stack dim. Column-parallel biases shard with their output features;
    row-parallel biases replicate (their outputs are psum'd).
    """
    names = "/".join(str(p) for p in path)
    ndim = getattr(leaf, "ndim", 0)
    if ndim < 2:
        return P()
    if "patch_embed" in names:  # conv-style [ph, pw, 3, out]; tiny — replicate
        return P()
    stacked = ndim >= 3 or (ndim == 2 and names.endswith("bias"))
    is_bias = names.endswith("bias")

    def col() -> P:  # shard output features (last dim)
        return P(*([None] * (ndim - 1)), model_axis)

    def row() -> P:  # shard input features (second-to-last dim); bias replicated
        if is_bias:
            return P()
        return P(*([None] * (ndim - 2)), model_axis, None)

    # weights stored [*, in_features, out_features]
    if any(k in names for k in ("query_key_value", "dense_h_to_4h", "w1", "w2", "q_proj", "k_proj", "v_proj", "fc1")):
        return col()
    if any(k in names for k in ("attention/dense", "dense_4h_to_h", "w3", "proj", "fc2")):
        return row()
    if "embed_in" in names or "embed_out" in names:
        if stacked:
            return P()
        return P(None, model_axis) if "embed_out" in names else P(model_axis, None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh according to param_partition_spec."""
    def place(path, leaf):
        spec = param_partition_spec(tuple(str(k.key) if hasattr(k, "key") else str(k) for k in path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def globalize_scalar_leaves(tree, mesh: Mesh):
    """Re-place eager-created non-NamedSharding leaves (optimizer counters,
    clip grad_norm, ScheduleState) onto the mesh's replicated sharding.

    optax init / eager scalar construction lands on the default device
    (SingleDeviceSharding — host-local under multi-process). Jitted updates
    replace them with global outputs, but a COLLECTIVE orbax save or restore
    that happens before any post-(re)init update — resume templates,
    mid-epoch preemption bundles — raises 'Cannot serialize host local
    jax.Array'. Values are deterministic across processes, so a replicated
    device_put of the host value is safe.
    """
    rep = NamedSharding(mesh, P())

    def _globalize(x):
        sh = getattr(x, "sharding", None)
        if sh is None or isinstance(sh, NamedSharding):
            return x
        return jax.device_put(np.asarray(x), rep)

    return jax.tree.map(_globalize, tree)
