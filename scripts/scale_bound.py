"""AOT compile-for-topology scaling bound for the v5e-8 slice (VERDICT r4 #1).

The >=5x target (BASELINE.json) applies to an 8-chip v5e slice, but only one
chip is reachable from this environment. Instead of assuming a DP scaling
factor, this script compiles the PRODUCTION training programs for a real
v5e-8 topology without hardware — jax.experimental.topologies builds
compile-only TpuDevices and libtpu's compiler runs locally — and extracts
compiler facts:

  (a) 410M fused MAFED window, dp8 mesh, vision-cache steady state
      (bench.py's exact headline workload at global batch 8 x 16):
      per-chip HBM from compiled.memory_analysis() + per-step collective
      bytes from the SPMD-partitioned HLO.
  (b) 1B fused MAFED window, dp4 x tp2 mesh (the production 1B layout,
      docs/SCALING.md): same facts — turning the "1B fits at tp2"
      arithmetic into a compiler-verified memory budget, and exposing the
      TP all-gathers/reduce-scatters the 410M DP program doesn't have.

From (a) it derives a worst-case scaling-efficiency FLOOR: every collective
priced at the most pessimistic ICI assumption (a single one-way 45 GB/s
link, line topology — no wraparound at 8 chips, no overlap with compute),
divided against the MEASURED single-chip window time from BENCH_r04.json.
DP adds no other device work (per-chip batch and program are identical to
the single-chip bench), so

    efficiency_floor = t_window / (t_window + sum_i t_coll_i^pessimistic)

bounds the slice throughput from below:

    ex_per_s(v5e-8) >= 8 x ex_per_s(chip) x efficiency_floor.

Writes SCALE_BOUND.json at the repo root and prints a summary. Reference
anchor: the reference's DP is nominal-only (mafed/train.py:289-290,
README.md:47 "not been tested for distributed training"); this bound is the
evidence the projection in docs/ARCHITECTURE.md rides on.

Run: python scripts/scale_bound.py            (~2-6 min of XLA compiles)
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# ---------------------------------------------------------------------------
# Hardware constants (documented public specs; jax-ml.github.io/scaling-book)
# ---------------------------------------------------------------------------
V5E_HBM_BYTES = 16 * (1 << 30)  # 16 GiB per chip
V5E_BF16_PEAK = 197e12
# One ICI link, one direction. v5e slices below the 16x16 pod dims are
# MESHES (no wraparound), so an 8-chip 2x4 slice has line axes. The floor
# prices every collective over a single one-way link — the weakest credible
# assumption (real slices have 2 axes, bidirectional links, and XLA
# overlaps collectives with compute).
ICI_ONEWAY_LINK_BYTES_S = 4.5e10

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")
# The opcode token in an HLO op line: ` all-reduce(` (instruction NAMES like
# %all-reduce.69 are followed by `.` or ` = `, never `(`, and operand
# references appear as `(%all-reduce.69` — prefixed by %, also no match).
_COLL_RE = re.compile(
    r"\s(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(-start)?\("
)
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")
_GROUPS_LIST_RE = re.compile(r"replica_groups=\{\{([0-9, ]+)\}")


def _shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_collectives(hlo: str, while_trip: int = 1):
    """Per-chip collective ops from SPMD-partitioned HLO.

    Returns kind, LHS shard bytes (variadic tuple all-reduces sum every
    element), participant count (iota [groups,size] or explicit list), and
    an execution-count multiplier: ops whose op_name metadata places them
    inside a `while` body (the layer scans — XLA reduces the per-layer grad
    slices inside the backward scan) execute once per scan iteration, so
    their traffic is multiplied by while_trip (= num_hidden_layers for the
    decoder scans, the only while loops in the steady-state window).
    """
    out = []
    for line in hlo.splitlines():
        if " = " not in line:
            continue
        m = _COLL_RE.search(line.split(" = ", 1)[1])
        if not m:
            continue
        after_eq = line.split(" = ", 1)[1]
        kind = m.group(1)
        lhs = after_eq[: m.start()]
        bytes_ = _shape_bytes(lhs)
        if bytes_ == 0:
            continue
        n = None
        gi = _GROUPS_IOTA_RE.search(line)
        if gi:
            n = int(gi.group(2))
        else:
            gl = _GROUPS_LIST_RE.search(line)
            if gl:
                n = len([t for t in gl.group(1).split(",") if t.strip()])
        in_while = "/while/" in line
        out.append(
            {
                "op": kind,
                "lhs_bytes": bytes_,
                "participants": n or 8,
                "executions": while_trip if in_while else 1,
            }
        )
    return out


def collective_cost_s(ops, link_bytes_s: float = ICI_ONEWAY_LINK_BYTES_S):
    """Pessimistic serial ICI time: per-chip traffic per op (line/ring algo
    bytes) over ONE one-way link, summed with zero compute overlap.

      all-reduce of per-chip buffer V over n:   2 * V * (n-1)/n
      all-gather producing V_full:                  V_full * (n-1)/n
      reduce-scatter producing V_shard:             V_shard * (n-1)
      collective-permute of V:                      V
      all-to-all of V:                              V * (n-1)/n
    """
    total_traffic = 0.0
    per_op = []
    for op in ops:
        v, n = op["lhs_bytes"], max(op["participants"], 2)
        if op["op"] == "all-reduce":
            t = 2.0 * v * (n - 1) / n
        elif op["op"] == "all-gather":
            t = v * (n - 1) / n
        elif op["op"] == "reduce-scatter":
            t = float(v * (n - 1))
        elif op["op"] == "collective-permute":
            t = float(v)
        else:  # all-to-all
            t = v * (n - 1) / n
        t *= op.get("executions", 1)
        total_traffic += t
        per_op.append({**op, "ici_traffic_bytes": int(t)})
    return total_traffic / link_bytes_s, total_traffic, per_op


# ---------------------------------------------------------------------------
# Program construction (mirrors bench.py's workload exactly)
# ---------------------------------------------------------------------------

def _tree_bytes(tree) -> int:
    import jax

    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(tree)
    )


def _with_shardings(tree, mesh, spec_fn):
    """ShapeDtypeStructs carrying NamedShardings for AOT lowering."""
    import jax
    from jax.sharding import NamedSharding

    def place(path, leaf):
        spec = spec_fn(path, leaf)
        return jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype, sharding=NamedSharding(mesh, spec)
        )

    return jax.tree_util.tree_map_with_path(place, tree)


def _path_strs(path):
    return tuple(str(getattr(k, "key", k)) for k in path)


def build_case(preset: str, mesh_shape, global_batch: int, topo, n_ce: int = 3,
               text_len: int = 80):
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mafed_tpu.core.config import TrainConfig, model_config_for_preset
    from mafed_tpu.core.mesh import param_partition_spec
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.models.vl_pythia import n_vision_tokens
    from mafed_tpu.optim.optimizer import build_optimizer
    from mafed_tpu.optim.sched import linear_warmup_schedule
    from mafed_tpu.training.step import make_mafed_window_step
    from mafed_tpu.training.train_state import TrainState, split_params

    model_cfg = model_config_for_preset(preset)
    train_cfg = TrainConfig(
        batch_size=global_batch,
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
    mesh = topologies.make_mesh(topo, mesh_shape, ("data", "model"))

    # Shapes only — no weights materialize (the whole point: the 1B f32
    # params + opt state never exist on this host)
    params_sds = jax.eval_shape(
        lambda: vl_pythia.init_params(
            model_cfg, jax.random.PRNGKey(0),
            dtype=jnp.float32, vision_dtype=jnp.bfloat16,
        )
    )
    trainable_sds, frozen_sds = split_params(params_sds)
    frozen_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, jnp.bfloat16), frozen_sds
    )

    def param_spec(path, leaf):
        return param_partition_spec(_path_strs(path), leaf)

    trainable_sh = _with_shardings(trainable_sds, mesh, param_spec)
    frozen_sh = _with_shardings(frozen_sds, mesh, param_spec)
    teacher_sh = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.ShapeDtypeStruct(
            x.shape, jnp.bfloat16, sharding=NamedSharding(mesh, param_spec(p, x))
        ),
        trainable_sds,
    )

    tx = build_optimizer(
        train_cfg, trainable_sds, linear_warmup_schedule(5e-5, 100, 10000)
    )
    opt_sds = jax.eval_shape(tx.init, trainable_sds)
    # Optimizer moments copy the trainable tree leaf-for-leaf; their TP
    # layout in production is inherited from the sharded params at tx.init.
    # Reproduce it by shape-matching each moment leaf to a trainable leaf's
    # spec (shapes are unique per layout class here: col/row/vocab layouts
    # all have distinct dims); scalars and counters replicate.
    shape_to_spec = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(trainable_sds):
        shape_to_spec.setdefault(leaf.shape, param_spec(path, leaf))

    def opt_spec(path, leaf):
        return shape_to_spec.get(leaf.shape, P())

    opt_sh = _with_shardings(opt_sds, mesh, opt_spec)

    rep = NamedSharding(mesh, P())
    state_sds = TrainState(
        jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
        trainable_sh, frozen_sh, opt_sh,
    )

    # vision-cache steady state: bf16 patch features ride with the batch
    b, n_vis, vdim = global_batch, n_vision_tokens(model_cfg), model_cfg.vision.embed_dim
    batch_spec = NamedSharding(mesh, P("data"))
    window_spec = NamedSharding(mesh, P(None, "data"))

    def batch_sds(lead):
        sh = window_spec if lead else batch_spec
        pre = (n_ce,) if lead else ()
        return {
            "input_ids": jax.ShapeDtypeStruct(pre + (b, text_len), jnp.int32, sharding=sh),
            "attention_mask": jax.ShapeDtypeStruct(pre + (b, text_len), jnp.int32, sharding=sh),
            "labels": jax.ShapeDtypeStruct(pre + (b, text_len), jnp.int32, sharding=sh),
            "patches": jax.ShapeDtypeStruct(pre + (b, n_vis, vdim), jnp.bfloat16, sharding=sh),
        }

    lang_sds = jax.ShapeDtypeStruct(
        (model_cfg.num_hidden_layers - 1,), jnp.float32, sharding=rep
    )

    step = make_mafed_window_step(model_cfg, train_cfg, tx, n_ce=n_ce, donate=True)
    print(f"[{preset} mesh={mesh_shape}] lowering + compiling for v5e-8...",
          file=sys.stderr, flush=True)
    compiled = step.lower(
        state_sds, teacher_sh, batch_sds(True), batch_sds(False), lang_sds
    ).compile()

    ma = compiled.memory_analysis()
    hlo = compiled.as_text()
    # the steady-state window's only while loops are the decoder layer scans
    # (vision tower cached out), so in-loop collectives run L times
    ops = parse_collectives(hlo, while_trip=model_cfg.num_hidden_layers)
    t_coll, traffic, per_op = collective_cost_s(ops)

    # Resident bytes accounting is GLOBAL tree bytes; per chip = shard bytes.
    # For the dp cases params replicate (full bytes per chip); TP leaves
    # divide by the model-axis size where sharded.
    def per_chip_bytes(tree_sh):
        total = 0
        for leaf in jax.tree.leaves(tree_sh):
            n = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
            spec = leaf.sharding.spec
            for dim_spec in spec:
                for ax in (dim_spec if isinstance(dim_spec, tuple) else (dim_spec,)):
                    if ax is not None:
                        n //= mesh.shape[ax]
            total += n
        return total

    resident = {
        "trainable_params": per_chip_bytes(trainable_sh),
        "frozen_vision_bf16": per_chip_bytes(frozen_sh),
        "opt_state": per_chip_bytes(opt_sh),
        "teacher_bf16": per_chip_bytes(teacher_sh),
        "window_batches": per_chip_bytes(batch_sds(True)) + per_chip_bytes(batch_sds(False)),
    }
    # Analytic ceiling on the DP gradient reduction, independent of HLO
    # parsing: ring/line all-reduce of the FULL f32 gradient shard per dp
    # group (the observed programs reduce in bf16 — XLA hoists the reduce
    # across the f32 cast — so this analytic figure is a strict
    # overestimate of the real traffic).
    n_dp = mesh_shape[0]
    grad_shard_f32 = per_chip_bytes(trainable_sh)  # trainable is f32
    analytic_traffic = 2.0 * grad_shard_f32 * (n_dp - 1) / n_dp
    analytic = {
        "grad_bytes_f32_per_chip": int(grad_shard_f32),
        "ici_traffic_bytes": int(analytic_traffic),
        "pessimistic_time_s": round(analytic_traffic / ICI_ONEWAY_LINK_BYTES_S, 6),
    }
    peak_hbm = (
        sum(resident.values())
        + ma.temp_size_in_bytes
        + ma.generated_code_size_in_bytes
    )
    return {
        "preset": preset,
        "mesh_shape": list(mesh_shape),
        "global_batch": global_batch,
        "n_ce": n_ce,
        "text_len": text_len,
        "examples_per_window_global": (n_ce + 1) * global_batch,
        "memory_analysis": {
            "argument_size_in_bytes": ma.argument_size_in_bytes,
            "output_size_in_bytes": ma.output_size_in_bytes,
            "temp_size_in_bytes": ma.temp_size_in_bytes,
            "alias_size_in_bytes": ma.alias_size_in_bytes,
            "generated_code_size_in_bytes": ma.generated_code_size_in_bytes,
        },
        "resident_bytes_per_chip": resident,
        "peak_hbm_bytes_per_chip": int(peak_hbm),
        "peak_hbm_gib_per_chip": round(peak_hbm / (1 << 30), 3),
        "hbm_budget_gib": round(V5E_HBM_BYTES / (1 << 30), 1),
        "fits_hbm": bool(peak_hbm < V5E_HBM_BYTES),
        "collectives": {
            "count": len(ops),
            "by_kind": {
                k: sum(1 for o in ops if o["op"] == k)
                for k in sorted({o["op"] for o in ops})
            },
            "lhs_bytes_total": int(sum(o["lhs_bytes"] for o in ops)),
            "ici_traffic_bytes_per_chip": int(traffic),
            "pessimistic_serial_time_s": round(t_coll, 6),
            "largest_ops": sorted(
                per_op, key=lambda o: -o["ici_traffic_bytes"]
            )[:6],
        },
        "analytic_dp_grad_allreduce": analytic,
    }


def main():
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    # The axon sitecustomize (single-chip TPU tunnel) hijacks the PJRT TPU
    # plugin: topology compiles then RPC through the ~10 MB/s tunnel
    # (observed: the 410M compile parked at <2% CPU for 10+ minutes vs ~3
    # minutes locally). Re-exec with the axon site scrubbed so the local
    # libtpu compiler runs; no devices are needed for compile-only.
    if "axon" in os.environ.get("PYTHONPATH", "") and not os.environ.get(
        "MAFED_SCALE_BOUND_SCRUBBED"
    ):
        import subprocess

        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        )
        env.pop("JAX_PLATFORMS", None)
        env["MAFED_SCALE_BOUND_SCRUBBED"] = "1"
        raise SystemExit(
            subprocess.call([sys.executable, "-u", os.path.abspath(__file__)], env=env)
        )
    from jax.experimental import topologies

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")

    # (a) the headline: 410M dp8, per-chip batch 16 == bench.py single-chip
    case_410m = build_case("410m", (8, 1), global_batch=8 * 16, topo=topo)
    # (b) the 1B production layout: dp4 x tp2, per-dp-shard batch 16
    case_1b = build_case("1b", (4, 2), global_batch=4 * 16, topo=topo)

    # Scaling-efficiency floor for the dp8 headline, priced against the
    # MEASURED single-chip window time (same per-chip program + batch)
    with open(os.path.join(REPO, "BENCH_r04.json")) as f:
        bench = json.load(f)
    bench = bench.get("parsed", bench)  # driver wraps the JSON line
    ex_per_s_chip = float(bench["value"])
    t_window = 64.0 / ex_per_s_chip  # (n_ce+1) x 16 examples per window
    # price the floor with the WORSE of the two estimates: the HLO-observed
    # per-op accounting (bf16 reduces, while-trip-corrected) and the
    # analytic full-f32-gradient all-reduce (a strict traffic overestimate)
    t_coll = max(
        case_410m["collectives"]["pessimistic_serial_time_s"],
        case_410m["analytic_dp_grad_allreduce"]["pessimistic_time_s"],
    )
    eff_floor = t_window / (t_window + t_coll)
    slice_ex_per_s_floor = 8 * ex_per_s_chip * eff_floor
    vs_baseline_chip = float(bench["vs_baseline"])
    slice_vs_a100_floor = 8 * vs_baseline_chip * eff_floor

    result = {
        "topology": "v5e:2x4 (8 chips, compile-only devices; "
                    "jax.experimental.topologies + libtpu local AOT compile)",
        "ici_assumptions": {
            "link_oneway_bytes_per_s": ICI_ONEWAY_LINK_BYTES_S,
            "model": "every collective serialized over ONE one-way link, "
                     "line (no-wraparound) algorithm bytes, zero overlap "
                     "with compute — the pessimistic floor; real v5e-8 has "
                     "2 mesh axes with bidirectional links and XLA overlaps "
                     "collectives",
        },
        "cases": {"mafed_window_410m_dp8": case_410m,
                  "mafed_window_1b_dp4tp2": case_1b},
        "scaling_bound_410m_dp8": {
            "measured_chip_examples_per_s": ex_per_s_chip,
            "measured_window_time_s": round(t_window, 4),
            "pessimistic_collective_time_s": round(t_coll, 4),
            "efficiency_floor": round(eff_floor, 4),
            "slice_examples_per_s_floor": round(slice_ex_per_s_floor, 1),
            "slice_vs_a100_baseline_floor": round(slice_vs_a100_floor, 3),
            "meets_5x_target": bool(slice_vs_a100_floor >= 5.0),
            "note": "per-chip program and batch are IDENTICAL to the "
                    "single-chip bench under dp8 (batch shards over 'data', "
                    "params replicated), so the only added device cost is "
                    "the gradient all-reduce priced above; host input is "
                    "patch_idx+text rows (KB/step) and does not bind",
        },
    }
    out = os.path.join(REPO, "SCALE_BOUND.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["scaling_bound_410m_dp8"], indent=1))
    print(f"410m dp8 peak HBM/chip: {case_410m['peak_hbm_gib_per_chip']} GiB; "
          f"1b dp4xtp2 peak HBM/chip: {case_1b['peak_hbm_gib_per_chip']} GiB")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
