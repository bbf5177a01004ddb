"""Jit-compiled training steps — one fused region per CL method.

TPU-first redesign of the reference's eager train loop
(vqa_cont_learner.py:213-236 + methods/*.py):

  * ONE compiled step per method; image normalization (uint8 -> CLIP
    stats), vision encoder, projector, decoder, loss, backward, clip,
    optimizer update all fuse into a single XLA program with donated state.
  * gradient accumulation is a lax.scan over microbatches inside the step
    (reference: PL accumulate_grad_batches=4), averaging gradients.
  * EWC quadratic penalty (methods/ewc.py:105-127) is a term inside the
    differentiated loss — not a Python-side hook.
  * feature distillation (methods/distillation.py:84-166) runs teacher and
    student in the SAME compiled step: the teacher is a frozen param pytree
    (no grads, bf16), its forward shares the vision features with the
    student — the reference pays two full vision passes per replay batch,
    this pays one.
  * adaptive modality weights (distillation_loss_weights.py:91-146) use the
    zero-perturbation trick: grad of the loss w.r.t. a zero tensor added to
    each layer's residual stream equals d(loss)/d(hidden_states[layer]).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mafed_tpu.constants import NUM_VISION_TOKENS
from mafed_tpu.core.config import ModelConfig, TrainConfig
from mafed_tpu.data.images import prep_pixels
from mafed_tpu.models import vl_pythia
from mafed_tpu.training.train_state import TrainState, merge_params


def _prep_pixels(batch: Dict[str, jax.Array], cfg: ModelConfig, dtype) -> jax.Array:
    return prep_pixels(batch, cfg.vision, dtype)


def resolve_remat_policy(name: str):
    """Map TrainConfig.remat_policy to a jax.checkpoint policy.

    '' / 'full': plain per-layer remat (save only the scan carry; recompute
    everything in backward). The named policies additionally SAVE selected
    layer intermediates (checkpoint_name tags in gpt_neox.layer_fn), trading
    HBM for remat recompute FLOPs:
      'attn'      — attention outputs ([B,T,H]/layer): skips recomputing the
                    whole attention subgraph (qkv matmul, rotary, softmax
                    einsums — the HBM-bound part of the layer) in backward
      'attn_qkv'  — + post-QKV projections (3x[B,T,H]/layer)
      'attn_mlp'  — + MLP up-projections (4x[B,T,H]/layer): backward then
                    recomputes nothing but layernorms/gelu
      'dots'      — jax's dots_with_no_batch_dims_saveable (every weight
                    matmul output)
    """
    if not name or name == "full":
        return None
    named = {
        "attn": ("attn_out",),
        "attn_qkv": ("attn_out", "qkv"),
        "attn_mlp": ("attn_out", "mlp_up"),
        "attn_qkv_mlp": ("attn_out", "qkv", "mlp_up"),
    }
    if name in named:
        return jax.checkpoint_policies.save_only_these_names(*named[name])
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy '{name}'")


def _ce_loss(trainable, frozen, cfg: ModelConfig, batch, dtype, attn_impl, remat=False, patches=None, label_tail=None, remat_policy=None):
    """remat=True rematerializes decoder layers during backward (per-layer
    jax.checkpoint inside the layer scan — NOT a whole-forward checkpoint,
    which would pointlessly recompute the frozen vision tower too).

    Batches carrying cached "patches" (data/vision_cache.py) skip the frozen
    vision tower entirely — the projector still differentiates."""
    if patches is None:
        patches = batch.get("patches")
        if patches is not None:
            patches = patches.astype(dtype)
    params = merge_params(trainable, frozen)
    pixel_values = _prep_pixels(batch, cfg, dtype) if patches is None else None
    # frozen vision tower -> XLA fused attention (faster fwd, no
    # residuals since it sits behind stop_gradient)
    return vl_pythia.forward(
        params, cfg, batch["input_ids"], pixel_values, batch["attention_mask"], batch["labels"],
        patch_embeddings=patches,
        dtype=dtype, attn_impl=attn_impl, vision_attn_impl="xla",
        loss_only=True, remat_layers=remat, remat_policy=remat_policy,
        label_tail=label_tail,
    ).loss


def ewc_penalty(trainable, ewc_state, reg_lambda: float) -> jax.Array:
    """0.5 * lambda * sum(F * (theta - theta*)^2)  (ewc.py:105-127)."""
    fisher, old = ewc_state

    def term(f, p, o):
        return jnp.sum(f * jnp.square(p.astype(jnp.float32) - o.astype(jnp.float32)))

    terms = jax.tree.map(term, fisher, trainable, old)
    return 0.5 * reg_lambda * sum(jax.tree.leaves(terms))


def make_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    tx,
    *,
    with_ewc: bool = False,
    attn_impl: str = "auto",
    donate: bool = True,
) -> Callable:
    """Standard CE step (naive / ER current-task & memory batches / EWC).

    Gradient accumulation lives OUTSIDE this function as optax.MultiSteps at
    microbatch granularity — required to reproduce the reference's replay
    cadence, where every replay_interval-th MICRObatch inside an
    accumulation window is a memory batch (vqa_cont_learner.py:216 under PL
    accumulate_grad_batches), so one optimizer step blends task and
    replay/distill gradients exactly as the reference does.
    """
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
    tail = getattr(train_cfg, "label_tail", None) or None
    policy = resolve_remat_policy(getattr(train_cfg, "remat_policy", ""))

    def step(state: TrainState, batch: Dict[str, jax.Array], ewc_state=None):
        def loss_fn(trainable):
            loss = _ce_loss(trainable, state.frozen, model_cfg, batch, dtype, attn_impl, remat=train_cfg.remat, label_tail=tail, remat_policy=policy)
            if with_ewc and ewc_state is not None:
                loss = loss + ewc_penalty(trainable, ewc_state, train_cfg.reg_lambda)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.trainable)

        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax_apply_updates(state.trainable, updates)
        new_state = TrainState(state.step + 1, trainable, state.frozen, opt_state)
        metrics = {"loss": loss, "grad_norm": _grad_norm_metric(grads, opt_state)}
        return new_state, metrics

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


# small local helpers so optax isn't imported at module top in jit bodies
def optax_apply_updates(params, updates):
    import optax

    return optax.apply_updates(params, updates)


def optax_global_norm(tree) -> jax.Array:
    import optax

    return optax.global_norm(tree)


def _grad_norm_metric(grads, new_opt_state) -> jax.Array:
    """Pre-clip global grad norm for metrics — read from the clip transform's
    recorded state instead of recomputing the full-tree reduction. Under
    optax.MultiSteps this is the norm at the last accumulation boundary.
    Falls back to recomputing when clipping is disabled."""
    from mafed_tpu.optim.optimizer import last_grad_norm

    try:
        return last_grad_norm(new_opt_state)
    except ValueError:
        return optax_global_norm(grads)


def _merge_window(x):
    """Merge a [n_mb, B, ...] microbatch stack to [n_mb*B, ...] with the
    BATCH dim major, so a 'data'-sharded B stays sharded through the merge.

    GSPMD cannot express the output sharding of reshape([n_mb, B_sharded]
    -> [n_mb*B]) — output shards would interleave microbatches — so the
    direct reshape makes XLA all-gather the stack and run the merged pass
    REPLICATED on every chip: per-chip compute and activation memory at
    GLOBAL batch size. (Caught by the v5e-8 AOT compile,
    scripts/scale_bound.py: the dp8 410M window exceeded 16 GB HBM.)
    Swapping to [B, n_mb, ...] first makes the merge a pure local reshape:
    device k's output rows are exactly its input rows. Row order changes,
    but every consumer reduces a per-sample mean, which is
    permutation-invariant; text and patch/pixel stacks merge through this
    same function, so row alignment between them is preserved.
    """
    return x.swapaxes(0, 1).reshape((-1,) + x.shape[2:])


def make_ce_window_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    tx,
    *,
    with_ewc: bool = False,
    attn_impl: str = "auto",
    donate: bool = True,
    remat: bool = True,
) -> Callable:
    """One jit step = a FULL accumulation window of CE microbatches (naive /
    EWC / ER windows, including ER windows whose replay positions were
    swapped for memory batches — all positions are plain CE).

    step(state, batches, ewc_state=None) where batches is a batch pytree with
    a leading [n_mb] microbatch dim. Equivalent to optax.MultiSteps over the
    microbatches: per-sample losses are length-normalized and microbatches
    share a size, so the CE mean over the concatenated n_mb*b rows equals the
    mean of per-microbatch means (= averaged gradients), and the optimizer
    (clip -> adamw -> schedule) applies once per window in both cases. The
    fused form pays ONE optimizer update + grad-norm reduction per window and
    skips MultiSteps' per-microbatch accumulator read/write (a full f32
    gradient pytree of HBM traffic per microbatch).

    attn_impl="auto" resolves to XLA attention here: the window always runs
    per-layer remat, so no [T,T] attention residual persists across layers —
    pallas flash's memory advantage is moot, and at VQA lengths (~336
    tokens, head_dim 64) its many tiny kernel programs are overhead-bound
    (profiled ~6% MXU); XLA's fused attention measured 948 -> 814 ms on the
    MAFED window (v5e).
    """
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
    if attn_impl == "auto":
        attn_impl = "xla"
    tail = getattr(train_cfg, "label_tail", None) or None
    policy = resolve_remat_policy(getattr(train_cfg, "remat_policy", ""))

    def step(state: TrainState, batches, ewc_state=None):
        merged = jax.tree.map(_merge_window, batches)

        def loss_fn(trainable):
            # remat: the n_mb*b-row fused pass keeps per-layer residuals only
            loss = _ce_loss(
                trainable, state.frozen, model_cfg, merged, dtype, attn_impl,
                remat=train_cfg.remat or remat, label_tail=tail, remat_policy=policy,
            )
            if with_ewc and ewc_state is not None:
                # MultiSteps adds the penalty to every microbatch loss and
                # averages — identical to adding it once here
                loss = loss + ewc_penalty(trainable, ewc_state, train_cfg.reg_lambda)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax_apply_updates(state.trainable, updates)
        new_state = TrainState(state.step + 1, trainable, state.frozen, opt_state)
        return new_state, {"loss": loss, "grad_norm": _grad_norm_metric(grads, opt_state)}

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


# ---------------------------------------------------------------------------
# Feature distillation (MAFED)
# ---------------------------------------------------------------------------

def distillation_layers(strategy: str, num_hidden_layers: int, distillation_layer: Optional[int]) -> List[int]:
    """Which hidden_states indices to distill.

    Parity: distillation_loss_weights.py:81-84 with the constructor rules at
    :33-43 — a valid `distillation_layer` forces the 'single' strategy; the
    layer count is the decoder's num_hidden_layers - 1 (train.py:133).
    """
    if strategy == "cumulative":
        if distillation_layer is None:
            raise ValueError("cumulative layer weighting needs distillation_layer")
        return list(range(distillation_layer))
    if distillation_layer is not None and 0 <= distillation_layer < num_hidden_layers:
        return [distillation_layer]
    if strategy == "single":
        raise ValueError("'single' layer weighting needs a valid distillation_layer")
    return list(range(num_hidden_layers))


def layer_coefficients(strategy: str, gamma: float, num_layers: int) -> np.ndarray:
    """Per-layer loss weights (distillation_loss_weights.py:49-60)."""
    if strategy == "single":
        return np.ones((1,), np.float32)
    if strategy == "equal":
        return np.full((num_layers,), 1.0 / num_layers, np.float32)
    # discounted / cumulative: gamma^distance, nearest-to-top weighted highest
    distances = np.arange(num_layers, 0, -1, dtype=np.float32)
    coeffs = gamma ** distances
    return (coeffs / coeffs.sum()).astype(np.float32)


def modality_masks(attention_mask: jax.Array, num_vision_tokens: int = NUM_VISION_TOKENS) -> Tuple[jax.Array, jax.Array]:
    """(lang_mask, image_mask) over [vision ++ text] (distillation.py:134-144)."""
    bsz, txt_len = attention_mask.shape
    zeros = jnp.zeros((bsz, num_vision_tokens), attention_mask.dtype)
    ones = jnp.ones((bsz, num_vision_tokens), attention_mask.dtype)
    lang = jnp.concatenate([zeros, attention_mask], axis=1)
    image = jnp.concatenate([ones, jnp.zeros_like(attention_mask)], axis=1)
    return lang, image


def _masked_token_loss(h: jax.Array, h_past: jax.Array, mask: jax.Array, kind: str) -> jax.Array:
    """Masked per-token distance, averaged over unmasked tokens.

    h, h_past: [..., T, D]; mask: [..., T]. MSE: ||h-h'||^2/D per token
    (distillation.py:237-249); cosine: 1 - cos(h, h') (:226-235).
    """
    h32 = h.astype(jnp.float32)
    p32 = h_past.astype(jnp.float32)
    if kind == "mse":
        tok = jnp.mean(jnp.square(h32 - p32), axis=-1)
    elif kind == "cosine":
        hn = h32 / jnp.maximum(jnp.linalg.norm(h32, axis=-1, keepdims=True), 1e-8)
        pn = p32 / jnp.maximum(jnp.linalg.norm(p32, axis=-1, keepdims=True), 1e-8)
        tok = 1.0 - jnp.sum(hn * pn, axis=-1)
    else:
        raise ValueError(kind)
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m, axis=(-2, -1)), 1.0)
    return jnp.sum(tok * m, axis=(-2, -1)) / denom


def make_distill_loss_fn(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    *,
    attn_impl: str = "auto",
    remat_student: bool = False,
) -> Callable:
    """Build the fused student+teacher MAFED replay loss.

    Returns loss_fn(trainable, frozen, teacher_trainable, batch, lang_coeffs)
    -> (loss, per_layer) where lang_coeffs is a [num_distill_layers] array of
    language-modality weights in [0,1] (from the balanced constant, the
    adaptive estimator, or — for the 'equal' strategy — ignored in favor of
    in-graph token counts) and per_layer is the modality-weighted distill
    loss per tap BEFORE layer coeffs (the quantity the reference logs as
    task_{t}/distill_loss_{layer}, distillation.py:163-165).
    """
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
    num_hl = model_cfg.num_hidden_layers - 1  # train.py:133
    layers = distillation_layers(
        train_cfg.distillation_layer_weighing_strategy, num_hl, train_cfg.distillation_layer,
    )
    layer_coeffs = jnp.asarray(
        layer_coefficients(
            "single" if len(layers) == 1 and train_cfg.distillation_layer is not None
            else train_cfg.distillation_layer_weighing_strategy,
            train_cfg.distillation_layer_discount,
            len(layers),
        )
    )
    layers_arr = tuple(layers)
    if train_cfg.distillation_coeff != 0 and not layers_arr:
        raise ValueError(
            "distillation_coeff != 0 but the distillation layer list is empty "
            "(cumulative strategy with distillation_layer=0?)"
        )
    # deepest tap both forwards must reach; 0 = embeddings only (pure-replay
    # ablations with distillation_coeff=0 never read the teacher at all)
    deepest_tap = max(layers_arr) if layers_arr else 0
    strategy = train_cfg.distillation_modality_weighing_strategy
    loss_kind = train_cfg.distillation_loss
    replay_coeff = train_cfg.replay_coeff
    distill_coeff = train_cfg.distillation_coeff
    cls_distill = train_cfg.cls_distillation

    n_vis = model_cfg.vision.num_patches  # 256 for EVA-02-L/14 @224
    tail = getattr(train_cfg, "label_tail", None) or None
    student_policy = resolve_remat_policy(getattr(train_cfg, "remat_policy", ""))

    def loss_fn(trainable, frozen, teacher_trainable, batch, lang_coeffs, patches=None):
        lang_mask, image_mask = modality_masks(batch["attention_mask"], n_vis)
        params = merge_params(trainable, frozen)
        if patches is None:
            patches = batch.get("patches")
            if patches is not None:
                patches = patches.astype(dtype)  # vision-cache steady state
        if patches is None:
            pixel_values = _prep_pixels(batch, model_cfg, dtype)
            # vision runs ONCE; both passes share the frozen features.
            # frozen/undifferentiated -> XLA fused attention
            patches = vl_pythia.get_patch_embeddings(params, model_cfg, pixel_values, dtype=dtype, attn_impl="xla")

        # without replay CE the student's logits and last two blocks are
        # never read either — same early exit as the teacher
        student = vl_pythia.forward(
            params, model_cfg, batch["input_ids"], None,
            batch["attention_mask"], batch.get("labels") if replay_coeff > 0 else None,
            patch_embeddings=patches, output_hidden_states=True,
            dtype=dtype, attn_impl=attn_impl, loss_only=True,
            need_logits=replay_coeff > 0,
            num_layers=None if replay_coeff > 0 else deepest_tap,
            remat_layers=remat_student,
            remat_policy=student_policy,
            label_tail=tail,
        )
        t_hs = batch.get("t_hs")
        if t_hs is not None:
            # teacher-state cache (data/teacher_cache.py): the teacher is
            # FROZEN for the whole task and the memory set is fixed, so its
            # hidden states per memory example never change — they arrive
            # with the batch as [B, deepest_tap+1, T, H] (collate layout)
            # and the teacher forward leaves the step entirely
            t_hs = jnp.moveaxis(t_hs, 0, 1).astype(dtype)
        else:
            teacher_params = merge_params(teacher_trainable, frozen)
            # teacher is frozen (stop_gradient): XLA attention's faster
            # forward applies; no residuals are kept for it. Early-exit after
            # the deepest distilled tap — hidden_states beyond max(layers)
            # are never read (the reference runs the full teacher and drops
            # them, distillation.py:105-122).
            teacher = vl_pythia.forward(
                jax.lax.stop_gradient(teacher_params), model_cfg,
                batch["input_ids"], None, batch["attention_mask"], None,
                patch_embeddings=patches, output_hidden_states=True,
                dtype=dtype, attn_impl="xla", need_logits=False,
                num_layers=deepest_tap,
            )
            t_hs = jax.lax.stop_gradient(teacher.hidden_states)

        loss = jnp.zeros((), jnp.float32)
        per_layer = jnp.zeros((len(layers_arr),), jnp.float32)
        if replay_coeff > 0 and student.loss is not None:
            loss = loss + replay_coeff * student.loss

        if distill_coeff != 0:
            if layers_arr == tuple(range(len(layers_arr))):
                # contiguous prefix (the common discounted/equal case):
                # a plain slice, not a 23-way gather+concat
                s_sel = student.hidden_states[: len(layers_arr)]  # [Ld, B, T, H]
                t_sel = t_hs[: len(layers_arr)]
            else:
                s_sel = jnp.stack([student.hidden_states[l] for l in layers_arr])
                t_sel = jnp.stack([t_hs[l] for l in layers_arr])
            if cls_distill:
                # distill position 0 only (distillation.py:251-257)
                s0 = s_sel[..., 0, :].astype(jnp.float32)
                t0 = t_sel[..., 0, :].astype(jnp.float32)
                if loss_kind == "cosine":
                    sn = s0 / jnp.maximum(jnp.linalg.norm(s0, axis=-1, keepdims=True), 1e-8)
                    tn = t0 / jnp.maximum(jnp.linalg.norm(t0, axis=-1, keepdims=True), 1e-8)
                    per_layer = jnp.mean(1.0 - jnp.sum(sn * tn, axis=-1), axis=-1)
                else:
                    per_layer = jnp.mean(jnp.mean(jnp.square(s0 - t0), axis=-1), axis=-1)
                dloss = jnp.sum(layer_coeffs * distill_coeff * per_layer)
            else:
                lang_l = _masked_token_loss(s_sel, t_sel, lang_mask[None], loss_kind)  # [Ld]
                img_l = _masked_token_loss(s_sel, t_sel, image_mask[None], loss_kind)
                if strategy == "equal":
                    # token-count-proportional (dl_weights.py:148-155)
                    n_lang = jnp.sum(lang_mask).astype(jnp.float32)
                    n_img = jnp.sum(image_mask).astype(jnp.float32)
                    lw = jnp.full((len(layers_arr),), n_lang / (n_lang + n_img))
                    vw = jnp.full((len(layers_arr),), n_img / (n_lang + n_img))
                else:  # balanced / adaptive: externally supplied coefficients
                    lw = lang_coeffs.astype(jnp.float32)
                    vw = 1.0 - lw
                per_layer = lw * lang_l + vw * img_l
                dloss = jnp.sum(layer_coeffs * distill_coeff * per_layer)
            loss = loss + dloss
        return loss, per_layer

    return loss_fn


def make_distill_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    tx,
    *,
    attn_impl: str = "auto",
    donate: bool = True,
) -> Callable:
    """Fused student+teacher replay step for featdistill/MAFED:
    step(state, teacher_trainable, batch, lang_coeffs)."""
    loss_fn = make_distill_loss_fn(model_cfg, train_cfg, attn_impl=attn_impl)

    def step(state: TrainState, teacher_trainable, batch, lang_coeffs):
        (loss, per_layer), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, teacher_trainable, batch, lang_coeffs
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax_apply_updates(state.trainable, updates)
        new_state = TrainState(state.step + 1, trainable, state.frozen, opt_state)
        return new_state, {
            "loss": loss,
            "grad_norm": _grad_norm_metric(grads, opt_state),
            # modality-weighted per-tap distill losses (reference logs these
            # as task_{t}/distill_loss_{layer}, distillation.py:165)
            "distill_layer_losses": per_layer,
        }

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_mafed_window_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    tx,
    *,
    n_ce: int,
    attn_impl: str = "auto",
    donate: bool = True,
    fuse_ce_batch: bool = True,
    share_vision: bool = True,
    remat_ce: bool = True,
    remat_student: bool = True,
) -> Callable:
    """One jit step = a FULL accumulation window of the MAFED workload:
    n_ce current-task CE microbatches + 1 distill (memory) microbatch, mean
    of the per-microbatch gradients, ONE optimizer update.

    This is the reference's real cadence — accumulate_grad_batches=4 with
    every replay_interval-th microbatch replaced by the memory batch
    (vqa_cont_learner.py:216-218 under PL gradient accumulation, which
    averages microbatch gradients) — fused into a single XLA program, so the
    optimizer update, grad-norm reduction and host dispatch are paid once per
    window instead of once per microbatch.

    step(state, teacher_trainable, ce_batches, distill_batch, lang_coeffs)
    where ce_batches is a batch pytree with a leading [n_ce] microbatch dim.

    fuse_ce_batch=True evaluates the n_ce CE microbatches as ONE forward at
    n_ce*batch rows (mean-of-means == mean over the concatenated batch since
    all microbatches share a size, and per-sample losses are already
    length-normalized) — larger matmul rows fill the MXU better than n_ce
    sequential passes. Falls back to a lax.scan over microbatches when False
    (lower peak activation memory).

    share_vision=True (requires fuse_ce_batch) additionally runs the frozen
    EVA-02 tower ONCE over every image in the window (n_ce*b CE + b memory
    images in one batched pass) — the features are constants w.r.t. the
    trainable params (the projector applies inside the differentiated
    forward), so they are computed outside both grads and split.
    """
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
    # "auto" -> XLA attention: the window remats every differentiated layer,
    # so pallas' residual-memory advantage is moot and XLA's fused attention
    # is faster at VQA lengths (948 -> 814 ms measured; see
    # make_ce_window_step docstring)
    if attn_impl == "auto":
        attn_impl = "xla"
    # remat_student: the window holds the CE pass AND the distill pass in one
    # program; per-layer remat on the student drops its ~20x residuals too,
    # leaving the peak at args + ONE grads buffer + layer carries
    distill_loss_fn = make_distill_loss_fn(
        model_cfg, train_cfg, attn_impl=attn_impl, remat_student=remat_student
    )
    denom = float(n_ce + 1)
    share_vision = share_vision and fuse_ce_batch
    tail = getattr(train_cfg, "label_tail", None) or None
    policy = resolve_remat_policy(getattr(train_cfg, "remat_policy", ""))

    def step(state: TrainState, teacher_trainable, ce_batches, distill_batch, lang_coeffs):
        ce_patches = distill_patches = None
        if "patches" in ce_batches:
            # vision-cache steady state: features arrive with the batch;
            # no vision tower in the step at all. Merged ce_patches only fit
            # the fused [n_ce*b] CE pass — the lax.scan fallback consumes
            # each microbatch's own mb["patches"] inside _ce_loss instead.
            if fuse_ce_batch:
                ce_patches = _merge_window(ce_batches["patches"]).astype(dtype)
            distill_patches = distill_batch["patches"].astype(dtype)
        elif share_vision:
            merged_px = _merge_window(ce_batches["pixels"])
            all_px = _prep_pixels(
                {"pixels": jnp.concatenate([merged_px, distill_batch["pixels"]], axis=0)},
                model_cfg, dtype,
            )
            all_patches = vl_pythia.get_patch_embeddings(
                merge_params(state.trainable, state.frozen), model_cfg, all_px,
                dtype=dtype, attn_impl="xla",
            )
            n_merged = merged_px.shape[0]
            ce_patches = all_patches[:n_merged]
            distill_patches = all_patches[n_merged:]

        def ce_loss_fn(trainable, mb):
            # remat_ce: per-layer remat keeps the n_ce*b-row CE pass's
            # residuals at [L, B, T, H] bf16 so the fused window fits in HBM
            # alongside the distill pass (~1 extra decoder fwd per window)
            return _ce_loss(
                trainable, state.frozen, model_cfg, mb, dtype, attn_impl,
                remat=train_cfg.remat or remat_ce, patches=ce_patches,
                label_tail=tail, remat_policy=policy,
            )

        def window_loss(trainable):
            # ONE loss, ONE backward: separate value_and_grad calls would
            # keep two full f32 grad pytrees (plus the combined tree) live
            # at once — measured OOM at 410M; the combined loss lets XLA
            # run bwd(distill) then bwd(CE) into a single grads buffer.
            if fuse_ce_batch:
                merged = jax.tree.map(_merge_window, ce_batches)
                ce_loss = ce_loss_fn(trainable, merged)
            else:
                def body(loss_sum, mb):
                    return loss_sum + ce_loss_fn(trainable, mb), None

                ce_loss_sum_s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), ce_batches)
                ce_loss = ce_loss_sum_s / n_ce
            d_loss, per_layer = distill_loss_fn(
                trainable, state.frozen, teacher_trainable, distill_batch,
                lang_coeffs, distill_patches,
            )
            total = (n_ce * ce_loss + d_loss) / denom
            return total, (ce_loss, d_loss, per_layer)

        (loss, (ce_loss, d_loss, per_layer)), grads = jax.value_and_grad(
            window_loss, has_aux=True
        )(state.trainable)

        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax_apply_updates(state.trainable, updates)
        new_state = TrainState(state.step + 1, trainable, state.frozen, opt_state)
        metrics = {
            "loss": loss,
            "ce_loss": ce_loss,
            "distill_loss": d_loss,
            "grad_norm": _grad_norm_metric(grads, opt_state),
            # modality-weighted per-tap distill losses (reference logs these
            # as task_{t}/distill_loss_{layer}, distillation.py:165)
            "distill_layer_losses": per_layer,
        }
        return new_state, metrics

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


# ---------------------------------------------------------------------------
# EWC Fisher estimation
# ---------------------------------------------------------------------------

def make_ewc_fisher_fn(model_cfg: ModelConfig, train_cfg: TrainConfig, attn_impl: str = "auto") -> Callable:
    """Jitted grad^2 accumulator: importances += (d(batch_size*loss)/dtheta)^2.

    Parity: ewc.py:70-103 — loss scaled by batch size before backward,
    squared grads summed over batches, divided by total samples by the
    caller.
    """
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
    tail = getattr(train_cfg, "label_tail", None) or None

    def fisher_step(trainable, frozen, batch, importances):
        bsz = batch["input_ids"].shape[0]

        def loss_fn(tr):
            return bsz * _ce_loss(tr, frozen, model_cfg, batch, dtype, attn_impl, label_tail=tail)

        grads = jax.grad(loss_fn)(trainable)
        importances = jax.tree.map(
            lambda acc, g: acc + jnp.square(g.astype(jnp.float32)), importances, grads
        )
        return importances

    return jax.jit(fisher_step, donate_argnums=(3,))


# ---------------------------------------------------------------------------
# Adaptive modality weights
# ---------------------------------------------------------------------------

def make_adaptive_weights_fn(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    layers: Sequence[int],
    attn_impl: str = "auto",
) -> Callable:
    """Per-batch modality importances via d(loss)/d(hidden_states[layer]).

    Returns fn(trainable, frozen, batch) -> (lang_sums[Ld], image_sums[Ld],
    n_lang_tokens, n_image_tokens). Parity with
    distillation_loss_weights.py:91-146: grad L2 norm per token, masked sums.
    """
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
    layers = tuple(layers)
    n_layers_total = model_cfg.num_hidden_layers  # perturbation covers hs[0..L-1]

    n_vis = model_cfg.vision.num_patches

    def fn(trainable, frozen, batch):
        params = merge_params(trainable, frozen)
        patches = batch.get("patches")
        if patches is not None:
            patches = patches.astype(dtype)
            pixel_values = None
        else:
            pixel_values = _prep_pixels(batch, model_cfg, dtype)
        b, t = batch["input_ids"].shape
        full_t = n_vis + t
        # bf16 perturbation halves the [L, B, T, H] primal+cotangent buffers;
        # the norms are reduced in f32 below
        pert0 = jnp.zeros((n_layers_total, b, full_t, model_cfg.hidden_size), dtype)

        def loss_of_pert(pert):
            out = vl_pythia.forward(
                params, model_cfg, batch["input_ids"], pixel_values,
                batch["attention_mask"], batch["labels"],
                patch_embeddings=patches,
                hidden_perturbation=pert, dtype=dtype, attn_impl=attn_impl,
                vision_attn_impl="xla", loss_only=True,
            )
            return out.loss

        grads = jax.grad(loss_of_pert)(pert0)  # [L, B, T, H] = dL/d hs[0..L-1]
        sel = jnp.stack([grads[l] for l in layers]).astype(jnp.float32)  # [Ld, B, T, H]
        gnorm = jnp.linalg.norm(sel, axis=-1)  # [Ld, B, T]
        lang_mask, image_mask = modality_masks(batch["attention_mask"], n_vis)
        lm = lang_mask.astype(jnp.float32)[None]
        im = image_mask.astype(jnp.float32)[None]
        lang_sums = jnp.sum(gnorm * lm, axis=(1, 2))
        image_sums = jnp.sum(gnorm * im, axis=(1, 2))
        return lang_sums, image_sums, jnp.sum(lm[0]), jnp.sum(im[0])

    return jax.jit(fn)
