"""Learning-signal + CL-method-separation evidence (VERDICT r3 #1).

Every other e2e test asserts shapes/finiteness; this one asserts the
framework actually LEARNS and that the CL methods DIFFER in the direction
they exist for — the operational correctness the reference validates with
real VQA accuracy curves (mafed/train.py:43-70, wandb), reproduced here on
a deterministic, learnable synthetic pair (tests/helpers.write_learnable_vqa):

  * task "hue": 4 solid-color classes, answer = the color word
  * task "light": bright/dark images, answer = the luminance word
  * both tasks share the SAME question string, so sequential finetuning on
    "light" interferes with "hue"'s conditional — naive forgetting is
    catastrophic by construction, and replay/featdistill must counter it
    through the memory/distillation machinery (replay cadence
    vqa_cont_learner.py:216-218, accuracy/BWT math train.py:61-67)

Measured at these exact settings (seed 42, CPU, r4 — recorded in
docs/ARCHITECTURE.md): naive [[1.0, 0.0], [0.0, 1.0]] BWT -1.0;
replay [[1.0, 0.75], [0.0, 1.0]] BWT -0.25; featdistill the same as
replay. Assertions leave wide margins under those points.
"""

import numpy as np
import pytest

from tests.helpers import write_learnable_vqa
from mafed_tpu.core.config import ModelConfig, VisionConfig


def _learn_model_cfg() -> ModelConfig:
    # big enough to memorize 48 byte-sequences from frozen random vision
    # features; small enough for CPU epochs in ~1 s
    return ModelConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=256, rotary_pct=0.25,
        vision=VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0),
        vision_encoder_name="tiny-eva",
    )


def _run(tmp_path, method, **extra):
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    cfg = write_learnable_vqa(str(tmp_path))
    overrides = dict(
        cl_method=method,
        output_dir=str(tmp_path / f"out_{method}"),
        epochs=[30, 30],
        learning_rate=3e-3,
        batch_size=8,
        val_batch_size=8,
        # the reference warmup quirk (60-epoch horizon) keeps the first ~6
        # epochs inside warmup at this dataset size; patience must outlast
        # the post-warmup takeoff (replay's task-1 halves its effective
        # task-data rate, taking off around epoch 10)
        patience=12,
    )
    overrides.update(extra)
    cfg = cfg.replace(**overrides)
    trainer = ContinualLearningTrainer(
        cfg, model_cfg=_learn_model_cfg(), synthetic_images=False, use_mesh=False
    )
    result = trainer.main()
    return np.asarray(result["accuracy_matrix"]), float(result["bwt"])


MEMORY = dict(cl_memory=16, replay_interval=2)


@pytest.fixture(scope="module")
def naive_run(tmp_path_factory):
    return _run(tmp_path_factory.mktemp("naive"), "naive")


def test_model_learns_task0_well_above_chance(naive_run):
    acc, _ = naive_run
    # 4 balanced classes -> 0.25 chance for an image-blind answerer; a
    # text-only model can't beat it (the question is identical for every
    # example). Measured: 1.0.
    assert acc[0, 0] >= 0.75
    # and the second task is learnable too (2 classes). Measured: 1.0.
    assert acc[1, 1] >= 0.75


def test_naive_forgets_catastrophically(naive_run):
    acc, bwt = naive_run
    # same question + disjoint answer sets: finetuning on "light" must
    # crush "hue". Measured: 0.0 retained, BWT -1.0.
    assert acc[0, 1] <= 0.25
    assert bwt <= -0.5


@pytest.mark.parametrize("method", ["replay", "featdistill"])
def test_memory_methods_materially_beat_naive_bwt(naive_run, tmp_path, method):
    extra = dict(MEMORY)
    if method == "featdistill":
        extra.update(
            distillation_modality_weighing_strategy="balanced",
            distillation_layer_weighing_strategy="discounted",
            distillation_layer_discount=0.5,
        )
    acc, bwt = _run(tmp_path, method, **extra)
    _, naive_bwt = naive_run
    # measured: -0.25 vs naive -1.0; demand a material (>0.25) separation
    assert bwt >= naive_bwt + 0.25, (bwt, naive_bwt)
    # countering forgetting must not cost the new task. Measured: 1.0.
    assert acc[1, 1] >= 0.75
    # and retention is real, not just "less bad": measured 0.75 vs 0.0
    assert acc[0, 1] >= 0.5


# apply the slow marker to everything in this module (CPU wall ~1 min/run)
pytestmark = pytest.mark.slow
