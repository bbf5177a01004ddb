"""Box/geometry utilities."""

import numpy as np
import pytest

from mafed_tpu.utils.boxes import (
    BoxMode,
    Boxes,
    ObjectCenterCrop,
    pairwise_iou,
    patchify_image,
    quantize_bbox,
)


def test_boxmode_roundtrip():
    xyxy = np.array([[10.0, 20.0, 50.0, 80.0]])
    xywh = BoxMode.convert(xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(xywh, [[10, 20, 40, 60]])
    back = BoxMode.convert(xywh, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(back, xyxy)
    rel = BoxMode.convert(xyxy, BoxMode.XYXY_ABS, BoxMode.XYXY_REL, image_size=(100, 200))
    np.testing.assert_allclose(rel, [[0.05, 0.2, 0.25, 0.8]])


def test_iou():
    a = Boxes([[0, 0, 10, 10]])
    b = Boxes([[5, 5, 15, 15], [20, 20, 30, 30]])
    iou = pairwise_iou(a, b)
    np.testing.assert_allclose(iou, [[25 / 175, 0.0]])


def test_boxes_clip_area_nonempty():
    b = Boxes([[-5, -5, 10, 10], [3, 3, 3, 3]])
    clipped = b.clip((8, 8))
    np.testing.assert_allclose(clipped.tensor[0], [0, 0, 8, 8])
    assert list(b.nonempty()) == [True, False]
    np.testing.assert_allclose(b.area(), [225, 0])


def test_quantize_bbox():
    q = quantize_bbox([0, 0, 100, 50], image_size=(100, 200), num_bins=10)
    np.testing.assert_array_equal(q, [[0, 0, 5, 5]])


def test_patchify_image():
    img = np.arange(2 * 3 * 4 * 4).reshape(2, 3, 4, 4).astype(np.float32)
    patches = patchify_image(img, {"height": 2, "width": 2})
    assert patches.shape == (2, 4, 12)
    # first patch = top-left 2x2 of each channel
    np.testing.assert_allclose(patches[0, 0], img[0, :, :2, :2].transpose(1, 2, 0).reshape(-1))


def test_object_center_crop_geometry():
    crop = ObjectCenterCrop((100, 100))
    # centered object fully inside
    top, left, ch, cw = crop.crop_window((400, 300), [150, 100, 250, 200])
    assert (top, left) == (100, 150)
    # object near origin clamps at 0
    top, left, _, _ = crop.crop_window((400, 300), [0, 0, 20, 20])
    assert (top, left) == (0, 0)
    # object near the far corner shifts window inward
    top, left, _, _ = crop.crop_window((400, 300), [380, 280, 400, 300])
    assert left + 100 <= 400 and top + 100 <= 300


def test_flops_and_mfu():
    from mafed_tpu.core.config import ModelConfig
    from mafed_tpu.training.flops import distill_step_flops_per_example, mfu

    cfg = ModelConfig()
    fl = distill_step_flops_per_example(cfg, text_len=80)
    assert 1e12 < fl < 1e13  # ~ a few TFLOP per example at 410M
    assert 0 < mfu(59.0, fl) < 1.0


def test_framework_window_flops_orderings():
    """Our own MFU numerator (bench.py): removing cached work must strictly
    shrink the count, and the whole window stays below the reference's
    (which pays per-microbatch vision + full-sequence lm_head)."""
    from mafed_tpu.core.config import ModelConfig
    from mafed_tpu.training.flops import framework_window_flops, reference_window_flops

    cfg = ModelConfig()
    kw = dict(text_len=80, n_ce=3, batch=16)
    cached = framework_window_flops(cfg, **kw)  # vision cached (default)
    uncached = framework_window_flops(cfg, vision_cached=False, **kw)
    teacher_cached = framework_window_flops(cfg, teacher_cached=True, **kw)
    assert teacher_cached < cached < uncached
    # 4 microbatches' vision passes leave the step under the cache
    from mafed_tpu.training.flops import vision_flops_per_image

    assert uncached - cached == pytest.approx(4 * 16 * vision_flops_per_image(cfg), rel=1e-9)
    assert uncached < reference_window_flops(cfg, 80, 3, 16)


def test_framework_decode_flops_orderings():
    """bench_eval.py's MFU numerator: cached steps must cost far less than
    re-prefilling (the whole point of the KV-cache path), vision-cached
    strictly less than uncached, and the total below the reference's
    use_cache=False loop which re-runs vision + full lm_head every token."""
    from mafed_tpu.core.config import ModelConfig
    from mafed_tpu.training.flops import (
        attention_flops,
        decoder_flops_per_token,
        framework_decode_flops_per_example,
        vision_flops_per_image,
    )

    cfg = ModelConfig()
    one = framework_decode_flops_per_example(cfg, 64, 1)
    ten = framework_decode_flops_per_example(cfg, 64, 10)
    uncached = framework_decode_flops_per_example(cfg, 64, 10, vision_cached=False)
    assert one < ten < uncached
    assert uncached - ten == pytest.approx(vision_flops_per_image(cfg), rel=1e-9)
    # 9 cached steps cost less than ONE extra prefill would
    seq0 = cfg.vision.num_patches + 64
    prefill = decoder_flops_per_token(cfg) * seq0 + attention_flops(cfg, seq0)
    assert (ten - one) < prefill
    # and far below the reference greedy loop (bench_eval comparator)
    import bench_eval

    assert ten < bench_eval._reference_eval_flops_per_example(cfg, 64)
