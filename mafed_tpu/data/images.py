"""Image pipeline: host decode/resize -> uint8; normalize fused on device.

The reference preprocesses per image on CPU dataloader workers with a timm
transform (bicubic resize to floor(224/0.9)=248 on the short side, center
crop 224, CLIP-stat normalize; mafed/train.py:95-104) and ships float32
tensors over PCIe. TPU-first split instead:

  host:   JPEG decode + bicubic resize + center crop  -> uint8 [224,224,3]
  device: uint8 -> float, /255, CLIP normalize, NCHW  -> fused into the
          jitted step (4x less host->device traffic than float32, and the
          normalize fuses into the patch-embed conv)
"""

from __future__ import annotations

import math
import os
from typing import Iterable, Tuple

import numpy as np

from mafed_tpu.core.config import VisionConfig

try:
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def get_image_path(image_dir: str, image_name: str) -> str:
    """Image-db fname -> on-disk path (vl_pythia_vqa_dataset.py:15-27)."""
    if image_name.startswith("coco"):
        fields = os.path.splitext(image_name)[0].split("_")
        image_path = f"COCO_{fields[1]}_{fields[2]}.jpg"
    elif "abstract" in image_name:
        image_path = f"{image_name.split('.npz')[0]}.png"
    elif "VizWiz" in image_name:
        image_path = f"{image_name.split('.npz')[0]}.jpg"
    else:
        image_path = image_name
    return os.path.join(image_dir, image_path)


def load_and_resize(path: str, cfg: VisionConfig, use_native: bool = True) -> np.ndarray:
    """Host side: decode + bicubic short-side resize + center crop -> uint8 HWC.

    Uses the C++ image engine (mafed_tpu/native) when available — same
    geometry and PIL-compatible bicubic kernel, threaded batch decode — with
    a PIL fallback.
    """
    if use_native and os.environ.get("MAFED_NATIVE_IMAGES", "1") != "0":
        try:
            from mafed_tpu.native.engine import get_engine

            eng = get_engine()
            if eng is not None:
                return eng.decode(path, cfg.img_size, cfg.crop_pct)
        except Exception:
            pass  # fall through to PIL
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable for image decoding")
    img = Image.open(path).convert("RGB")
    target = cfg.img_size
    scale_size = int(math.floor(target / cfg.crop_pct))
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    new_short = scale_size
    new_long = int(round(long * scale_size / short))
    if w <= h:
        img = img.resize((new_short, new_long), Image.BICUBIC)
    else:
        img = img.resize((new_long, new_short), Image.BICUBIC)
    w, h = img.size
    left = (w - target) // 2
    top = (h - target) // 2
    img = img.crop((left, top, left + target, top + target))
    return np.asarray(img, dtype=np.uint8)


def make_normalizer(cfg: VisionConfig):
    """Device-side fused normalize: uint8 NHWC -> float NCHW CLIP-normalized.

    Returns a pure function safe to call inside jit; meant to be the first
    op of the train/eval step so XLA fuses it with the patch-embed conv.
    """
    import jax.numpy as jnp

    mean = np.asarray(cfg.mean, np.float32) * 255.0
    std = np.asarray(cfg.std, np.float32) * 255.0

    def normalize(pixels_uint8, dtype=jnp.bfloat16):
        x = pixels_uint8.astype(jnp.float32)
        x = (x - mean) / std
        return x.transpose(0, 3, 1, 2).astype(dtype)  # NHWC -> NCHW

    return normalize


def prep_pixels(batch, vision_cfg: VisionConfig, dtype):
    """uint8 NHWC (wire format) or float NCHW (preprocessed) -> float NCHW.

    Safe inside jit; first op of every step so XLA fuses the normalize into
    the patch-embed convolution.
    """
    import jax.numpy as jnp

    pixels = batch["pixels"]
    if pixels.dtype == jnp.uint8:
        return make_normalizer(vision_cfg)(pixels, dtype=dtype)
    return pixels.astype(dtype)


def synthetic_image(seed: int, cfg: VisionConfig) -> np.ndarray:
    """Deterministic fake image for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(cfg.img_size, cfg.img_size, 3), dtype=np.uint8).astype(np.uint8)
