"""C++ image engine: decode/resize/crop parity vs the PIL path."""

import os

import numpy as np
import pytest

from mafed_tpu.core.config import VisionConfig
from mafed_tpu.native.engine import get_engine

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    eng = get_engine()
    if eng is None:
        pytest.skip("native engine unavailable (no g++/libjpeg)")
    return eng


@pytest.fixture(scope="module")
def sample_images(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth image: resize differences stay tiny
    y, x = np.mgrid[0:300, 0:400]
    smooth = np.stack([x % 251, y % 251, (x + y) % 251], -1).astype(np.uint8)
    noisy = rng.integers(0, 256, size=(257, 311, 3), dtype=np.uint8).astype(np.uint8)
    paths = {}
    for name, arr, fmt in [("smooth", smooth, "jpg"), ("noisy", noisy, "png"), ("tall", smooth.transpose(1, 0, 2), "jpg")]:
        p = str(root / f"{name}.{fmt}")
        Image.fromarray(arr).save(p, quality=95) if fmt == "jpg" else Image.fromarray(arr).save(p)
        paths[name] = p
    return paths


def test_native_matches_pil_geometry_and_values(engine, sample_images):
    from mafed_tpu.data.images import load_and_resize

    cfg = VisionConfig()
    # PIL quantizes the intermediate horizontal pass to uint8; the C++ engine
    # keeps doubles between passes, so pointwise deviation is larger on pure
    # noise while the mean stays sub-LSB.
    max_tol = {"smooth": 8, "tall": 8, "noisy": 32}
    for name, path in sample_images.items():
        native = engine.decode(path, cfg.img_size, cfg.crop_pct)
        pil = load_and_resize(path, cfg, use_native=False)
        assert native.shape == pil.shape == (224, 224, 3)
        diff = np.abs(native.astype(int) - pil.astype(int))
        assert diff.mean() < 1.0, f"{name}: mean diff {diff.mean()}"
        assert diff.max() <= max_tol[name], f"{name}: max diff {diff.max()}"


def test_missing_file_raises(engine):
    with pytest.raises(IOError):
        engine.decode("/nonexistent/file.jpg", 224)
