"""Torch-free ``pytorch_model.bin`` reading (models/bin_reader.py).

The fixture is written by real torch.save (the reference's own writer,
vl_pythia.py:399-451 fallback format); loading must then succeed with torch
IMPORT-BLOCKED, proving the reader has no torch dependency.
"""

import builtins
import sys

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from mafed_tpu.models import vl_pythia
from mafed_tpu.models.bin_reader import load_torch_bin
from mafed_tpu.models.weights import load_pretrained, params_to_reference_state_dict
from tests.helpers import tiny_model_cfg


def _write_bin_fixture(tmp_path):
    cfg = tiny_model_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(7))
    sd_np = {
        # bf16 leaves (frozen vision) go through f32: torch.from_numpy does
        # not accept ml_dtypes.bfloat16
        k: np.array(v, dtype=np.float32 if v.dtype.name == "bfloat16" else v.dtype)
        for k, v in params_to_reference_state_dict(params, cfg).items()
    }
    sd_torch = {k: torch.from_numpy(v) for k, v in sd_np.items()}
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    torch.save(sd_torch, str(model_dir / "pytorch_model.bin"))
    return cfg, params, sd_np, model_dir


def test_load_torch_bin_matches_torch_load(tmp_path):
    _, _, sd_np, model_dir = _write_bin_fixture(tmp_path)
    sd = load_torch_bin(str(model_dir / "pytorch_model.bin"))
    assert set(sd) == set(sd_np)
    for k, v in sd_np.items():
        got = sd[k]
        assert isinstance(got, np.ndarray), k
        np.testing.assert_array_equal(got, v, err_msg=k)


def test_load_torch_bin_dtypes_and_strides(tmp_path):
    # non-f32 dtypes + a non-contiguous tensor (stride-aware rebuild)
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    sd = {
        "f16": torch.randn(3, 5).half(),
        "bf16": torch.randn(2, 7).bfloat16(),
        "i64": torch.arange(10),
        "u8": torch.arange(8, dtype=torch.uint8),
        "transposed": base.t(),  # stride (1, 6)
    }
    path = str(tmp_path / "pytorch_model.bin")
    torch.save(sd, path)
    out = load_torch_bin(path)
    np.testing.assert_array_equal(out["f16"], sd["f16"].numpy())
    assert out["f16"].dtype == np.float16
    # bf16 widens to f32, matching weights._to_np's torch behavior
    np.testing.assert_array_equal(out["bf16"], sd["bf16"].float().numpy())
    assert out["bf16"].dtype == np.float32
    np.testing.assert_array_equal(out["i64"], sd["i64"].numpy())
    np.testing.assert_array_equal(out["u8"], sd["u8"].numpy())
    np.testing.assert_array_equal(out["transposed"], base.t().numpy())


def test_load_pretrained_bin_with_torch_blocked(tmp_path, monkeypatch):
    cfg, params, _, model_dir = _write_bin_fixture(tmp_path)

    real_import = builtins.__import__

    def no_torch(name, *args, **kwargs):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch blocked for this test")
        return real_import(name, *args, **kwargs)

    monkeypatch.delitem(sys.modules, "torch", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_torch)

    restored, _ = load_pretrained(str(model_dir), cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        ("/".join(str(k) for k in p), v) for p, v in jax.tree_util.tree_leaves_with_path(restored)
    )
    for key_path, leaf in flat_a:
        key = "/".join(str(k) for k in key_path)
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(flat_b[key], np.float32),
            atol=0, rtol=0, err_msg=key,
        )


def test_reader_rejects_arbitrary_pickles(tmp_path):
    # narrower than torch.load: anything beyond the state-dict surface raises
    import os
    import pickle
    import zipfile

    path = str(tmp_path / "pytorch_model.bin")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": os.getcwd}))
    with pytest.raises(pickle.UnpicklingError):
        load_torch_bin(path)
