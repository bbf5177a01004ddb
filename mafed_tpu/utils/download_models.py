"""Pull the pretrained VL-Pythia-EVA checkpoints from the HF hub.

Parity: mafed/utils/download_models.py:6-43 — the three scales land under
storage/models/ as safetensors directories directly loadable by
models.weights.load_pretrained. Zero-egress environments get a clear error
instead of retry storms.
"""

from __future__ import annotations

import argparse
import os

from mafed_tpu.core.logging import LOGGER

MODELS = {
    "160m": "gpantaz/vl-pythia-eva-160m",
    "410m": "gpantaz/vl-pythia-eva-410m",
    "1b": "gpantaz/vl-pythia-eva-1b",
}


def download(scale: str, out_dir: str = "storage/models") -> str:
    repo_id = MODELS[scale]
    target = os.path.join(out_dir, repo_id.split("/")[-1])
    if os.path.exists(os.path.join(target, "model.safetensors")):
        LOGGER.info("%s already present at %s", repo_id, target)
        return target
    try:
        from huggingface_hub import snapshot_download
    except ImportError as exc:
        raise RuntimeError("huggingface_hub unavailable; place checkpoints manually") from exc
    if os.environ.get("HF_HUB_OFFLINE") == "1":
        raise RuntimeError(
            f"offline environment: manually place {repo_id} under {target} "
            "(config.json + model.safetensors)"
        )
    LOGGER.info("downloading %s -> %s", repo_id, target)
    snapshot_download(repo_id=repo_id, local_dir=target, allow_patterns=["*.json", "*.safetensors"])
    return target


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--scales", nargs="+", default=list(MODELS), choices=list(MODELS))
    parser.add_argument("--out_dir", default="storage/models")
    args = parser.parse_args()
    for scale in args.scales:
        download(scale, args.out_dir)
