"""On-TPU smoke of the captioning pretrain trainer at 410M scale.

Drives PretrainTrainer end-to-end (synthetic caption records, real
VL-Pythia-410M + EVA-02-L, grad accumulation, periodic eval + checkpoint,
checkpoint-final) on the actual chip — the pretrain path (replacing the
reference's vendored HF Trainer, mafed/trainer/hf.py) otherwise only runs
on tiny CPU configs in tests/test_pretrain.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/smoke_pretrain_tpu.py [workdir]
Env: SMOKE_N (records, default 64), SMOKE_BSZ (default 8), SMOKE_ACCUM (2)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mafed_presmoke_")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from mafed_tpu.core.config import ModelConfig
    from mafed_tpu.data.tokenizer import ByteTokenizer
    from mafed_tpu.pretrain.dataset import CaptionRecord, PretrainDataset
    from mafed_tpu.pretrain.trainer import PretrainConfig, PretrainTrainer

    n = int(os.environ.get("SMOKE_N", "64"))
    bsz = int(os.environ.get("SMOKE_BSZ", "8"))
    accum = int(os.environ.get("SMOKE_ACCUM", "2"))
    model_cfg = ModelConfig()  # real 410M + EVA-02-L
    tok = ByteTokenizer(model_max_length=64)

    def records(prefix, k):
        return [
            CaptionRecord(image=f"{prefix}{i}", caption=f"a photo of object number {i} on a table", source="coco")
            for i in range(k)
        ]

    train_ds = PretrainDataset(tok, model_cfg.vision, records=records("tr", n), model_max_length=64, synthetic_images=True)
    eval_ds = PretrainDataset(tok, model_cfg.vision, records=records("ev", 8), model_max_length=64, synthetic_images=True)

    args = PretrainConfig(
        output_dir=os.path.join(workdir, "pre"),
        per_device_train_batch_size=bsz,
        per_device_eval_batch_size=bsz,
        gradient_accumulation_steps=accum,
        num_train_epochs=2,
        learning_rate=1e-4,
        save_steps=0.5,
        eval_steps=0.5,
        model_max_length=64,
        logging_steps=50,
    )

    start = time.time()
    trainer = PretrainTrainer(model_cfg, args, train_ds, eval_ds, tokenizer=tok)
    state = trainer.train()
    wall = time.time() - start
    final = os.path.join(args.output_dir, "checkpoint-final")
    ok = os.path.exists(os.path.join(final, "model.safetensors"))
    print(json.dumps({
        "pretrain_smoke": "ok" if ok else "missing-final-checkpoint",
        "steps": int(state.step),
        "wall_s": round(wall, 1),
        "workdir": workdir,
    }))


if __name__ == "__main__":
    main()
