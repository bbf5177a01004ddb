#!/usr/bin/env python
"""Vendor the Pythia tokenizer assets into the repo.

Run ONCE on a machine with HF hub access; afterwards zero-egress TPU pods
load the real GPT-NeoX BPE vocabulary from mafed_tpu/assets/tokenizer/
with no network and no cache (mafed_tpu/data/tokenizer.py resolution
order). Parity target: the reference builds this tokenizer from the hub at
mafed/pretrain_vlpythia.py:104-116.

Usage:
    python scripts/vendor_tokenizer.py [hub_id]   # default EleutherAI/pythia-410m
"""

from __future__ import annotations

import sys


def main() -> None:
    hub_id = sys.argv[1] if len(sys.argv) > 1 else "EleutherAI/pythia-410m"
    from transformers import AutoTokenizer

    from mafed_tpu.data.tokenizer import VENDORED_TOKENIZER_DIR

    tok = AutoTokenizer.from_pretrained(hub_id)
    tok.save_pretrained(VENDORED_TOKENIZER_DIR)
    import json
    import os

    # record the source: the vendored assets shadow ONLY this id (plus the
    # Pythia family, which shares one tokenizer across scales)
    with open(os.path.join(VENDORED_TOKENIZER_DIR, "vendored_from.json"), "w") as f:
        json.dump({"source": hub_id}, f)
    print(f"saved {hub_id} tokenizer assets to {VENDORED_TOKENIZER_DIR}")
    # verify the vendored copy loads offline
    reloaded = AutoTokenizer.from_pretrained(VENDORED_TOKENIZER_DIR, local_files_only=True)
    sample = "What color is the cat?"
    assert reloaded(sample).input_ids == tok(sample).input_ids
    print("offline reload verified")


if __name__ == "__main__":
    main()
