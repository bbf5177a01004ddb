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

    print(f"saved {hub_id} tokenizer assets to {VENDORED_TOKENIZER_DIR}")
    # verify the vendored copy loads offline BEFORE stamping it usable
    reloaded = AutoTokenizer.from_pretrained(VENDORED_TOKENIZER_DIR, local_files_only=True)
    sample = "What color is the cat?"
    assert reloaded(sample).input_ids == tok(sample).input_ids
    print("offline reload verified")

    # Record the source LAST and atomically: the marker is what makes the
    # assets loadable (_vendored_matches refuses assets without it), so a
    # vendor run that dies mid-way leaves ignored files, never a directory
    # that silently serves the wrong vocabulary.
    marker = os.path.join(VENDORED_TOKENIZER_DIR, "vendored_from.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"source": hub_id}, f)
    os.replace(tmp, marker)
    print(f"stamped vendored_from.json (source={hub_id})")


if __name__ == "__main__":
    main()
