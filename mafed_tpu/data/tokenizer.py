"""Tokenizer construction with an offline fallback.

Parity: the reference builds the Pythia (GPT-NeoX BPE) tokenizer with
pad = eos = <|endoftext|>, left padding, model_max_length=100
(mafed/pretrain_vlpythia.py:104-116; mafed/train.py:84-93). When the HF hub
and cache are unreachable (zero-egress TPU pods), a deterministic byte-level
tokenizer with the same interface keeps the full pipeline runnable; its ids
live in [0, 257) inside the same 50304 vocab.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence

from mafed_tpu.core.logging import LOGGER

# In-repo vendored tokenizer assets (scripts/vendor_tokenizer.py populates
# this on a machine with hub access; zero-egress TPU pods then need no
# network and no cache). Checked before any hub/cache lookup.
VENDORED_TOKENIZER_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "tokenizer"
)


def _vendored_matches(tokenizer_name: str) -> bool:
    """Whether the vendored assets may stand in for `tokenizer_name`.

    The vendor script records its source hub id in vendored_from.json; the
    assets shadow ONLY that id (all Pythia scales share one tokenizer, so a
    pythia-* request matches a pythia-* vendor). Silently substituting a
    different vocabulary would corrupt every downstream number — the exact
    failure the hard-fail below exists to prevent.
    """
    if not os.path.exists(os.path.join(VENDORED_TOKENIZER_DIR, "tokenizer.json")):
        return False
    marker = os.path.join(VENDORED_TOKENIZER_DIR, "vendored_from.json")
    try:
        import json

        with open(marker) as f:
            source = json.load(f).get("source", "")
    except Exception:
        # no (or unreadable) marker: the assets' provenance is unknown — a
        # vendor run that crashed mid-write, or a hand copy. Assuming Pythia
        # here would silently serve a foreign vocabulary, the exact
        # accuracy-corrupting substitution the hard-fail exists to prevent.
        # Refuse; resolution falls through to the HF cache / explicit hub
        # opt-in / the instant hard fail.
        LOGGER.warning(
            "vendored tokenizer assets at %s have no readable vendored_from.json "
            "marker — ignoring them (re-run scripts/vendor_tokenizer.py)",
            VENDORED_TOKENIZER_DIR,
        )
        return False
    if source == tokenizer_name:
        return True
    return "pythia" in source.lower() and "pythia" in tokenizer_name.lower()


@dataclass
class Encoding:
    input_ids: List[int]


class ByteTokenizer:
    """Offline byte-level tokenizer, HF-compatible surface for this codebase.

    id 0 = eos (<|endoftext|> in Pythia), bytes map to 1..256.
    """

    eos_token = "<|endoftext|>"
    eos_token_id = 0
    pad_token_id = 0
    is_byte_fallback = True

    def __init__(self, model_max_length: int = 100, padding_side: str = "left") -> None:
        self.model_max_length = model_max_length
        self.padding_side = padding_side
        self.vocab_size = 50304

    def __call__(self, text: str, truncation: bool = False, max_length: Optional[int] = None) -> Encoding:
        ids = [b + 1 for b in text.encode("utf-8")]
        limit = max_length or (self.model_max_length if truncation else None)
        if truncation and limit:
            ids = ids[:limit]
        return Encoding(input_ids=ids)

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        data = bytes(i - 1 for i in ids if 0 < int(i) <= 256)
        return data.decode("utf-8", errors="ignore")

    def batch_decode(self, batch, skip_special_tokens: bool = True) -> List[str]:
        return [self.decode(ids, skip_special_tokens) for ids in batch]


def build_tokenizer(
    tokenizer_name: str = "EleutherAI/pythia-410m",
    model_max_length: int = 100,
    padding_side: str = "left",
    truncation_side: str = "right",
    allow_fallback: bool = False,
):
    """Pythia tokenizer with pad=eos and left padding.

    `tokenizer_name` may be a hub id or a local directory containing
    tokenizer files. Resolution order (zero-egress-first — a hub lookup on
    an air-gapped pod burns minutes of connect timeouts before failing):

      1. a local directory path given as `tokenizer_name` (offline);
      2. the in-repo vendored assets (VENDORED_TOKENIZER_DIR, offline);
      3. the local HF cache (`local_files_only=True`, offline);
      4. the hub — ONLY when MAFED_TOKENIZER_FROM_HUB=1 is set.

    When the real tokenizer is unavailable, this HARD-FAILS (instantly — no
    network attempt) by default: silently swapping in the byte fallback would
    change the vocabulary and every downstream accuracy number. Tests and
    synthetic runs opt in with allow_fallback=True
    (CLI: --allow_tokenizer_fallback).
    """
    kwargs = dict(
        model_max_length=model_max_length,
        padding_side=padding_side,
        truncation_side=truncation_side,
    )
    last_exc: Optional[Exception] = None
    try:
        from transformers import AutoTokenizer

        candidates = []
        if os.path.isdir(tokenizer_name):
            candidates.append((tokenizer_name, True))
        else:
            if _vendored_matches(tokenizer_name):
                candidates.append((VENDORED_TOKENIZER_DIR, True))
            candidates.append((tokenizer_name, True))  # local HF cache only
            if os.environ.get("MAFED_TOKENIZER_FROM_HUB") == "1":
                candidates.append((tokenizer_name, False))
        for source, local_only in candidates:
            try:
                tok = AutoTokenizer.from_pretrained(
                    source, local_files_only=local_only, **kwargs
                )
                if tok.pad_token is None:
                    tok.pad_token = tok.eos_token
                return tok
            except Exception as exc:  # try the next source
                last_exc = exc
    except Exception as exc:  # transformers itself unavailable
        last_exc = exc
    if not allow_fallback:
        raise RuntimeError(
            f"tokenizer '{tokenizer_name}' is unavailable "
            f"({type(last_exc).__name__}: {last_exc}). Real runs must tokenize "
            "identically to the reference (pretrain_vlpythia.py:104-116). "
            "Options: vendor the assets in-repo with scripts/vendor_tokenizer.py "
            "(run once on a machine with hub access), point --tokenizer_name "
            "at a local directory with the Pythia tokenizer files, set "
            "MAFED_TOKENIZER_FROM_HUB=1 to allow a network fetch, or pass "
            "--allow_tokenizer_fallback to accept a byte-level tokenizer "
            "(synthetic/test runs ONLY — it changes the vocabulary and all "
            "accuracy numbers)."
        ) from last_exc
    LOGGER.warning(
        "HF tokenizer '%s' unavailable (%s); using offline byte-level fallback",
        tokenizer_name, type(last_exc).__name__,
    )
    return ByteTokenizer(model_max_length=model_max_length, padding_side=padding_side)
