"""Tokenizer resolution order (VERDICT r2 #5): vendored assets and local
directories load OFFLINE with no hub attempt; a missing tokenizer hard-fails
instantly (the previous local_files_only=False path burned network timeouts
on zero-egress pods before erroring). Parity target:
mafed/pretrain_vlpythia.py:104-116 (pad=eos, left padding).
"""

import json
import os

import pytest


def _write_tiny_hf_tokenizer(dirpath) -> None:
    """A minimal real HF-fast tokenizer directory (stands in for the vendored
    Pythia assets, which need hub access to fetch)."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"<|endoftext|>": 0, "what": 1, "color": 2, "is": 3, "the": 4, "cat": 5, "?": 6}
    tok = Tokenizer(WordLevel(vocab, unk_token="<|endoftext|>"))
    tok.pre_tokenizer = Whitespace()
    os.makedirs(dirpath, exist_ok=True)
    tok.save(os.path.join(dirpath, "tokenizer.json"))
    with open(os.path.join(dirpath, "tokenizer_config.json"), "w") as f:
        json.dump(
            {"tokenizer_class": "PreTrainedTokenizerFast", "eos_token": "<|endoftext|>"}, f
        )


def test_local_directory_loads_offline(tmp_path):
    from mafed_tpu.data.tokenizer import build_tokenizer

    d = tmp_path / "tok"
    _write_tiny_hf_tokenizer(d)
    tok = build_tokenizer(str(d), model_max_length=100, padding_side="left")
    assert tok.pad_token == tok.eos_token  # pad=eos parity
    assert tok.padding_side == "left"
    assert tok.model_max_length == 100
    ids = tok("what color is the cat ?").input_ids
    assert ids == [1, 2, 3, 4, 5, 6]


def test_vendored_assets_resolve_before_hub(tmp_path, monkeypatch):
    import mafed_tpu.data.tokenizer as tokmod

    d = tmp_path / "vendored"
    _write_tiny_hf_tokenizer(d)
    with open(os.path.join(d, "vendored_from.json"), "w") as f:
        json.dump({"source": "EleutherAI/pythia-410m"}, f)
    monkeypatch.setattr(tokmod, "VENDORED_TOKENIZER_DIR", str(d))
    # hub id given, but the vendored assets must win with zero network use
    tok = tokmod.build_tokenizer("EleutherAI/pythia-410m")
    assert tok.pad_token == "<|endoftext|>"
    assert tok("the cat").input_ids == [4, 5]


def test_vendored_assets_without_marker_are_refused(tmp_path, monkeypatch):
    """Assets with no vendored_from.json have unknown provenance (a vendor
    run that crashed mid-write, or a hand copy of some other model's
    vocabulary). They must NOT be assumed to be Pythia — resolution falls
    through to the instant hard fail instead of silently serving a foreign
    vocabulary."""
    import mafed_tpu.data.tokenizer as tokmod

    d = tmp_path / "vendored"
    _write_tiny_hf_tokenizer(d)  # tokenizer.json present, marker absent
    monkeypatch.setattr(tokmod, "VENDORED_TOKENIZER_DIR", str(d))
    monkeypatch.delenv("MAFED_TOKENIZER_FROM_HUB", raising=False)
    with pytest.raises(RuntimeError, match="vendor_tokenizer"):
        tokmod.build_tokenizer("EleutherAI/pythia-410m")
    # a marker naming a NON-Pythia source must be refused for a Pythia
    # request too
    with open(os.path.join(d, "vendored_from.json"), "w") as f:
        json.dump({"source": "someorg/other-model"}, f)
    with pytest.raises(RuntimeError, match="vendor_tokenizer"):
        tokmod.build_tokenizer("EleutherAI/pythia-410m")


def test_missing_tokenizer_hard_fails_without_hub_attempt(tmp_path, monkeypatch):
    import mafed_tpu.data.tokenizer as tokmod

    monkeypatch.setattr(tokmod, "VENDORED_TOKENIZER_DIR", str(tmp_path / "absent"))
    monkeypatch.delenv("MAFED_TOKENIZER_FROM_HUB", raising=False)
    calls = []

    from transformers import AutoTokenizer

    orig = AutoTokenizer.from_pretrained.__func__

    def spy(cls, name, **kw):
        calls.append(kw.get("local_files_only"))
        return orig(cls, name, **kw)

    monkeypatch.setattr(AutoTokenizer, "from_pretrained", classmethod(spy))
    with pytest.raises(RuntimeError, match="vendor_tokenizer"):
        tokmod.build_tokenizer("no-such-org/no-such-tokenizer")
    # every attempt stayed offline — no local_files_only=False call happened
    assert calls and all(c is True for c in calls)


def test_byte_fallback_still_opt_in(tmp_path, monkeypatch):
    import mafed_tpu.data.tokenizer as tokmod

    monkeypatch.setattr(tokmod, "VENDORED_TOKENIZER_DIR", str(tmp_path / "absent"))
    tok = tokmod.build_tokenizer("no-such-org/no-such-tokenizer", allow_fallback=True)
    assert getattr(tok, "is_byte_fallback", False)
