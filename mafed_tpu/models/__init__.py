from mafed_tpu.models import clip_vit, eva02, gpt_neox, vl_pythia
from mafed_tpu.models.vl_pythia import VLPythia

# registry parity with mafed/model/__init__.py's model_architecture map
model_architecture = {"vlpythia": VLPythia}

__all__ = ["clip_vit", "eva02", "gpt_neox", "vl_pythia", "VLPythia", "model_architecture"]
