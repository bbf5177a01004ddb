from mafed_tpu.models import eva02, gpt_neox, vl_pythia
from mafed_tpu.models.vl_pythia import VLPythia

__all__ = ["eva02", "gpt_neox", "vl_pythia", "VLPythia"]
