"""Framework-wide constants.

Parity: /root/reference/mafed/constants.py:1 (PATIENCE_THRESHOLD) plus the
static token-layout facts the reference hardcodes elsewhere
(mafed/methods/distillation.py:73 num_vision_tokens=256).
"""

# Early-stopping min-delta on generative VQA accuracy
# (reference: mafed/constants.py:1).
PATIENCE_THRESHOLD = 5e-5

# EVA-02 large @224/patch14 produces 16x16=256 patch tokens after the CLS
# token is dropped (reference: mafed/methods/distillation.py:73,
# mafed/model/vl_pythia.py:463-475).
NUM_VISION_TOKENS = 256

# Labels value that is ignored by the LM loss (HF convention, used
# throughout the reference data pipeline).
IGNORE_INDEX = -100

# Generation budget for VQA answers (reference: mafed/utils/eval_utils.py:174).
MAX_NEW_TOKENS = 10
