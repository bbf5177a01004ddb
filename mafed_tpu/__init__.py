"""mafed_tpu — TPU-native continual-learning VQA framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the MAFED
reference stack (Modality-Aware Feature Distillation for continual VQA):
frozen EVA-02 vision encoder + trainable GPT-NeoX (Pythia) decoder with a
visual-prefix, trained over a sequence of ContVQA tasks with naive / EWC /
experience-replay / feature-distillation continual-learning strategies.

Design is TPU-first:
  * pure-functional models (param pytrees + jitted apply), bf16 compute
  * Pallas flash-attention kernels for the decoder and ViT hot paths
  * SPMD via jax.sharding.Mesh + NamedSharding (data/model axes)
  * one fused jit-compiled train step per CL method (student+teacher in
    a single compilation for feature distillation)
  * double-buffered host->device prefetch replacing CUDA streams
"""

__version__ = "0.1.0"
