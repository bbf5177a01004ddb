"""CLI entry point: continual-learning VQA finetuning on TPU.

Usage mirrors the reference (mafed/train.py:304-478):

    python -m mafed_tpu.train --config config/train-vqa-cl.json \
        --output_dir out --cl_method featdistill \
        --tasks action count subcategory scene color ...

JSON config fills any flag not explicitly given on the CLI.
"""

from __future__ import annotations

from mafed_tpu.core.config import build_arg_parser, parse_with_config
from mafed_tpu.trainer.continual import ContinualLearningTrainer


def main(argv=None):
    import os

    from mafed_tpu.core.cache import enable_compilation_cache
    from mafed_tpu.core.preempt import install_handlers, request_preemption_after

    enable_compilation_cache()
    # SIGTERM (pod preemption / maintenance notice) -> save a mid-epoch
    # resume bundle at the next update boundary and exit 143; restart with
    # --resume_from_checkpoint <output_dir>/resume to continue exactly
    # (scripts/supervise.py automates the relaunch loop)
    install_handlers()
    # chaos drill: MAFED_PREEMPT_AFTER=N simulates a preemption arriving
    # after N applied updates — deterministic, globally consistent on pods
    if os.environ.get("MAFED_PREEMPT_AFTER"):
        request_preemption_after(int(os.environ["MAFED_PREEMPT_AFTER"]))
    parser = build_arg_parser()
    config = parse_with_config(parser, argv)
    trainer = ContinualLearningTrainer(config)
    return trainer.main()


if __name__ == "__main__":
    main()
