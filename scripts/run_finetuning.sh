#!/usr/bin/env bash
# Multi-seed rerun harness (reference runs seeds 42 / 191 / 23 over all three
# ContVQA task orders).
set -euo pipefail

for SEED in 42 191 23; do
  for EXP in question_types diverse_domains taxonomy_domains; do
    SEED=$SEED EXP=$EXP OUT=storage/runs/$EXP bash "$(dirname "$0")/run_seed42.sh"
  done
done
