#!/bin/bash
# Unattended: extend the heart 'finetune' stage 12 -> 28 epochs (same
# seed/wire; same-stage npz resume continues epoch numbering), then
# re-run the held-out eval.  Axon env per CLAUDE.md; ONE TPU process.
set -u
cd "$(dirname "$0")/.."
ENV="env PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
PALLAS_AXON_TPU_GEN=v5e JAX_PLATFORMS=axon \
PYTHONPATH=/root/.axon_site:/root/repo"

set -x
timeout 4500 $ENV python benchmarks/train_synth.py --stage finetune \
  --epochs 48 --wire bf16 --weights weights/heart_synth_ft.npz \
  --out weights/heart_synth_ft.npz \
  --report benchmarks/train_synth_extend.json || exit 1
timeout 1800 $ENV python benchmarks/heart_synth_eval.py --stage finetune \
  --weights weights/heart_synth_ft.npz
