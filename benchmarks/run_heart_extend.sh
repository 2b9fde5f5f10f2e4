#!/bin/bash
# Unattended: extend the heart synthetic run 30 -> 60 'beginning' epochs
# (same seed/wire as the committed checkpoint), transfer into 'finetune'
# for 12 epochs (192^3 masks + edge loss), then re-run the held-out eval
# for both stages.  Axon env per CLAUDE.md; ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."
ENV="env PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
PALLAS_AXON_TPU_GEN=v5e JAX_PLATFORMS=axon \
PYTHONPATH=/root/.axon_site:/root/repo"

set -x
timeout 3000 $ENV python benchmarks/train_synth.py --epochs 60 --wire bf16 \
  --weights weights/heart_synth.npz --out weights/heart_synth.npz \
  --report benchmarks/train_synth_extend.json || exit 1
timeout 3000 $ENV python benchmarks/train_synth.py --stage finetune \
  --epochs 12 --wire bf16 --weights weights/heart_synth.npz --transfer \
  --out weights/heart_synth_ft.npz \
  --report benchmarks/train_synth_extend.json || exit 1
rm -f benchmarks/heart_synth_eval.json
timeout 1800 $ENV python benchmarks/heart_synth_eval.py --stage beginning
timeout 1800 $ENV python benchmarks/heart_synth_eval.py --stage finetune \
  --weights weights/heart_synth_ft.npz
