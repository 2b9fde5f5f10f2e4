#!/bin/bash
# Unattended: settle the heart finetune quality curve (VERDICT r4 weak #3).
#
# Re-runs the finetune leg on the fast path saving FULL checkpoints at
# epochs 48/60/72 (same-stage resumes now replay the uninterrupted
# trajectory: angles, feeder plan and step keys derive from
# (seed, epoch)), then evaluates
# each on >= 12 held-out volumes -- enough to separate a real post-48
# decline from 3-volume noise -- into a FRESH heart_synth_eval.json whose
# every row carries per-bucket timings (weak #7).
#
# Axon env per CLAUDE.md; ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."
ENV="env PALLAS_AXON_POOL_IPS=127.0.0.1 PALLAS_AXON_REMOTE_COMPILE=1 \
PALLAS_AXON_TPU_GEN=v5e JAX_PLATFORMS=axon \
PYTHONPATH=/root/.axon_site:/root/repo"

for i in $(seq 1 60); do
  if timeout 240 $ENV python -c "import jax; jax.devices()" >/dev/null 2>&1
  then
    echo "tunnel up after probe $i"
    break
  fi
  echo "probe $i: axon unavailable; retrying in 120s"
  sleep 120
done

FT="--stage finetune --wire bf16 --seed 0 --aug-device --device-cache \
--report benchmarks/train_synth_extend.json"
set -x
timeout 5400 $ENV python benchmarks/train_synth.py $FT --epochs 48 \
  --transfer --weights weights/heart_synth.npz \
  --out /tmp/ft48.npz --full-out /tmp/ft48_full.npz || exit 1
timeout 3600 $ENV python benchmarks/train_synth.py $FT --epochs 60 \
  --weights /tmp/ft48_full.npz \
  --out /tmp/ft60.npz --full-out /tmp/ft60_full.npz || exit 1
timeout 3600 $ENV python benchmarks/train_synth.py $FT --epochs 72 \
  --weights /tmp/ft60_full.npz --out /tmp/ft72.npz || exit 1

# fresh eval report: every row carries buckets (old rows: git history)
rm -f benchmarks/heart_synth_eval.json
timeout 2400 $ENV python benchmarks/heart_synth_eval.py \
  --stage beginning --weights weights/heart_synth.npz --n 12 || exit 1
for ep in 48 60 72; do
  timeout 2400 $ENV python benchmarks/heart_synth_eval.py \
    --stage finetune --weights /tmp/ft${ep}.npz --n 12 || exit 1
done
echo DONE
