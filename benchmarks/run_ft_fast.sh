#!/bin/bash
# Unattended: the 'finetune'-stage fast-path measurements (VERDICT r3 #4).
#
# 1. wall matrix at real source shape: host-aug baseline vs --aug-device
#    --device-cache, 3 epochs x 8 steps, stage=finetune (192^3 mask crops
#    + Sobel edge loss) -- appended to benchmarks/train_wall_aug.json
#    beside the round-3 'beginning' rows;
# 2. the 48-epoch finetune leg re-run ON THE FAST PATH from the same
#    transfer seed (weights/heart_synth.npz, seed 0, bf16) as the round-3
#    host-path run, so the loss trajectories are directly comparable;
# 3. held-out eval of the fast-path checkpoint (per-bucket timings).
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

R=benchmarks/train_wall_aug.json
COMMON="--stage finetune --epochs 3 --steps 8 --wire int8 \
--host-shape 512 512 300 --report $R"
set -x
timeout 4000 $ENV python benchmarks/train_synth.py $COMMON || exit 1
timeout 4000 $ENV python benchmarks/train_synth.py $COMMON --aug-device \
  --device-cache || exit 1

# 48-epoch fast-path leg (transfer from the beginning-stage checkpoint;
# cross-stage => params-only transfer, epochs restart -- the same recipe
# the round-3 host-path ft run started from)
timeout 5400 $ENV python benchmarks/train_synth.py --stage finetune \
  --epochs 48 --wire bf16 --seed 0 --transfer \
  --weights weights/heart_synth.npz \
  --aug-device --device-cache \
  --out weights/heart_synth_ft_fast.npz \
  --report benchmarks/train_synth_extend.json || exit 1
timeout 1800 $ENV python benchmarks/heart_synth_eval.py --stage finetune \
  --weights weights/heart_synth_ft_fast.npz
