#!/bin/bash
# Unattended aug-measurement matrix on the tunneled chip (CLAUDE.md env).
# Waits for the axon backend to come back, then measures the train wall
# for: int8 host-aug (baseline), int8 aug-device, int8 aug-device +
# device-resident mold cache -- 3 epochs x 8 steps at real source shape.
# Appends every run to benchmarks/train_wall_aug.json, then runs bench.py
# once to re-warm the inference compile caches.
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
COMMON="--epochs 3 --steps 8 --wire int8 --host-shape 512 512 300 --report $R"
set -x
timeout 3000 $ENV python benchmarks/train_synth.py $COMMON
timeout 3000 $ENV python benchmarks/train_synth.py $COMMON --aug-device
timeout 3000 $ENV python benchmarks/train_synth.py $COMMON --aug-device \
  --device-cache
timeout 2400 $ENV python bench.py
