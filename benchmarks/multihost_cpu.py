"""Two-controller (multi-host) mesh training on CPU: the real pod shape.

The reference has no distributed backend at all (SURVEY.md s2.4); the mesh
trainer here is the TPU-native replacement, and this script executes it the
way a TPU pod does -- TWO separate controller processes, each owning half
the devices of one global ('data', 'space') mesh, coordinated through
``jax.distributed`` with cross-process collectives (gloo on CPU, ICI/DCN on
real slices).  Each process feeds only its own feeder shard;
``jax.make_array_from_process_local_data`` assembles the global batch.

Checks (exit code 0 = all pass):
  * both processes log bit-identical per-epoch losses (the replicated
    psum-mean loss must agree across controllers), and
  * with data == process_count the 2-process run reproduces the
    single-process mesh(2,2) loss trajectory exactly (same global shuffle,
    same volume->row assignment, same per-row RNG keys).

Usage:  python benchmarks/multihost_cpu.py            # parent / checker
        python benchmarks/multihost_cpu.py --report out.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(devices_per_proc: int) -> dict:
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",  # keep the axon TPU plugin out
        "XLA_FLAGS": ("--xla_force_host_platform_device_count="
                      f"{devices_per_proc}"),
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    return env


# ---------------------------------------------------------------------------
# worker body (runs in the spawned processes)
# ---------------------------------------------------------------------------

def run_train(log_dir: str, mesh_spec, epochs: int = 2) -> None:
    """The PRODUCT training path (train_model), tiny config, 2 epochs."""
    from cfun_tpu.config import tiny_config
    from cfun_tpu.data.datasets import SyntheticDataset
    from cfun_tpu.train.loop import train_model

    cfg = tiny_config().replace(steps_per_epoch=2, validation_steps=1,
                                val_every_epochs=1)
    train_ds = SyntheticDataset(cfg, n=4, seed=0)
    val_ds = SyntheticDataset(cfg, n=2, seed=50)
    train_model(cfg, train_ds, val_ds, log_dir=log_dir, epochs=epochs,
                num_workers=2, mesh_spec=mesh_spec)


def worker(process_id: int, coordinator: str, log_dir: str) -> None:
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4 and jax.local_device_count() == 2, (
        jax.device_count(), jax.local_device_count())
    run_train(log_dir, mesh_spec=(2, 2))


# ---------------------------------------------------------------------------
# parent / checker
# ---------------------------------------------------------------------------

def _epoch_losses(log_dir: str, tag: str = "") -> dict:
    pat = os.path.join(log_dir, "**", "train_metrics.jsonl")
    losses = {}
    for f in sorted(glob.glob(pat, recursive=True)):
        if tag and tag not in f:
            continue
        with open(f) as fh:
            for line in fh:
                r = json.loads(line)
                if "loss" in r:
                    losses[r["epoch"]] = r["loss"]
    return losses


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--single", action="store_true",
                    help="single-process mesh(2,2) reference run")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.coordinator, args.log_dir)
        return 0
    if args.single:
        run_train(args.log_dir, mesh_spec=(2, 2))
        return 0

    tmp = tempfile.mkdtemp(prefix="multihost_")
    port = _free_port()
    coord = f"127.0.0.1:{port}"

    # two controllers x 2 local devices = the global 4-device (2,2) mesh
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--coordinator", coord, "--log-dir", os.path.join(tmp, "multi")],
            env=_env(2), cwd=REPO)
        for i in range(2)
    ]
    rcs = [p.wait(timeout=1800) for p in procs]
    if any(rcs):
        print(f"FAIL: worker exit codes {rcs}")
        return 1

    # single-process reference on an equivalent 4-device (2,2) mesh
    rc = subprocess.call(
        [sys.executable, os.path.abspath(__file__), "--single",
         "--log-dir", os.path.join(tmp, "single")],
        env=_env(4), cwd=REPO)
    if rc:
        print(f"FAIL: single-process reference exit code {rc}")
        return 1

    h0 = _epoch_losses(os.path.join(tmp, "multi"), tag="-host0")
    h1 = _epoch_losses(os.path.join(tmp, "multi"), tag="-host1")
    single = _epoch_losses(os.path.join(tmp, "single"))
    print(f"host0 : {h0}\nhost1 : {h1}\nsingle: {single}")

    ok = (set(h0) == set(h1) == set(single) == {1, 2}
          and all(h0[e] == h1[e] for e in h0)
          and all(abs(h0[e] - single[e]) <= 1e-5 * abs(single[e]) + 1e-6
                  for e in h0))
    if args.report:
        with open(args.report, "w") as fh:
            json.dump({"ok": ok, "host0": h0, "host1": h1,
                       "single_process": single}, fh, indent=1)
    print("OK: 2-controller mesh run matches single-process" if ok
          else "FAIL: loss mismatch")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
