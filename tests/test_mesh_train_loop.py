"""Mesh-trainer PRODUCT-path tests: the full epoch loop (feeder -> stacked
sharded batches -> psum-mean step -> validation -> checkpoint -> resume)
running on the 8-virtual-CPU-device mesh -- the code the CLIs' --mesh flag
and the driver dryrun execute, not a bespoke demo step."""

import glob
import json
import os

import jax
import numpy as np
import pytest

from cfun_tpu.config import tiny_config
from cfun_tpu.data.datasets import SyntheticDataset
from cfun_tpu.train.loop import train_model


def _cfg(**over):
    return tiny_config().replace(steps_per_epoch=2, validation_steps=1,
                                 val_every_epochs=1, **over)


def _read_metrics(log_dir):
    files = glob.glob(os.path.join(log_dir, "**", "train_metrics.jsonl"),
                      recursive=True)
    records = []
    for f in sorted(files):
        with open(f) as fh:
            records.extend(json.loads(line) for line in fh)
    return records


def _epoch_losses(records):
    return {r["epoch"]: r["loss"] for r in records if "loss" in r}


def test_mesh_loop_two_epochs_val_checkpoint_resume(tmp_path):
    """>= 2 epochs with val + checkpoint on mesh(4,2), then a resumed run
    continues the epoch numbering from the saved state."""
    assert len(jax.devices()) >= 8
    cfg = _cfg()
    train_ds = SyntheticDataset(cfg, n=4, seed=0)
    val_ds = SyntheticDataset(cfg, n=2, seed=50)

    log1 = str(tmp_path / "run1")
    ckpt = train_model(cfg, train_ds, val_ds, log_dir=log1, epochs=2,
                       num_workers=2, mesh_spec=(4, 2))
    assert os.path.exists(ckpt)
    records = _read_metrics(log1)
    losses = _epoch_losses(records)
    assert set(losses) == {1, 2}
    assert all(np.isfinite(v) for v in losses.values())
    # validation ran each epoch (val_every_epochs=1)
    val_epochs = {r["epoch"] for r in records if "val_loss" in r}
    assert val_epochs == {1, 2}

    with np.load(ckpt) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        # optimizer state rides along (momentum buffers present)
        assert any(k.startswith("opt/") for k in data.files)
    assert meta["epoch"] == 2

    # resume: epoch numbering continues at 3, params start from the ckpt
    log2 = str(tmp_path / "run2")
    ckpt2 = train_model(cfg, train_ds, val_ds, log_dir=log2, epochs=3,
                        weights=ckpt, num_workers=2, mesh_spec=(4, 2))
    losses2 = _epoch_losses(_read_metrics(log2))
    assert set(losses2) == {3}
    with np.load(ckpt2) as data:
        meta2 = json.loads(bytes(data["__meta__"].tobytes()).decode())
    assert meta2["epoch"] == 3
    assert meta2["step"] == 6  # 2 steps/epoch x 3 epochs, counter resumed


def test_mesh_space_sharding_is_semantics_free(tmp_path):
    """space=2 vs space=1 is pure sharding: identical loss trajectories
    (GSPMD halo exchange must not change the math)."""
    assert len(jax.devices()) >= 4
    cfg = _cfg()
    losses = {}
    for space in (1, 2):
        train_ds = SyntheticDataset(cfg, n=4, seed=0)
        val_ds = SyntheticDataset(cfg, n=2, seed=50)
        log = str(tmp_path / f"space{space}")
        train_model(cfg, train_ds, val_ds, log_dir=log, epochs=2,
                    num_workers=2, mesh_spec=(2, space))
        losses[space] = _epoch_losses(_read_metrics(log))
    assert set(losses[1]) == set(losses[2]) == {1, 2}
    for e in (1, 2):
        np.testing.assert_allclose(losses[1][e], losses[2][e],
                                   rtol=2e-4, atol=1e-5)


def test_mesh_step_equals_mean_of_single_device_forwards():
    """The mesh step's loss is exactly the mean of the per-volume
    single-device forwards under the key split batched_train_forward
    performs -- the DP math is the single-device math."""
    import jax.numpy as jnp

    from cfun_tpu.models import cfun
    from cfun_tpu.ops.anchors import config_anchors
    from cfun_tpu.train.loop import make_training_programs
    from cfun_tpu.train.step import train_forward
    from tests.test_train_step import _make_batch

    cfg = _cfg()  # shares the (2, 1) compiled step with the other tests
    anchors = config_anchors(cfg)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    prog = make_training_programs(cfg, anchors, (2, 1))
    batches = [_make_batch(cfg, seed=i) for i in range(2)]
    key = jax.random.PRNGKey(7)

    # single-device forwards first: the mesh step donates (and on the CPU
    # backend aliases) the param buffers
    keys = jax.random.split(key, 2)
    singles = [
        float(train_forward(params, jax.tree.map(jnp.asarray, b),
                            jnp.asarray(anchors), cfg, k)[0])
        for b, k in zip(batches, keys)
    ]

    state = prog.init_state(params)
    _, metrics = prog.step(state, prog.put_batch(batches), key)
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               np.mean(singles), rtol=1e-5)


def test_resume_reproduces_uninterrupted_trajectory(tmp_path):
    """Training randomness (angle, feeder plan, step keys) derives from
    (seed, epoch): train 4 epochs straight vs train 2 + resume 2 replay
    the same trajectory (round-4 weak #5 fix -- resume no longer replays
    the RNG streams from position 0).

    Tolerances, not bit-equality: XLA-CPU training steps are not
    run-to-run bit-deterministic (two IDENTICAL fresh runs diverge
    ~1e-9/step in params, compounding to ~1e-5 rel over 4 tiny epochs --
    measured), so bit-exact asserts flake.  A WRONG RNG schedule (the bug
    this guards against: different rotation angles / shuffle orders after
    resume) moves losses and params O(1), far above these bounds."""
    cfg = _cfg()

    def run(log, epochs, weights=None):
        train_ds = SyntheticDataset(cfg, n=4, seed=0)
        val_ds = SyntheticDataset(cfg, n=2, seed=50)
        return train_model(cfg, train_ds, val_ds, log_dir=str(log),
                           epochs=epochs, weights=weights, num_workers=2)

    ckpt_full = run(tmp_path / "full", 4)
    ckpt_half = run(tmp_path / "half", 2)
    ckpt_resumed = run(tmp_path / "resumed", 4, weights=ckpt_half)

    losses_full = _epoch_losses(_read_metrics(str(tmp_path / "full")))
    losses_resumed = _epoch_losses(_read_metrics(str(tmp_path / "resumed")))
    assert set(losses_full) == {1, 2, 3, 4}
    assert set(losses_resumed) == {3, 4}
    for e in (3, 4):
        np.testing.assert_allclose(losses_resumed[e], losses_full[e],
                                   rtol=1e-4, atol=0)
    with np.load(ckpt_full) as a, np.load(ckpt_resumed) as b:
        for k in a.files:
            if k == "__meta__":
                continue
            np.testing.assert_allclose(a[k], b[k], rtol=1e-3, atol=1e-6,
                                       err_msg=k)


def test_val_loss_deterministic_across_runs(tmp_path):
    """Validation keys derive from (seed, epoch), not the advancing train
    key: two identical runs log identical val curves (weak #7 fix)."""
    cfg = _cfg()
    vals = []
    for run in range(2):
        train_ds = SyntheticDataset(cfg, n=4, seed=0)
        val_ds = SyntheticDataset(cfg, n=2, seed=50)
        log = str(tmp_path / f"det{run}")
        train_model(cfg, train_ds, val_ds, log_dir=log, epochs=1,
                    num_workers=2)
        recs = _read_metrics(log)
        vals.append([r["val_loss"] for r in recs if "val_loss" in r])
    assert vals[0] and vals[0] == vals[1]
