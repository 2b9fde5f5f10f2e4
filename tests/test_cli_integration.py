"""Integration tests: train loop + heart test CLI over synthetic NIfTI data
with the tiny config (CPU)."""

import json
import os

import numpy as np
import jax
import pytest

from cfun_tpu.config import tiny_config
from cfun_tpu.data import nifti
from cfun_tpu.data.datasets import HeartDataset
from cfun_tpu.models import cfun


def _write_synth_dataset(root, n=3, shape_hwd=(48, 48, 24)):
    """Synthetic labeled MM-WHS-style dataset with a manifest."""
    rng = np.random.default_rng(0)
    items = []
    h, w, d = shape_hwd
    for i in range(n):
        label = np.zeros(shape_hwd, np.int16)
        label[12:36, 12:36, 6:18] = 1
        label[18:30, 18:30, 9:15] = 2
        label[21:27, 21:27, 10:13] = 3
        image = rng.normal(0, 40, size=shape_hwd).astype(np.float32)
        image += 300.0 * (label > 0)
        img_path = os.path.join(root, f"img_{i:03d}.nii.gz")
        lbl_path = os.path.join(root, f"lbl_{i:03d}.nii.gz")
        nifti.save(img_path, image.astype(np.int16), np.eye(4))
        nifti.save(lbl_path, label, np.eye(4))
        items.append({"image": img_path, "label": lbl_path})
    with open(os.path.join(root, "dataset.json"), "w") as f:
        json.dump({"train_and_test": items}, f)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("heartdata"))
    _write_synth_dataset(root)
    return root


def test_heart_dataset_loads(synth_root):
    ds = HeartDataset()
    ds.load_heart(synth_root, "all", val_size=1)
    ds.prepare()
    assert ds.num_images == 3
    assert ds.num_classes == 8
    img = ds.load_image(0)
    assert img.shape == (48, 48, 24, 1)
    mask = ds.load_mask(0)
    assert set(np.unique(mask)) == {0, 1, 2, 3}


def test_train_loop_two_epochs_and_resume(synth_root, tmp_path):
    cfg = tiny_config().replace(steps_per_epoch=2, validation_steps=1,
                                val_every_epochs=1, epochs=2)
    ds = HeartDataset()
    ds.load_heart(synth_root, "all", val_size=1)
    ds.prepare()
    val = HeartDataset()
    val.load_heart(synth_root, "val", val_size=1)
    val.prepare()

    from cfun_tpu.train.loop import train_model
    log_dir = str(tmp_path / "logs")
    ckpt = train_model(cfg, ds, val, log_dir=log_dir, epochs=2,
                       num_workers=2, seed=0)
    assert os.path.exists(ckpt)
    # metrics jsonl was written
    run_dirs = os.listdir(os.path.join(log_dir, "heart"))
    metrics = os.path.join(log_dir, "heart", run_dirs[0],
                           "train_metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics)]
    assert any("loss" in l for l in lines)
    assert any("val_loss" in l for l in lines)

    # resume continues epoch numbering past 2
    ckpt2 = train_model(cfg.replace(epochs=3), ds, val, log_dir=log_dir,
                        weights=ckpt, epochs=3, num_workers=2, seed=1)
    from cfun_tpu.utils import checkpoint as ckpt_mod
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    _, _, meta = ckpt_mod.load(ckpt2, params)
    assert meta["epoch"] == 3


def test_heart_cli_submit_command(synth_root, tmp_path):
    from cfun_tpu.cli.heart_main import run_submit

    cfg = tiny_config().replace(detection_max_instances=1)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    out_dir = str(tmp_path / "subs")
    run_submit(cfg, params, synth_root, limit=1, results_dir=out_dir)
    saved = os.listdir(out_dir)
    assert len(saved) == 1
    data, _ = nifti.load(os.path.join(out_dir, saved[0]))
    assert data.shape == (48, 48, 24)


def test_heart_cli_test_command(synth_root, monkeypatch, tmp_path):
    from cfun_tpu.cli.heart_main import run_test

    cfg = tiny_config().replace(detection_max_instances=1)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    monkeypatch.chdir(tmp_path)
    ious, dices = run_test(cfg, params, synth_root, limit=2, save=True,
                           bbox=False, results_dir=str(tmp_path / "results"))
    assert ious.shape == (2, cfg.num_classes - 1)
    assert dices.shape == (2, cfg.num_classes - 1)
    saved = os.listdir(tmp_path / "results")
    assert len(saved) == 2
    # exported volumes are loadable label maps at original geometry
    data, _ = nifti.load(str(tmp_path / "results" / saved[0]))
    assert data.shape == (48, 48, 24)


def test_heart_cli_exact_flag_reaches_config(synth_root, monkeypatch):
    """`--exact` must wire exact_reference_overrides() into the inference
    config (VERDICT r1: reported IoU/Dice otherwise always includes the
    int8-wire + device-argmax approximations)."""
    import cfun_tpu.cli.heart_main as hm

    seen = {}

    def fake_run_test(cfg, params, data_dir, limit, save, bbox):
        seen["cfg"] = cfg

    monkeypatch.setattr(hm, "run_test", fake_run_test)
    hm.main(["test", "--weights", "none", "--stage", "beginning",
             "--data", synth_root, "--exact"])
    cfg = seen["cfg"]
    assert cfg.wire_image_dtype == "bfloat16"
    assert cfg.fast_unmold is False
    assert cfg.approx_topk is False
    assert cfg.nms_backend == "scan"

    hm.main(["test", "--weights", "none", "--stage", "beginning",
             "--data", synth_root])
    cfg = seen["cfg"]
    assert cfg.wire_image_dtype == "int8" and cfg.fast_unmold is True


def test_parse_mesh_spec():
    from cfun_tpu.cli import parse_mesh

    assert parse_mesh(None) is None
    assert parse_mesh("") is None
    assert parse_mesh("4") == (4, 1)
    assert parse_mesh("4,2") == (4, 2)
    with pytest.raises(ValueError):
        parse_mesh("4,2,1")
    with pytest.raises(ValueError):
        parse_mesh("0")
