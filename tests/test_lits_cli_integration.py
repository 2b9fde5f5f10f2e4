"""Integration tests for the LiTS CLI: preprocess cache builder, test and
submit commands over a fabricated raw LiTS tree with the tiny config (CPU).
Mirrors tests/test_cli_integration.py for the heart CLI."""

import os

import numpy as np
import jax
import pytest

from cfun_tpu.data import nifti
from cfun_tpu.data.preprocess_lits import MEAN_SPACING, preprocess
from cfun_tpu.models import cfun
from tests.test_lits_variant import _tiny_lits


def _raw_volume(shape_hwd=(40, 40, 24), seed=0):
    """HU-valued liver/tumor phantom in the raw [H, W, D] layout."""
    rng = np.random.default_rng(seed)
    h, w, d = shape_hwd
    label = np.zeros(shape_hwd, np.int16)
    label[10:30, 10:30, 6:18] = 1
    label[16:24, 16:24, 9:15] = 2
    image = np.full(shape_hwd, 300.0, np.float32)
    image += rng.normal(0, 40, size=shape_hwd).astype(np.float32)
    image[label == 1] = -150.0
    image[label == 2] = -280.0
    return image, label


@pytest.fixture(scope="module")
def lits_dirs(tmp_path_factory):
    """Raw tree (imagesTr/labelsTr/imagesTs) + preprocessed cache."""
    raw = str(tmp_path_factory.mktemp("lits_raw"))
    cache = str(tmp_path_factory.mktemp("lits_cache"))
    # affine at exactly the dataset-mean spacing so the resample is a no-op
    # shape-wise and the fixture stays tiny
    affine = np.diag(list(MEAN_SPACING) + [1.0])
    for sub in ("imagesTr", "labelsTr", "imagesTs"):
        os.makedirs(os.path.join(raw, sub), exist_ok=True)
    image, label = _raw_volume()
    nifti.save(os.path.join(raw, "imagesTr", "volume-0.nii.gz"),
               image.astype(np.int16), affine)
    nifti.save(os.path.join(raw, "labelsTr", "segmentation-0.nii.gz"),
               label, affine)
    timage, _ = _raw_volume(seed=7)
    nifti.save(os.path.join(raw, "imagesTs", "test-volume-0.nii.gz"),
               timage.astype(np.int16), affine)
    preprocess(raw, cache, n_train=1, n_test=1)
    return raw, cache


def test_preprocess_builds_reference_cache_layout(lits_dirs):
    raw, cache = lits_dirs
    img = np.load(os.path.join(cache, "image_np", "liver_0.npy"))
    lbl = np.load(os.path.join(cache, "label_np", "liver_label_0.npy"))
    tst = np.load(os.path.join(cache, "image_test_np", "liver_0.npy"))
    assert img.dtype == np.float32 and lbl.dtype == np.int8
    # mean-spacing affine => resample preserves the shape
    assert img.shape == (40, 40, 24) and lbl.shape == img.shape
    assert tst.shape == (40, 40, 24)
    assert set(np.unique(lbl)) == {0, 1, 2}


def test_lits_cli_test_command(lits_dirs, tmp_path):
    from cfun_tpu.cli.lits_main import run_test

    _, cache = lits_dirs
    cfg = _tiny_lits("together").replace(detection_max_instances=2)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    box_ious, per_class_ious = run_test(
        cfg, params, cache, limit=0, save=True, bbox=False,
        results_dir=str(tmp_path / "results"))
    assert len(box_ious) <= 1  # random weights may or may not detect
    assert len(per_class_ious) == 1  # mask metrics recorded past 'beginning'
    assert per_class_ious[0].shape == (cfg.num_classes - 1,)
    saved = os.listdir(tmp_path / "results")
    assert len(saved) == 1 and saved[0].endswith("_liver_0.nii.gz")
    data, _ = nifti.load(str(tmp_path / "results" / saved[0]))
    assert data.shape == (40, 40, 24)  # original [H, W, D] geometry


def test_lits_cli_submit_command(lits_dirs, tmp_path):
    from cfun_tpu.cli.lits_main import run_submit

    raw, cache = lits_dirs
    # submit reads the raw imagesTs geometry when present; point the cache
    # fixture at it the way the real layout does
    if not os.path.exists(os.path.join(cache, "imagesTs")):
        os.symlink(os.path.join(raw, "imagesTs"),
                   os.path.join(cache, "imagesTs"))
    cfg = _tiny_lits("together").replace(detection_max_instances=2)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    out_dir = str(tmp_path / "subs")
    run_submit(cfg, params, cache, results_dir=out_dir)
    saved = os.listdir(out_dir)
    assert saved == ["test-segmentation-0.nii"]
    data, _ = nifti.load(os.path.join(out_dir, saved[0]))
    assert data.shape == (40, 40, 24)


def test_lits_cli_exact_flag_reaches_config(lits_dirs, monkeypatch):
    """`--exact` must wire exact_reference_overrides() into the LiTS
    inference config, mirroring the heart CLI test."""
    import cfun_tpu.cli.lits_main as lm
    import cfun_tpu.models.cfun as cfun_mod

    _, cache = lits_dirs
    seen = {}

    def fake_run_test(cfg, params, data_dir, limit, save, bbox):
        seen["cfg"] = cfg

    monkeypatch.setattr(lm, "run_test", fake_run_test)
    # params are unused by the fake; skip the 120M-param init
    monkeypatch.setattr(cfun_mod, "init_params", lambda k, c: {})
    lm.main(["test", "--weights", "none", "--data", cache, "--exact"])
    cfg = seen["cfg"]
    assert cfg.wire_image_dtype == "bfloat16"
    assert cfg.fast_unmold is False
    assert cfg.approx_topk is False

    lm.main(["test", "--weights", "none", "--data", cache])
    cfg = seen["cfg"]
    assert cfg.wire_image_dtype == "int8" and cfg.fast_unmold is True
    assert cfg.wire_int8_scale == 127.0  # [0,1] HU window spans full int8
