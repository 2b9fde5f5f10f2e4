"""Module-level A/B parity against the LiTS_2017 tree's OWN modules.

The LiTS variant ships its own copies of backbone/mask_branch/model with
real deltas (SURVEY.md s2.2): P3D35 depths (4, 5), a (5, 7, 7) stem,
dropout-free U-Net, class-weighted mask CE [1, 1, 100] and the per-class
edge loss without the heart version's gradient-magnitude sqrt.  The root
tree's A/B (test_torch_graph_parity.py) cannot see those files -- both
trees use the same top-level module names -- so this file imports
/root/reference/LiTS_2017 under a sys.modules swap and A/Bs the
LiTS-specific pieces against the JAX implementations on shared weights.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cfun_tpu.config import tiny_config  # noqa: E402
from cfun_tpu.models.p3d import apply_p3d  # noqa: E402
from cfun_tpu.models.unet3d import apply_unet  # noqa: E402
from cfun_tpu.train import losses  # noqa: E402
from cfun_tpu.utils import torch_convert as tc  # noqa: E402

LITS_REF = "/root/reference/LiTS_2017"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LITS_REF), reason="LiTS reference tree not present")

_TREE_MODULES = ("config", "utils", "backbone", "mask_branch", "model")


@pytest.fixture(scope="module")
def lref():
    """Import the LiTS_2017 tree's modules under a sys.modules swap (the
    root tree uses the same top-level names), with I/O deps stubbed and
    .cuda() no-op'd on tensors AND modules (the LiTS losses hard-code
    module-level .cuda(), LiTS_2017/model.py:926)."""
    for name in ("nibabel", "skimage", "skimage.transform", "imgaug",
                 "imgaug.augmenters"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__version__ = "0.0.0"
            sys.modules[name] = mod
    sys.modules["skimage"].transform = sys.modules["skimage.transform"]

    saved = {n: sys.modules.pop(n) for n in _TREE_MODULES
             if n in sys.modules}
    sys.path.insert(0, LITS_REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    tnn.Module.cuda = lambda self, *a, **k: self
    try:
        import backbone as lits_backbone
        import mask_branch as lits_mask_branch
        import model as lits_model
    finally:
        sys.path.remove(LITS_REF)
        for n in _TREE_MODULES:
            sys.modules.pop(n, None)
        sys.modules.update(saved)
    return types.SimpleNamespace(backbone=lits_backbone,
                                 mask_branch=lits_mask_branch,
                                 model=lits_model)


def _randomize(module: tnn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(0.1 * torch.randn(p.shape, generator=g))
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.copy_(
                    0.05 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    0.8 + 0.4 * torch.rand(m.running_var.shape, generator=g))


def _sd(module: tnn.Module):
    return {k: v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


def _to_jax(x_torch: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 4, 1))


def _from_jax(y: jnp.ndarray) -> np.ndarray:
    return np.asarray(y).transpose(0, 4, 1, 2, 3)


def _assert_close(torch_out, jax_out_ncdhw, tol=1e-3):
    a = torch_out.detach().numpy()
    scale = max(np.abs(a).max(), 1e-3)
    np.testing.assert_allclose(jax_out_ncdhw, a, atol=tol * scale, rtol=tol)


# tiny LiTS-flavored config: P3D35 depths, (5,7,7) stem, 3 classes
CFG = tiny_config().replace(
    name="lits", num_classes=3, backbone="P3D35",
    backbone_stem_kernel=(5, 7, 7), mask_class_weights=(1.0, 1.0, 100.0))


class _RefConfig:
    BACKBONE_CHANNELS = tuple(CFG.backbone_channels)


def test_lits_p3d35_stem_parity(lref):
    """P3D35 (depths (4, 5)) with the LiTS (5, 7, 7) stem
    (LiTS_2017/backbone.py:124, 166-175) vs apply_p3d on shared weights."""
    m = lref.backbone.P3D35(input_channel=1, config=_RefConfig()).eval()
    _randomize(m, 0)
    x = torch.randn(1, 1, 32, 64, 64,
                    generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        c1 = m.C1(x)
        c2_t = m.C2(c1)
        c3_t = m.C3(c2_t)

    params = tc.p3d_from_torch(_sd(m), (4, 5))
    c2_j, c3_j = apply_p3d(params, _to_jax(x), CFG, dtype=jnp.float32)
    _assert_close(c2_t, _from_jax(c2_j))
    _assert_close(c3_t, _from_jax(c3_j))


@pytest.mark.parametrize("stage", ["together", "finetune"])
def test_lits_unet_parity(lref, stage):
    """The LiTS tree's dropout-free Modified3DUNet
    (LiTS_2017/mask_branch.py:11-220) vs apply_unet, both stages."""
    m = lref.mask_branch.Modified3DUNet(1, CFG.num_classes, stage,
                                        CFG.unet_base_channels).eval()
    _randomize(m, 2)
    x = torch.randn(1, 1, 32, 32, 32,
                    generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        y_t = m(x)

    unet = tc.unet_from_torch(_sd(m))
    y_j = apply_unet(unet, _to_jax(x), stage=stage, dtype=jnp.float32)
    _assert_close(y_t, _from_jax(y_j), tol=2e-3)


def test_lits_weighted_mask_loss_ab(lref):
    """compute_mrcnn_mask_loss with class weights [1, 1, 100]
    (LiTS_2017/model.py:908-933) vs mask_loss(cfg.mask_class_weights) on
    identical targets/logits."""
    rng = np.random.default_rng(4)
    p, d, h, w, c = 3, 6, 8, 8, 3
    labels = rng.integers(0, c, size=(p, d, h, w))
    onehot = np.eye(c, dtype=np.float32)[labels]  # [P, d, h, w, C]
    logits = rng.normal(size=(p, d, h, w, c)).astype(np.float32)
    class_ids = np.ones(p, np.int64)  # all positive

    # reference layout: target stack [P, C, d, h, w] (argmax'd inside),
    # prediction logits [P, C, d, h, w]
    want = lref.model.compute_mrcnn_mask_loss(
        torch.from_numpy(onehot.transpose(0, 4, 1, 2, 3)),
        torch.from_numpy(class_ids),
        torch.from_numpy(logits.transpose(0, 4, 1, 2, 3))).item()

    got = float(losses.mask_loss(jnp.asarray(onehot),
                                 jnp.ones(p, bool),
                                 jnp.asarray(logits), CFG))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lits_per_class_edge_loss_ab(lref):
    """compute_mrcnn_mask_edge_loss (per-class raw-gradient MSE, no
    magnitude sqrt; LiTS_2017/model.py:936-979) vs
    mask_edge_loss(per_class=True) on identical stacks."""
    rng = np.random.default_rng(5)
    p, d, h, w, c = 2, 8, 8, 8, 3
    labels = rng.integers(0, c, size=(p, d, h, w))
    onehot = np.eye(c, dtype=np.float32)[labels]
    probs = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(p, d, h, w, c)).astype(np.float32)),
        axis=-1)
    class_ids = np.ones(p, np.int64)

    want = lref.model.compute_mrcnn_mask_edge_loss(
        torch.from_numpy(onehot.transpose(0, 4, 1, 2, 3)),
        torch.from_numpy(class_ids),
        torch.from_numpy(np.asarray(probs).transpose(0, 4, 1, 2, 3))).item()

    got = float(losses.mask_edge_loss(jnp.asarray(onehot),
                                      jnp.ones(p, bool), probs, CFG,
                                      per_class=True))
    np.testing.assert_allclose(got, want, rtol=1e-4)


class _TinyLitsPredictConfig:
    """LiTS-tree reference-config stand-in sized to the tiny LiTS CFG
    (LiTS_2017/LiTS_main.py:28-176 attribute surface of build/predict)."""
    NAME = "tiny"
    GPU_COUNT = 0
    IMAGE_SHAPE = np.array([64, 64, 32, 1])
    BACKBONE = "P3D35"
    BACKBONE_CHANNELS = tuple(CFG.backbone_channels)
    BACKBONE_STRIDES = list(CFG.backbone_strides)
    TOP_DOWN_PYRAMID_SIZE = CFG.fpn_channels
    RPN_CONV_CHANNELS = CFG.rpn_conv_channels
    FPN_CLASSIFY_FC_LAYERS_SIZE = CFG.fc_size
    UNET_MASK_BRANCH_CHANNEL = CFG.unet_base_channels
    NUM_CLASSES = CFG.num_classes
    RPN_ANCHOR_SCALES = tuple(CFG.anchor_scales)
    RPN_ANCHOR_RATIOS = list(CFG.anchor_ratios)
    RPN_ANCHOR_STRIDE = CFG.anchor_stride
    RPN_NMS_THRESHOLD = CFG.rpn_nms_threshold
    RPN_BBOX_STD_DEV = np.array(CFG.rpn_bbox_std)
    PRE_NMS_LIMIT = CFG.pre_nms_limit
    POST_NMS_ROIS_INFERENCE = CFG.post_nms_rois_inference
    POOL_SIZE = list(CFG.pool_size)
    MASK_POOL_SIZE = [32, 32, 32]
    DETECTION_MIN_CONFIDENCE = 0.05
    DETECTION_NMS_THRESHOLD = CFG.detection_nms_threshold
    DETECTION_MAX_INSTANCES = CFG.detection_max_instances
    STAGE = "together"
    TRAIN_BN = False
    MINI_MASK_SHAPE = (8, 8, 8)


def test_lits_whole_graph_predict_parity(lref, tmp_path):
    """END-TO-END A/B against the LiTS tree's own MaskRCNN.predict
    (LiTS_2017/model.py:1419-1497): P3D35 trunk, proposal NMS, classifier,
    detection layer, raw-image mask crops, dropout-free U-Net at the
    'together' stage -- vs our jit'd infer_forward (name='lits', exact
    probability-stack path).  The reference's own anchors are fed to our
    graph (PARITY C9 neutralization), as in the root-tree test."""
    import functools
    from cfun_tpu.models import cfun

    rcfg = _TinyLitsPredictConfig()
    m = lref.model.MaskRCNN(rcfg, str(tmp_path), test_flag=True).eval()
    _randomize(m, 7)
    with torch.no_grad():
        # amplify the heads so ROI and proposal scores spread well apart:
        # raw 0.1*randn weights leave near-ties whose torch-vs-jax sort
        # order differs, changing the NMS survivor SET (the proposal sets
        # were verified identical at these gains)
        for p in m.classifier.parameters():
            p.mul_(4.0)
        for p in m.rpn.parameters():
            p.mul_(1.5)

    d, h, w = 32, 64, 64
    x = torch.randn(1, 1, d, h, w,
                    generator=torch.Generator().manual_seed(12))
    # LiTS meta layout: 3-element image_shape, window at meta[:, 4:10]
    # (LiTS_2017/model.py:1863-1870) -- one element SHORTER than the root
    # tree's (model.py:1871-1899); the root layout here would corrupt the
    # clip window
    meta = np.array([[0, d, h, w, 0, 0, 0, d, h, w] +
                     [0] * CFG.num_classes], np.float32)
    with torch.no_grad():
        det_t, mask_t = m.predict([x, torch.from_numpy(meta)], "inference")
    det_t = det_t[0].numpy()
    mask_t = mask_t[0].numpy()

    cfg = CFG.replace(stage="together", approx_topk=False,
                      detection_min_confidence=0.05, fast_unmold=False,
                      mask_pool_size=(32, 32, 32),
                      mask_shape_override=(32, 32, 32))
    params = jax.tree.map(jnp.asarray, tc.maskrcnn_from_torch(_sd(m), cfg))
    out = cfun.infer_forward(
        params, _to_jax(x), jnp.asarray(m.anchors.numpy()),
        jnp.asarray([0, 0, 0, d, h, w], jnp.float32), cfg=cfg)
    kept = np.asarray(out.det_valid)
    det_j = np.asarray(out.detections)[kept]
    mask_j = np.asarray(out.mask_probs,
                        np.float32)[kept].transpose(0, 4, 1, 2, 3)

    assert det_j.shape[0] == det_t.shape[0] >= 2
    np.testing.assert_array_equal(det_j[:, 6], det_t[:, 6])
    np.testing.assert_allclose(det_j[:, :6], det_t[:, :6], atol=1.01)
    assert (det_j[:, :6] != det_t[:, :6]).sum() <= 1
    np.testing.assert_allclose(det_j[:, 7], det_t[:, 7], atol=2e-3)
    np.testing.assert_allclose(mask_j, mask_t, atol=5e-3)
