"""Module-level A/B parity against the reference's own PyTorch modules.

Loads the reference implementation from /root/reference (CPU, eval mode),
copies its weights into the JAX pytrees via
:mod:`cfun_tpu.utils.torch_convert`, and asserts forward outputs match on
shared random weights + inputs:

  * P3D19 backbone           (reference backbone.py:117-164)
  * Modified3DUNet           (reference mask_branch.py:11-220), both stages
  * FPN + RPN heads          (reference model.py:124-148, 700-743)
  * pyramid_roi_align + Classifier  (reference model.py:265-370, 750-784)
  * full-checkpoint conversion -> infer_forward smoke

This is the strongest Dice-parity proxy available without MM-WHS data: the
graphs are numerically interchangeable module by module, so segmentation
quality differences can only come from training, not the model.
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
from cfun_tpu.models import cfun  # noqa: E402
from cfun_tpu.models.fpn import apply_fpn  # noqa: E402
from cfun_tpu.models.heads import apply_classifier, apply_mask_head  # noqa: E402
from cfun_tpu.models.p3d import apply_p3d  # noqa: E402
from cfun_tpu.models.rpn import apply_rpn  # noqa: E402
from cfun_tpu.models.unet3d import apply_unet  # noqa: E402
from cfun_tpu.utils import torch_convert as tc  # noqa: E402

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with stubs for its unavailable I/O deps
    (nibabel/skimage are not installed here; only geometry/graph code is
    exercised) and host-side .cuda() no-op'd for CPU execution."""
    for name in ("nibabel", "skimage", "skimage.transform", "imgaug",
                 "imgaug.augmenters"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__version__ = "0.0.0"
            sys.modules[name] = mod
    sys.modules["skimage"].transform = sys.modules["skimage.transform"]

    def _resize(image, output_shape, order=1, mode="constant", cval=0,
                clip=True, preserve_range=True, **kw):
        # functional skimage.transform.resize stand-in (half-pixel, AA off)
        # so the reference's utils.resize-based paths (GT mask crops,
        # model.py:481-493) actually run; our resample.resize implements
        # the identical convention (scipy-oracle-tested)
        from cfun_tpu.data.resample import resize as _r
        return _r(np.asarray(image), tuple(output_shape), order=order)

    sys.modules["skimage.transform"].resize = _resize
    sys.path.insert(0, REFERENCE)
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        import backbone as ref_backbone
        import mask_branch as ref_mask_branch
        import model as ref_model
    finally:
        sys.path.remove(REFERENCE)
    return types.SimpleNamespace(backbone=ref_backbone,
                                 mask_branch=ref_mask_branch,
                                 model=ref_model)


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
    """[B, C, D, H, W] -> [B, D, H, W, C]."""
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 4, 1))


def _from_jax(y: jnp.ndarray) -> np.ndarray:
    """[B, D, H, W, C] -> [B, C, D, H, W]."""
    return np.asarray(y).transpose(0, 4, 1, 2, 3)


def _assert_close(torch_out: torch.Tensor, jax_out_ncdhw: np.ndarray,
                  tol: float = 1e-3):
    a = torch_out.detach().numpy()
    b = jax_out_ncdhw
    scale = max(np.abs(a).max(), 1e-3)
    np.testing.assert_allclose(b, a, atol=tol * scale, rtol=tol)


class _RefConfig:
    """Minimal stand-in for the reference config object."""
    BACKBONE_CHANNELS = (4, 8)


CFG = tiny_config()  # backbone_channels (4,8), fpn 16, rpn 16, fc 16, unet 4


@pytest.fixture(scope="module")
def ref_p3d(ref):
    m = ref.backbone.P3D19(input_channel=1, config=_RefConfig()).eval()
    _randomize(m, 0)
    return m


def test_p3d_forward_parity(ref_p3d):
    """Both stage outputs match the torch P3D19 (incl. the space-to-depth
    stem reformulation, nn.conv3d_stem_s2d)."""
    x = torch.randn(1, 1, 32, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        c1 = ref_p3d.C1(x)
        c2_t = ref_p3d.C2(c1)
        c3_t = ref_p3d.C3(c2_t)

    params = tc.p3d_from_torch(_sd(ref_p3d), (2, 3))
    c2_j, c3_j = apply_p3d(params, _to_jax(x), CFG, dtype=jnp.float32)
    _assert_close(c2_t, _from_jax(c2_j))
    _assert_close(c3_t, _from_jax(c3_j))


@pytest.mark.parametrize("stage", ["beginning", "finetune"])
def test_unet_forward_parity(ref, stage):
    m = ref.mask_branch.Modified3DUNet(1, CFG.num_classes, stage,
                                       CFG.unet_base_channels).eval()
    _randomize(m, 2)
    # 32^3: the smallest crop whose level-5 bottleneck keeps >1 spatial
    # element (torch InstanceNorm3d rejects 1^3; the reference never runs
    # below mask_pool 96^3 / (32, 80, 80))
    x = torch.randn(1, 1, 32, 32, 32,
                    generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        y_t = m(x)

    unet = tc.unet_from_torch(_sd(m))
    y_j = apply_unet(unet, _to_jax(x), stage=stage, dtype=jnp.float32)
    _assert_close(y_t, _from_jax(y_j), tol=2e-3)


@pytest.fixture(scope="module")
def ref_fpn_rpn(ref, ref_p3d):
    c1, c2, c3 = ref_p3d.stages()
    fpn = ref.model.FPN(c1, c2, c3, out_channels=CFG.fpn_channels,
                        config=_RefConfig()).eval()
    rpn = ref.model.RPN(len(CFG.anchor_ratios), CFG.anchor_stride,
                        CFG.fpn_channels, CFG.rpn_conv_channels).eval()
    # randomize only the FPN lateral/refine convs (P3D already randomized)
    g = torch.Generator().manual_seed(4)
    with torch.no_grad():
        for name, p in fpn.named_parameters():
            if name.startswith("P"):
                p.copy_(0.1 * torch.randn(p.shape, generator=g))
        for p in rpn.parameters():
            p.copy_(0.1 * torch.randn(p.shape, generator=g))
    return fpn, rpn


def test_fpn_rpn_parity(ref_fpn_rpn, ref_p3d):
    fpn_t, rpn_t = ref_fpn_rpn
    x = torch.randn(1, 1, 32, 64, 64,
                    generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        p2_t, p3_t = fpn_t(x)
        logits2_t, _, bbox2_t = rpn_t(p2_t)
        logits3_t, _, bbox3_t = rpn_t(p3_t)

    sd_fpn = _sd(fpn_t)  # contains C1/C2/C3 + P*_conv* under bare names
    bb = tc.p3d_from_torch(sd_fpn, (2, 3))
    fp = tc.fpn_from_torch(sd_fpn, prefix="")
    rp = tc.rpn_from_torch(_sd(rpn_t), prefix="")

    c2, c3 = apply_p3d(bb, _to_jax(x), CFG, dtype=jnp.float32)
    p2, p3 = apply_fpn(fp, c2, c3, dtype=jnp.float32)
    _assert_close(p2_t, _from_jax(p2))
    _assert_close(p3_t, _from_jax(p3))

    l2, d2 = apply_rpn(rp, p2, CFG.anchor_stride, dtype=jnp.float32)
    l3, d3 = apply_rpn(rp, p3, CFG.anchor_stride, dtype=jnp.float32)
    # both flatten [D, H, W, A] in the same spatial order -> elementwise
    np.testing.assert_allclose(np.asarray(l2), logits2_t.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d3), bbox3_t.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(l3), logits3_t.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d2), bbox2_t.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_classifier_pyramid_roi_parity(ref, ref_fpn_rpn):
    """Full torch Classifier.forward (incl. the reference's RoI_Align and
    pyramid level assignment) vs pyramid_roi_align + apply_classifier."""
    fpn_t, _ = ref_fpn_rpn
    cls_t = ref.model.Classifier(CFG.fpn_channels, list(CFG.pool_size),
                                 [64, 64, 32, 1], 2, CFG.fc_size).eval()
    _randomize(cls_t, 6)

    x = torch.randn(1, 1, 32, 64, 64,
                    generator=torch.Generator().manual_seed(7))
    # normalized (z1, y1, x1, z2, y2, x2): sizes straddling the level rule
    boxes = np.array([
        [0.10, 0.10, 0.10, 0.60, 0.70, 0.80],
        [0.20, 0.25, 0.30, 0.45, 0.50, 0.55],
        [0.00, 0.00, 0.00, 0.95, 0.90, 0.85],
        [0.40, 0.35, 0.30, 0.70, 0.85, 0.90],
        [0.05, 0.55, 0.45, 0.30, 0.80, 0.70],
    ], np.float32)

    with torch.no_grad():
        p2_t, p3_t = fpn_t(x)
        logits_t, _, bbox_t = cls_t([p2_t, p3_t], torch.from_numpy(boxes))

    sd_fpn = _sd(fpn_t)
    bb = tc.p3d_from_torch(sd_fpn, (2, 3))
    fp = tc.fpn_from_torch(sd_fpn, prefix="")
    cl = tc.classifier_from_torch(_sd(cls_t), prefix="")

    c2, c3 = apply_p3d(bb, _to_jax(x), CFG, dtype=jnp.float32)
    p2, p3 = apply_fpn(fp, c2, c3, dtype=jnp.float32)
    pooled = cfun.pyramid_roi_align(jnp.asarray(boxes), p2[0], p3[0],
                                    CFG.pool_size)
    logits_j, deltas_j = apply_classifier(cl, pooled, dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(deltas_j),
                               bbox_t.numpy(), atol=1e-3, rtol=1e-3)


def test_full_checkpoint_conversion(ref, ref_p3d):
    """A MaskRCNN-shaped state_dict (fpn./rpn./classifier./mask.modified_u_net.
    prefixes, model.py:1268-1295) converts to the exact init_params tree
    structure and runs the jit'd inference graph."""
    c1, c2, c3 = ref_p3d.stages()

    class RefMaskRCNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fpn = ref.model.FPN(c1, c2, c3, CFG.fpn_channels,
                                     _RefConfig())
            self.rpn = ref.model.RPN(1, 1, CFG.fpn_channels,
                                     CFG.rpn_conv_channels)
            self.classifier = ref.model.Classifier(
                CFG.fpn_channels, list(CFG.pool_size), [64, 64, 32, 1], 2,
                CFG.fc_size)
            self.mask = ref.model.Mask(1, list(CFG.mask_pool_size),
                                       CFG.num_classes,
                                       CFG.unet_base_channels, CFG.stage)

    m = RefMaskRCNN().eval()
    _randomize(m, 8)
    params = tc.maskrcnn_from_torch(_sd(m), CFG)

    # identical tree structure + leaf shapes as the native initializer
    ref_tree = cfun.init_params(jax.random.PRNGKey(0), CFG)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_tree)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes

    # and the converted tree drives the real inference program
    from cfun_tpu.ops.anchors import config_anchors
    d, h, w = CFG.image_shape
    image = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, d, h, w, 1)).astype(np.float32))
    out = cfun.infer_forward(
        jax.tree.map(jnp.asarray, params), image,
        jnp.asarray(config_anchors(CFG)),
        jnp.asarray([0, 0, 0, d, h, w], jnp.float32), cfg=CFG)
    assert np.all(np.isfinite(np.asarray(out.detections)))


def test_geometry_ops_ab_vs_reference(ref):
    """Direct A/B of the L2 geometry ops against the reference's own code
    (utils.py:73-157, model.py:155-196) on shared random inputs -- catches
    IoU/coordinate-convention drift that hand oracles could share."""
    utils_ref = ref.model.utils
    rng = np.random.default_rng(0)
    lo = rng.uniform(0, 60, size=(40, 3))
    sz = rng.uniform(4, 40, size=(40, 3))
    boxes = np.concatenate([lo, lo + sz], -1).astype(np.float32)
    scores = rng.random(40).astype(np.float32)

    # greedy NMS (utils.py:122-157)
    from cfun_tpu.ops.nms import masked_nms
    keep_ref = utils_ref.non_max_suppression(boxes, scores, 0.3, 10)
    order = np.argsort(scores)[::-1].copy()
    idx, keep = masked_nms(jnp.asarray(boxes[order]),
                           jnp.asarray(scores[order]),
                           jnp.ones(40, bool), 0.3, 10)
    got = order[np.asarray(idx)][np.asarray(keep)]
    np.testing.assert_array_equal(got, keep_ref)

    # apply_box_deltas (model.py:155-182)
    from cfun_tpu.ops.boxes import apply_box_deltas, clip_boxes, pairwise_iou
    deltas = rng.normal(0, 0.1, size=(40, 6)).astype(np.float32)
    want = ref.model.apply_box_deltas(torch.from_numpy(boxes),
                                      torch.from_numpy(deltas)).numpy()
    ours = np.asarray(apply_box_deltas(jnp.asarray(boxes),
                                       jnp.asarray(deltas)))
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-4)

    # clip_boxes (model.py:185-196)
    window = np.array([0, 0, 0, 64, 80, 80], np.float32)
    want = ref.model.clip_boxes(torch.from_numpy(boxes), window).numpy()
    ours = np.asarray(clip_boxes(jnp.asarray(boxes), jnp.asarray(window)))
    np.testing.assert_allclose(ours, want, rtol=1e-6, atol=1e-5)

    # compute_overlaps (utils.py:73-89)
    lo2 = rng.uniform(0, 60, size=(7, 3))
    sz2 = rng.uniform(4, 40, size=(7, 3))
    boxes2 = np.concatenate([lo2, lo2 + sz2], -1).astype(np.float32)
    want = utils_ref.compute_overlaps(boxes.astype(np.float64),
                                      boxes2.astype(np.float64))
    ours = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes2)))
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_load_any_imports_reference_torch_checkpoint(ref, ref_p3d, tmp_path):
    """checkpoint.load_any must auto-detect a torch.save(state_dict) file
    (the reference's checkpoint format, model.py:1563-1570) and convert it
    to the params tree; native .npz files still load natively."""
    c1, c2, c3 = ref_p3d.stages()

    class RefMaskRCNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fpn = ref.model.FPN(c1, c2, c3, CFG.fpn_channels,
                                     _RefConfig())
            self.rpn = ref.model.RPN(1, 1, CFG.fpn_channels,
                                     CFG.rpn_conv_channels)
            self.classifier = ref.model.Classifier(
                CFG.fpn_channels, list(CFG.pool_size), [64, 64, 32, 1], 2,
                CFG.fc_size)
            self.mask = ref.model.Mask(1, list(CFG.mask_pool_size),
                                       CFG.num_classes,
                                       CFG.unet_base_channels, CFG.stage)

    m = RefMaskRCNN().eval()
    _randomize(m, 9)
    pth = str(tmp_path / "reference_model_epoch5")
    torch.save(m.state_dict(), pth)

    from cfun_tpu.utils import checkpoint
    template = cfun.init_params(jax.random.PRNGKey(0), CFG)
    params, _, meta = checkpoint.load_any(pth, CFG, template)
    assert meta["source"] == "torch"
    want = tc.maskrcnn_from_torch(_sd(m), CFG)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(want)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # native npz round-trips through the same entry point
    npz = str(tmp_path / "native_ckpt")
    checkpoint.save(npz, want, epoch=3)
    params2, _, meta2 = checkpoint.load_any(npz, CFG, template)
    assert meta2.get("epoch") == 3


class _TinyPredictConfig:
    """Reference-config stand-in sized to tiny_config (reference
    config.py:14-200 attribute surface used by MaskRCNN.build/predict)."""
    NAME = "tiny"
    GPU_COUNT = 0
    IMAGE_SHAPE = np.array([64, 64, 32, 1])  # [H, W, D, C]
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
    MASK_POOL_SIZE = list(CFG.mask_pool_size)
    DETECTION_MIN_CONFIDENCE = 0.05  # random weights score ~0.5; the
    # reference crashes on zero survivors (model.py:662 nms_keep unbound)
    DETECTION_NMS_THRESHOLD = CFG.detection_nms_threshold
    DETECTION_MAX_INSTANCES = CFG.detection_max_instances
    STAGE = CFG.stage
    TRAIN_BN = False


@pytest.mark.parametrize("stage", ["beginning", "finetune"])
def test_whole_graph_predict_parity(ref, tmp_path, stage):
    """END-TO-END A/B: the reference's full ``MaskRCNN.predict(inference)``
    (model.py:1391-1463 -- trunk, proposal_layer NMS, classifier,
    detection_layer, raw-image mask crops, U-Net, softmax) against our
    jit'd ``infer_forward`` on the SAME weights and the SAME input.

    The one deliberate graph deviation (PARITY.md C9: z-major anchor
    flattening) is neutralized by feeding our graph the reference's own
    anchor array, so prediction slot i pairs with the identical anchor
    geometry in both graphs.  Everything downstream -- proposals,
    refined detections (count, class ids, rounded voxel boxes, scores)
    and the per-detection mask probability stacks -- must then agree,
    which is the strongest full-graph Dice-parity proxy available
    without MM-WHS data."""
    rcfg = _TinyPredictConfig()
    # 32^3 mask crops: the smallest size whose U-Net bottleneck keeps >1
    # spatial element (torch InstanceNorm3d rejects 1^3, see
    # test_unet_forward_parity).  'finetune' also exercises the U-Net 2x
    # upscale head end-to-end (mask_branch.py:216-218)
    rcfg.MASK_POOL_SIZE = [32, 32, 32]
    rcfg.STAGE = stage
    m = ref.model.MaskRCNN(rcfg, str(tmp_path), test_flag=True).eval()
    _randomize(m, 4)
    with torch.no_grad():
        # amplify the classifier so roi scores spread well apart (raw
        # 0.1*randn weights give near-uniform ~0.509 background scores for
        # every roi -- zero detections crashes the reference, model.py:662);
        # seed 4 + 4x yields a mixed 3-of-8 foreground split
        for p in m.classifier.parameters():
            p.mul_(4.0)

    d, h, w = CFG.image_shape
    x = torch.randn(1, 1, d, h, w,
                    generator=torch.Generator().manual_seed(12))
    meta = np.array([[0, 1, d, h, w, 0, 0, 0, d, h, w] +
                     [0] * CFG.num_classes], np.float32)
    with torch.no_grad():
        det_t, mask_t = m.predict([x, torch.from_numpy(meta)], "inference")
    det_t = det_t[0].numpy()          # [N, 8] voxel boxes + class + score
    mask_t = mask_t[0].numpy()        # [N, C, md, mh, mw] softmax probs

    cfg = tiny_config(stage=stage).replace(
        approx_topk=False, detection_min_confidence=0.05,
        mask_pool_size=(32, 32, 32),
        mask_shape_override=(32, 32, 32) if stage != "finetune"
        else (64, 64, 64))
    params = jax.tree.map(jnp.asarray, tc.maskrcnn_from_torch(_sd(m), cfg))
    out = cfun.infer_forward(
        params, _to_jax(x), jnp.asarray(m.anchors.numpy()),
        jnp.asarray([0, 0, 0, d, h, w], jnp.float32), cfg=cfg)
    kept = np.asarray(out.det_valid)
    det_j = np.asarray(out.detections)[kept]
    mask_j = np.asarray(out.mask_probs,
                        np.float32)[kept].transpose(0, 4, 1, 2, 3)

    assert det_j.shape[0] == det_t.shape[0], \
        f"detection count {det_j.shape[0]} vs reference {det_t.shape[0]}"
    np.testing.assert_array_equal(det_j[:, 6], det_t[:, 6])  # class ids
    np.testing.assert_allclose(det_j[:, :6], det_t[:, :6], atol=1.01)
    np.testing.assert_allclose(det_j[:, 7], det_t[:, 7], atol=2e-3)
    # box agreement is exact in practice (both round the same f32 values);
    # tolerate at most one 1-voxel rounding flip overall
    assert (det_j[:, :6] != det_t[:, :6]).sum() <= 1
    np.testing.assert_allclose(mask_j, mask_t, atol=5e-3)


def test_rpn_target_assigner_ab_vs_reference(ref):
    """build_rpn_targets A/B (reference model.py:1090-1181) on the
    reference's own anchors, subsampling disabled so both sides are
    deterministic: identical match vectors, and our dense per-anchor
    deltas equal the reference's packed rows at the positive indices."""
    utils_ref = ref.model.utils
    d, h, w = CFG.image_shape
    anchors = utils_ref.generate_pyramid_anchors(
        CFG.anchor_scales, list(CFG.anchor_ratios),
        [[d // s, h // s, w // s] for s in CFG.backbone_strides],
        list(CFG.backbone_strides), CFG.anchor_stride).astype(np.float32)
    gt = np.array([6.0, 18.0, 20.0, 26.0, 50.0, 52.0], np.float32)

    class _RC:
        RPN_TRAIN_ANCHORS_PER_IMAGE = 10_000  # > anchor count: no subsample
        RPN_BBOX_STD_DEV = np.array(CFG.rpn_bbox_std)

    # the reference tiles the one organ box x(C-1) (model.py:1076) --
    # identical columns, so the per-anchor argmax resolves to column 0
    match_ref, bbox_ref = ref.model.build_rpn_targets(
        anchors, np.repeat(gt[None], CFG.num_classes - 1, 0), _RC())

    from cfun_tpu.train.targets import build_rpn_targets
    cfg = CFG.replace(rpn_train_anchors_per_image=10_000)
    match, deltas = build_rpn_targets(anchors, gt, cfg,
                                      np.random.default_rng(0))
    np.testing.assert_array_equal(match, match_ref)
    pos = np.flatnonzero(match_ref == 1)
    assert pos.size > 0
    np.testing.assert_allclose(deltas[pos], bbox_ref[:pos.size],
                               rtol=1e-5, atol=1e-6)


def test_detection_target_layer_ab_vs_reference(ref):
    """detection_target_layer A/B (reference model.py:414-563), sized so
    the sampling is deterministic on both sides (positive capacity ==
    positive count; negative pool smaller than the 1:2 quota, so both keep
    everything -- ROI_POSITIVE_RATIO=1.0 would be simpler but trips a
    reference bug: `masks` is unbound when negative_count == 0,
    model.py:540-543): same ROI sets, class ids, normalized deltas, and
    bit-identical GT mask crops (our on-device one_hot_crop vs the
    reference's int-truncate + skimage order=0 crop-resize of the
    8-channel stack)."""
    rng = np.random.default_rng(9)
    d, h, w = CFG.image_shape
    labels = np.zeros((d, h, w), np.int32)
    labels[8:24, 16:48, 20:52] = 1
    labels[12:20, 24:40, 28:44] = 2
    labels[14:18, 28:34, 30:38] = 3
    gt_box = np.array([8, 16, 20, 24, 48, 52], np.float32)
    gt_norm = gt_box / np.array([d, h, w, d, h, w], np.float32)

    # 5 positives (>=0.5 IoU with the organ box) + 3 negatives, on integer
    # voxel corners
    proposals = np.array([
        [8, 16, 20, 24, 48, 52],
        [7, 14, 18, 23, 46, 50],
        [9, 18, 22, 25, 50, 54],
        [8, 20, 24, 24, 44, 48],
        [10, 16, 20, 26, 48, 52],
        [0, 0, 0, 6, 12, 12],
        [24, 50, 52, 30, 62, 62],
        [0, 40, 40, 8, 60, 60],
    ], np.float32) / np.array([d, h, w, d, h, w], np.float32)

    class _RC:
        GPU_COUNT = 0
        DETECTION_TARGET_IOU_THRESHOLD = CFG.detection_target_iou
        TRAIN_ROIS_PER_IMAGE = 18  # cap int(18 * 0.33) = 5 = all positives
        ROI_POSITIVE_RATIO = 0.33  # negative quota 10 > the 3 available
        BBOX_STD_DEV = np.array(CFG.bbox_std)
        MASK_SHAPE = tuple(CFG.mask_shape)

    onehot8 = np.zeros((8, d, h, w), np.int32)  # the layer hardcodes 8
    for c in range(CFG.num_classes):
        onehot8[c][labels == c] = 1
    p_rois_t, rois_t, ids_t, deltas_t, masks_t = \
        ref.model.detection_target_layer(
            torch.from_numpy(proposals[None]),
            torch.from_numpy(np.arange(1, CFG.num_classes)[None]),
            torch.from_numpy(np.repeat(gt_norm[None],
                                       CFG.num_classes - 1, 0)[None]),
            torch.from_numpy(onehot8[None]), _RC())

    from cfun_tpu.train.targets import detection_targets
    cfg = CFG.replace(roi_positive_ratio=0.33, train_rois_per_image=18)
    padded = np.zeros((32, 6), np.float32)  # capacity >= ROI caps, like
    padded[:8] = proposals                  # the real post-NMS proposal set
    valid = np.zeros(32, bool)
    valid[:8] = True
    out = detection_targets(jax.random.PRNGKey(3), jnp.asarray(padded),
                            jnp.asarray(valid), jnp.asarray(gt_norm),
                            jnp.asarray(labels), cfg)
    pos_ok = np.asarray(out.pos_valid)
    pos_j = np.asarray(out.pos_rois)[pos_ok]
    deltas_j = np.asarray(out.deltas)[:pos_ok.size][pos_ok]
    masks_j = np.asarray(out.masks)[pos_ok]

    pos_t = p_rois_t.numpy()
    assert pos_j.shape[0] == pos_t.shape[0] == 5
    # both sides shuffle order; align by sorting rows
    oj = np.lexsort(pos_j.T[::-1])
    ot = np.lexsort(pos_t.T[::-1])
    np.testing.assert_allclose(pos_j[oj], pos_t[ot], atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out.class_ids)[:pos_ok.size][pos_ok], 1)
    np.testing.assert_array_equal(ids_t.numpy()[:5], 1)
    np.testing.assert_allclose(deltas_j[oj], deltas_t.numpy()[ot],
                               rtol=1e-4, atol=1e-5)
    # negative set (both keep all 3: quota 10 > pool)
    neg_j = np.asarray(out.rois)[5:][np.asarray(out.roi_valid)[5:]]
    neg_t = rois_t.numpy()[5:]
    assert neg_j.shape == neg_t.shape == (3, 6)
    np.testing.assert_allclose(
        neg_j[np.lexsort(neg_j.T[::-1])],
        neg_t[np.lexsort(neg_t.T[::-1])], atol=1e-6)
    # GT mask crops: reference ships the 8-channel one-hot stack; ours
    # argmax-equivalent one-hot crop -- compare label crops exactly
    lab_t = np.argmax(masks_t.numpy()[ot], axis=1)
    lab_j = np.argmax(masks_j[oj], axis=-1)
    np.testing.assert_array_equal(lab_j, lab_t)


def test_whole_train_graph_losses_parity(ref, tmp_path):
    """END-TO-END TRAINING A/B: the reference's full
    ``MaskRCNN.predict('training')`` + ``compute_losses`` (model.py:
    1465-1514, 984-1000) against our jit-able ``train_forward`` on shared
    weights, anchors (the reference's own array) and GT.

    Determinism recipe: the GT box is set to the reference's own first
    proposal (so >=1 positive exists); ROI caps are sized so every
    positive and every negative candidate is kept on both sides
    (positive cap 10 >= P, negative quota 31*P >= the 32-P pool), RPN
    subsampling is disabled, and U-Net dropout is zeroed on both sides.
    Both samplers then select the same ROI *sets* (order shuffled), and
    every loss is an order-invariant mean -- so all five active losses
    must agree.  This is the training-side counterpart of
    test_whole_graph_predict_parity and exercises the full wiring:
    trunk -> proposals -> target sampling -> heads -> losses."""
    rcfg = _TinyPredictConfig()
    rcfg.MASK_POOL_SIZE = [32, 32, 32]   # U-Net needs >=32^3 (see above)
    rcfg.MASK_SHAPE = (32, 32, 32)
    rcfg.STAGE = "beginning"             # edge loss off (typo deviation)
    rcfg.TRAIN_ROIS_PER_IMAGE = 320
    rcfg.ROI_POSITIVE_RATIO = 0.03125    # pos cap 10, neg quota 31*P
    rcfg.POST_NMS_ROIS_TRAINING = 32
    rcfg.RPN_TRAIN_ANCHORS_PER_IMAGE = 10_000
    rcfg.BBOX_STD_DEV = np.array(CFG.bbox_std)
    rcfg.DETECTION_TARGET_IOU_THRESHOLD = CFG.detection_target_iou
    m = ref.model.MaskRCNN(rcfg, str(tmp_path), test_flag=False)
    _randomize(m, 4)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.Dropout3d):
                mod.p = 0.0

    d, h, w = CFG.image_shape
    x = torch.randn(1, 1, d, h, w,
                    generator=torch.Generator().manual_seed(12))

    # probe the proposals once (trunk has no dropout; BN eval both modes)
    # to pick a GT box guaranteed to have >=1 positive ROI
    m.eval()
    with torch.no_grad():
        p2, p3 = m.fpn(x)
        lo = [m.rpn(p) for p in (p2, p3)]
        _, rc, rb = [torch.cat(list(o), dim=1) for o in zip(*lo)]
        probe = ref.model.proposal_layer(
            [rc, rb], proposal_count=rcfg.POST_NMS_ROIS_TRAINING,
            nms_threshold=rcfg.RPN_NMS_THRESHOLD, anchors=m.anchors,
            config=rcfg)[0]
    scale = np.array([d, h, w, d, h, w], np.float32)
    gt_norm = probe[0].numpy().astype(np.float32)
    gt_vox = gt_norm * scale

    labels = np.zeros((d, h, w), np.int32)
    z1, y1, x1, z2, y2, x2 = (int(v) for v in gt_vox)
    labels[z1:z2, y1:y2, x1:x2] = 1
    labels[(z1 + z2) // 2:z2, (y1 + y2) // 2:y2, (x1 + x2) // 2:x2] = 2
    onehot8 = np.zeros((8, d, h, w), np.float32)
    for c in range(CFG.num_classes):
        onehot8[c][labels == c] = 1

    meta = np.array([[0, 1, d, h, w, 0, 0, 0, d, h, w] +
                     [0] * CFG.num_classes], np.float32)
    gt_ids = torch.from_numpy(np.arange(1, CFG.num_classes)[None])
    gt_boxes = torch.from_numpy(
        np.repeat(gt_vox[None], CFG.num_classes - 1, 0)[None])
    with torch.no_grad():
        outs = m.predict([x, torch.from_numpy(meta), gt_ids, gt_boxes,
                          torch.from_numpy(onehot8[None])], "training")
    (rpn_logits_t, rpn_pred_t, tgt_ids_t, cls_logits_t, tgt_deltas_t,
     bbox_t, tgt_mask_t, mask_probs_t, mask_logits_t) = outs
    n_pos = int((tgt_ids_t > 0).sum())
    assert n_pos >= 1
    assert tgt_ids_t.shape[0] == 32  # every candidate kept => deterministic

    anchors_np = m.anchors.numpy()
    match_t, rpn_bbox_t = ref.model.build_rpn_targets(
        anchors_np, np.repeat(gt_vox[None], CFG.num_classes - 1, 0), rcfg)
    with torch.no_grad():
        losses_t = ref.model.compute_losses(
            torch.from_numpy(match_t[None, :, None]),
            torch.from_numpy(rpn_bbox_t[None].astype(np.float32)),
            rpn_logits_t, rpn_pred_t, tgt_ids_t, cls_logits_t,
            tgt_deltas_t, bbox_t, tgt_mask_t, mask_probs_t,
            mask_logits_t, "beginning")
    want = {k: float(v) for k, v in zip(
        ("rpn_class_loss", "rpn_bbox_loss", "mrcnn_class_loss",
         "mrcnn_bbox_loss", "mrcnn_mask_loss", "mrcnn_mask_edge_loss"),
        losses_t)}

    # our side: same weights, same anchors, our feeder-side RPN targets
    from cfun_tpu.train.step import TrainBatch, train_forward
    from cfun_tpu.train.targets import build_rpn_targets as our_rpn_targets
    cfg = tiny_config(stage="beginning").replace(
        approx_topk=False, unet_dropout_rate=0.0,
        mask_pool_size=(32, 32, 32), mask_shape_override=(32, 32, 32),
        train_rois_per_image=320, roi_positive_ratio=0.03125,
        post_nms_rois_training=32, rpn_train_anchors_per_image=10_000)
    params = jax.tree.map(jnp.asarray, tc.maskrcnn_from_torch(_sd(m), cfg))
    match_j, deltas_j = our_rpn_targets(anchors_np, gt_vox, cfg,
                                        np.random.default_rng(0))
    batch = TrainBatch(image=_to_jax(x), rpn_match=jnp.asarray(match_j),
                       rpn_deltas=jnp.asarray(deltas_j),
                       gt_box_norm=jnp.asarray(gt_norm),
                       labels=jnp.asarray(labels))
    total, got = train_forward(params, batch, jnp.asarray(anchors_np),
                               cfg, jax.random.PRNGKey(7))

    for k in ("rpn_class_loss", "rpn_bbox_loss", "mrcnn_class_loss",
              "mrcnn_bbox_loss", "mrcnn_mask_loss"):
        # atol floors the comparison: the GT box is a refined anchor, so
        # rpn_bbox_loss is legitimately ~1e-14 float noise on both sides
        np.testing.assert_allclose(float(got[k]), want[k], rtol=5e-3,
                                   atol=1e-6, err_msg=k)
    assert want["mrcnn_mask_edge_loss"] == 0.0
    assert float(got["mrcnn_mask_edge_loss"]) == 0.0


def test_heart_losses_ab_vs_reference(ref):
    """Direct A/B of the four exactly-matching heart losses against the
    reference's own compute_* functions (model.py:808-935) on shared
    random data.  (The heart edge loss deliberately deviates -- the
    reference's gradient magnitude typo duplicates the x-component,
    model.py:959-962 -- documented in PARITY.md C21 and pinned by the
    torch-oracle test instead.)"""
    from cfun_tpu.train import losses as L

    rng = np.random.default_rng(11)
    a = 64
    match = rng.choice(np.array([-1, 0, 1], np.int8), size=a,
                       p=[0.4, 0.4, 0.2])
    rpn_logits = rng.normal(size=(a, 2)).astype(np.float32)
    rpn_pred = rng.normal(size=(a, 6)).astype(np.float32)
    dense_tgt = rng.normal(size=(a, 6)).astype(np.float32)
    dense_tgt[match != 1] = 0.0
    pos = np.flatnonzero(match == 1)
    packed_tgt = np.zeros((a, 6), np.float32)
    packed_tgt[:pos.size] = dense_tgt[pos]

    want = ref.model.compute_rpn_class_loss(
        torch.from_numpy(match.astype(np.int32)[None, :, None]),
        torch.from_numpy(rpn_logits[None])).item()
    got = float(L.rpn_class_loss(jnp.asarray(match), jnp.asarray(rpn_logits)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    want = ref.model.compute_rpn_bbox_loss(
        torch.from_numpy(packed_tgt[None]),
        torch.from_numpy(match.astype(np.int32)[None, :, None]),
        torch.from_numpy(rpn_pred[None])).item()
    got = float(L.rpn_bbox_loss(jnp.asarray(match), jnp.asarray(dense_tgt),
                                jnp.asarray(rpn_pred)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    r = 12
    class_ids = rng.integers(0, 2, size=r).astype(np.int32)
    cls_logits = rng.normal(size=(r, 2)).astype(np.float32)
    bbox_pred = rng.normal(size=(r, 2, 6)).astype(np.float32)
    bbox_tgt = rng.normal(size=(r, 6)).astype(np.float32)
    bbox_tgt[class_ids == 0] = 0.0

    want = ref.model.compute_mrcnn_class_loss(
        torch.from_numpy(class_ids.astype(np.int64)),
        torch.from_numpy(cls_logits)).item()
    got = float(L.mrcnn_class_loss(jnp.asarray(class_ids),
                                   jnp.ones(r, bool),
                                   jnp.asarray(cls_logits)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    want = ref.model.compute_mrcnn_bbox_loss(
        torch.from_numpy(bbox_tgt),
        torch.from_numpy(class_ids.astype(np.int64)),
        torch.from_numpy(bbox_pred)).item()
    got = float(L.mrcnn_bbox_loss(jnp.asarray(bbox_tgt),
                                  jnp.asarray(class_ids),
                                  jnp.ones(r, bool),
                                  jnp.asarray(bbox_pred)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # heart mask loss (unweighted CE of argmax'd one-hot stack)
    p, md, c = 3, 6, CFG.num_classes
    lab = rng.integers(0, c, size=(p, md, md, md))
    onehot = np.eye(c, dtype=np.float32)[lab]
    logits = rng.normal(size=(p, md, md, md, c)).astype(np.float32)
    onehot8 = np.concatenate(
        [onehot.transpose(0, 4, 1, 2, 3),
         np.zeros((p, 8 - c, md, md, md), np.float32)], axis=1)
    want = ref.model.compute_mrcnn_mask_loss(
        torch.from_numpy(onehot8), torch.from_numpy(np.ones(p, np.int64)),
        torch.from_numpy(logits.transpose(0, 4, 1, 2, 3))).item()
    got = float(L.mask_loss(jnp.asarray(onehot), jnp.ones(p, bool),
                            jnp.asarray(logits),
                            CFG.replace(mask_class_weights=None)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_eval_metrics_ab_vs_reference(ref):
    """per_class_mask_iou / whole_mask_iou on label volumes must equal the
    reference's stacked-binary-mask formulas (utils.py:580-617) -- the
    numbers the test CLI reports are directly comparable."""
    utils_ref = ref.model.utils
    from cfun_tpu.utils.metrics import per_class_mask_iou, whole_mask_iou

    rng = np.random.default_rng(5)
    num_classes = 5
    gt = rng.integers(0, num_classes, size=(20, 24, 16)).astype(np.int32)
    pr = rng.integers(0, num_classes, size=(20, 24, 16)).astype(np.int32)

    def stack(labels):
        # the reference's process_mask layout [H, W, D, C-1]
        return np.stack([(labels == c) for c in range(1, num_classes)],
                        axis=-1).astype(np.float32)

    want = utils_ref.compute_per_class_mask_iou(stack(gt), stack(pr))
    got = per_class_mask_iou(gt, pr, num_classes)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    want_w = utils_ref.compute_mask_iou(gt.copy(), pr.copy())
    got_w = whole_mask_iou(gt, pr)
    np.testing.assert_allclose(got_w, want_w, rtol=1e-6)
