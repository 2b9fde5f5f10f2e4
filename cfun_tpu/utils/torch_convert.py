"""Reference (PyTorch) state_dict -> cfun_tpu parameter pytree converter.

Maps the reference ``MaskRCNN`` module tree (model.py:1259-1304: fpn.C1-C3 =
P3D stages, fpn.P*_conv* = FPN lateral/refine convs, rpn.*, classifier.*,
mask.modified_u_net.* = mask_branch.py Modified3DUNet) onto this repo's
nested-dict pytrees (cfun_tpu/models/*).  Two uses:

* the torch A/B parity tests (tests/test_torch_graph_parity.py) run the
  reference's own torch modules against the JAX graph on shared weights --
  the strongest Dice-parity proxy available without the MM-WHS data;
* importing real reference checkpoints (``torch.load`` -> ``state_dict`` ->
  ``maskrcnn_from_torch`` -> cfun_tpu params).

All functions take a flat ``{qualified_name: np.ndarray}`` dict (call
``{k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}``
first) so this module itself never imports torch.

Layout conventions: torch Conv3d weights are [C_out, C_in, kD, kH, kW] and
this repo's are [kD, kH, kW, C_in, C_out] (NDHWC/DHWIO); torch Linear
weights are [out, in] vs [in, out] here.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def conv_weight(w: Array) -> Array:
    """[C_out, C_in, kD, kH, kW] -> [kD, kH, kW, C_in, C_out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _conv(sd: StateDict, name: str, bias: bool = True) -> Dict[str, Array]:
    p = {"w": conv_weight(np.asarray(sd[f"{name}.weight"], np.float32))}
    if bias:
        p["b"] = np.asarray(sd[f"{name}.bias"], np.float32)
    return p


def _bn(sd: StateDict, name: str) -> Dict[str, Array]:
    return {
        "scale": np.asarray(sd[f"{name}.weight"], np.float32),
        "bias": np.asarray(sd[f"{name}.bias"], np.float32),
        "mean": np.asarray(sd[f"{name}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{name}.running_var"], np.float32),
    }


def _linear(sd: StateDict, name: str) -> Dict[str, Array]:
    return {
        "w": np.ascontiguousarray(
            np.asarray(sd[f"{name}.weight"], np.float32).T),
        "b": np.asarray(sd[f"{name}.bias"], np.float32),
    }


# ---------------------------------------------------------------------------
# P3D backbone (reference backbone.py; stages live under fpn.C* in the full
# model, model.py:1268-1273)
# ---------------------------------------------------------------------------

_BOTTLENECK_MAP = (
    ("conv1", "conv1", _conv), ("bn1", "bn1", _bn),
    ("conv_s", "conv2", _conv), ("bn_s", "bn2", _bn),
    ("conv_t", "conv3", _conv), ("bn_t", "bn3", _bn),
    ("conv4", "conv4", _conv), ("bn4", "bn4", _bn),
)


def _bottleneck(sd: StateDict, prefix: str) -> Dict:
    p = {ours: fn(sd, f"{prefix}.{theirs}")
         for ours, theirs, fn in _BOTTLENECK_MAP}
    if f"{prefix}.downsample.0.weight" in sd:
        p["down_conv"] = _conv(sd, f"{prefix}.downsample.0")
        p["down_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return p


def p3d_from_torch(sd: StateDict, depths, prefix: str = "") -> Dict:
    """P3D stage modules -> ``params['backbone']``.

    ``prefix`` locates the stages: '' for a bare ``backbone.P3D`` module
    (whose children are C1/C2/C3) or 'fpn.' inside a full MaskRCNN
    state_dict.  ``depths`` = (2, 3) for P3D19, (4, 5) for P3D35.
    """
    params = {
        "stem_conv": _conv(sd, f"{prefix}C1.0"),
        "stem_bn": _bn(sd, f"{prefix}C1.1"),
    }
    for stage, depth in zip((2, 3), depths):
        params[f"c{stage}"] = [
            _bottleneck(sd, f"{prefix}C{stage}.{b}") for b in range(depth)]
    return params


# ---------------------------------------------------------------------------
# FPN / RPN / Classifier (reference model.py:124-148, 700-743, 750-784)
# ---------------------------------------------------------------------------

def fpn_from_torch(sd: StateDict, prefix: str = "fpn.") -> Dict:
    return {ours: _conv(sd, f"{prefix}{theirs}")
            for ours, theirs in (("p3_conv1", "P3_conv1"),
                                 ("p3_conv2", "P3_conv2"),
                                 ("p2_conv1", "P2_conv1"),
                                 ("p2_conv2", "P2_conv2"))}


def rpn_from_torch(sd: StateDict, prefix: str = "rpn.") -> Dict:
    return {
        "shared": _conv(sd, f"{prefix}conv_shared"),
        "cls": _conv(sd, f"{prefix}conv_class"),
        "bbox": _conv(sd, f"{prefix}conv_bbox"),
    }


def classifier_from_torch(sd: StateDict, prefix: str = "classifier.") -> Dict:
    return {
        "conv1": _conv(sd, f"{prefix}conv1"),
        "bn1": _bn(sd, f"{prefix}bn1"),
        "conv2": _conv(sd, f"{prefix}conv2"),
        "bn2": _bn(sd, f"{prefix}bn2"),
        "cls": _linear(sd, f"{prefix}linear_class"),
        "bbox": _linear(sd, f"{prefix}linear_bbox"),
    }


# ---------------------------------------------------------------------------
# Modified 3D U-Net (reference mask_branch.py:11-220)
# ---------------------------------------------------------------------------

_UNET_MAP = (
    ("c1_1", "conv3d_c1_1"),
    ("c1_2", "conv3d_c1_2"),
    ("c1_lrelu_conv", "lrelu_conv_c1.1"),
    ("c2_down", "conv3d_c2"), ("c2_conv", "norm_lrelu_conv_c2.2"),
    ("c3_down", "conv3d_c3"), ("c3_conv", "norm_lrelu_conv_c3.2"),
    ("c4_down", "conv3d_c4"), ("c4_conv", "norm_lrelu_conv_c4.2"),
    ("c5_down", "conv3d_c5"), ("c5_conv", "norm_lrelu_conv_c5.2"),
    ("l0_up_conv", "norm_lrelu_upscale_conv_norm_lrelu_l0.3"),
    ("l0_conv", "conv3d_l0"),
    ("l1_conv", "conv_norm_lrelu_l1.0"),
    ("l1_reduce", "conv3d_l1"),
    ("l1_up_conv", "norm_lrelu_upscale_conv_norm_lrelu_l1.3"),
    ("l2_conv", "conv_norm_lrelu_l2.0"),
    ("l2_reduce", "conv3d_l2"),
    ("l2_up_conv", "norm_lrelu_upscale_conv_norm_lrelu_l2.3"),
    ("l3_conv", "conv_norm_lrelu_l3.0"),
    ("l3_reduce", "conv3d_l3"),
    ("l3_up_conv", "norm_lrelu_upscale_conv_norm_lrelu_l3.3"),
    ("l4_conv", "conv_norm_lrelu_l4.0"),
    ("l4_out", "conv3d_l4"),
    ("ds2", "ds2_1x1_conv3d"),
    ("ds3", "ds3_1x1_conv3d"),
    ("out_upscale", "out_upscale_conv.1"),
)


def unet_from_torch(sd: StateDict, prefix: str = "") -> Dict:
    """Modified3DUNet state_dict -> ``params['mask']['unet']`` (all convs
    bias-free, mask_branch.py; InstanceNorm3d is affine-free so carries no
    parameters)."""
    return {ours: _conv(sd, f"{prefix}{theirs}", bias=False)
            for ours, theirs in _UNET_MAP}


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def maskrcnn_from_torch(sd: StateDict, cfg) -> Dict:
    """Full reference ``MaskRCNN.state_dict()`` -> cfun_tpu params tree
    (same structure as ``cfun_tpu.models.cfun.init_params``)."""
    from cfun_tpu.models.p3d import BACKBONE_DEPTHS
    return {
        "backbone": p3d_from_torch(sd, BACKBONE_DEPTHS[cfg.backbone],
                                   prefix="fpn."),
        "fpn": fpn_from_torch(sd, prefix="fpn."),
        "rpn": rpn_from_torch(sd, prefix="rpn."),
        "classifier": classifier_from_torch(sd, prefix="classifier."),
        "mask": {"unet": unet_from_torch(sd, prefix="mask.modified_u_net.")},
    }
