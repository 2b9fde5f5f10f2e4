"""Geometry / sampling ops: pure jnp functions, fully vectorized.

Everything the reference implements as host-side NumPy loops mid-graph
(3D NMS utils.py:122-157, RoIAlign model.py:265-289, mask crops
model.py:481-493) lives here as jit-compatible, fixed-shape device code.
"""

from cfun_tpu.ops.boxes import (  # noqa: F401
    apply_box_deltas,
    box_refinement,
    clip_boxes,
    extend_box,
    pairwise_iou,
)
from cfun_tpu.ops.anchors import generate_pyramid_anchors  # noqa: F401
from cfun_tpu.ops.nms import masked_nms  # noqa: F401
from cfun_tpu.ops.sample3d import (  # noqa: F401
    crop_resize_align_corners,
    crop_resize_halfpix,
    resize_trilinear,
    roi_align,
    trilinear_sample,
)
