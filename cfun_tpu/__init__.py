"""cfun-tpu: a TPU-native one-stage 3D detect-and-segment framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Wuziyi616/CFUN
("Combining Faster R-CNN and U-net for Efficient Whole Heart Segmentation",
arXiv:1812.04914): a Pseudo-3D ResNet + FPN + 3D RPN localizes a single
organ-complex bounding box in a CT volume, and a modified 3D U-Net segments
all classes inside that box in one shot.

Design stance (see SURVEY.md for the structural analysis of the reference):
  * functional core: all model code is pure functions over parameter pytrees;
  * two jit'd programs (train step / inference) replace the reference's
    dual-mode ``predict(mode=...)`` (reference: model.py:1391);
  * every dynamic shape in the reference (NMS keep lists, ROI subsampling,
    detection counts) is a fixed-capacity array plus validity mask;
  * all host work (NIfTI IO, resampling, augmentation, RPN targets) lives in
    an async feeder; the device graph never round-trips to the host;
  * scale-out is a ``jax.sharding.Mesh`` (data x space) with XLA collectives,
    something the single-GPU reference never had.

Volumes on device are NDHWC ``[batch, D, H, W, C]``.  Boxes are
``(z1, y1, x1, z2, y2, x2)``; normalized to [0, 1] inside the head pipeline.
"""

__version__ = "0.1.0"
