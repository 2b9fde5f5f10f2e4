"""Experiment configuration for cfun-tpu.

A frozen dataclass replaces the reference's mutable class-attribute config
(reference: config.py:15-232).  The ``stage`` axis ('beginning' / 'together' /
'finetune') is a first-class field because it changes array shapes
(MASK_SHAPE 96^3 vs 192^3, reference: config.py:217-224), the loss schedule
(edge loss only in finetune, reference: model.py:995-998) and, for LiTS,
which sub-networks train (LiTS_2017/model.py:1309-1311).  Each stage gets its
own jit cache; the parameter tree is shared across stages (the finetune-only
U-Net upscale head always exists in the tree).

Shape conventions: ``image_shape`` is (D, H, W) of the molded device volume
(the reference stores [H, W, D, C], heart value [320, 320, 192, 1],
reference: config.py:208-209 + heart_main.py:124-126).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

STAGES = ("beginning", "together", "finetune")


@dataclasses.dataclass(frozen=True)
class Config:
    """Static configuration; hashable so it can close over jit'd programs."""

    name: str = "heart"
    stage: str = "beginning"

    # ---- classes -----------------------------------------------------------
    num_classes: int = 8  # background + 7 heart substructures (heart_main.py:38)

    # ---- molded volume -----------------------------------------------------
    # (D, H, W): the reference molds every volume to H=W=IMAGE_MAX_DIM,
    # D=IMAGE_MIN_DIM via trilinear "self" resize (utils.py:389-393).
    image_shape: Tuple[int, int, int] = (192, 320, 320)
    image_channels: int = 1

    # ---- backbone / FPN ----------------------------------------------------
    backbone: str = "P3D19"  # P3D19 = bottleneck depths (2, 3) (backbone.py:161)
    backbone_channels: Tuple[int, int] = (16, 32)  # heart_main.py:58
    backbone_strides: Tuple[int, int] = (8, 16)  # heart_main.py:55
    backbone_stem_kernel: Tuple[int, int, int] = (3, 7, 7)  # backbone.py:124
    fpn_channels: int = 128  # TOP_DOWN_PYRAMID_SIZE (heart_main.py:67)
    rpn_conv_channels: int = 256  # heart_main.py:70
    fc_size: int = 128  # FPN_CLASSIFY_FC_LAYERS_SIZE (heart_main.py:61)
    unet_base_channels: int = 20  # UNET_MASK_BRANCH_CHANNEL (heart_main.py:64)

    # ---- anchors / RPN -----------------------------------------------------
    anchor_scales: Tuple[int, ...] = (64, 128)  # heart_main.py:76
    anchor_ratios: Tuple[float, ...] = (1.0,)
    anchor_stride: int = 1
    rpn_nms_threshold: float = 0.7
    rpn_train_anchors_per_image: int = 128  # heart_main.py:88
    pre_nms_limit: int = 1000  # heart_main.py:91
    post_nms_rois_training: int = 500  # heart_main.py:94
    post_nms_rois_inference: int = 64  # heart_main.py:95

    # ---- ROI heads ---------------------------------------------------------
    train_rois_per_image: int = 15  # heart_main.py:140
    roi_positive_ratio: float = 0.33
    pool_size: Tuple[int, int, int] = (12, 12, 12)  # heart_main.py:143
    mask_pool_size: Tuple[int, int, int] = (96, 96, 96)  # heart_main.py:144
    detection_target_iou: float = 0.5  # config.py:220
    detection_min_confidence: float = 0.7
    detection_nms_threshold: float = 0.3
    detection_max_instances: int = 32  # 1 at inference (heart_main.py:416)
    rpn_bbox_std: Tuple[float, ...] = (0.1, 0.1, 0.1, 0.2, 0.2, 0.2)
    bbox_std: Tuple[float, ...] = (0.1, 0.1, 0.1, 0.2, 0.2, 0.2)

    # ---- training schedule -------------------------------------------------
    learning_rate: float = 0.001
    momentum: float = 0.9
    weight_decay: float = 1e-4
    gradient_clip_norm: float = 5.0
    steps_per_epoch: int = 45
    validation_steps: int = 10
    grad_accum_steps: int = 1  # reference BATCH_SIZE accumulation (model.py:1642)
    epochs: int = 1000
    val_every_epochs: int = 5
    loss_weights: Tuple[Tuple[str, float], ...] = (  # heart_main.py:161-168
        ("rpn_class_loss", 100.0),
        ("rpn_bbox_loss", 50.0),
        ("mrcnn_class_loss", 1.0),
        ("mrcnn_bbox_loss", 20.0),
        ("mrcnn_mask_loss", 1.0),
        ("mrcnn_mask_edge_loss", 1.0),
    )

    # ---- dataset-variant knobs (LiTS deltas, SURVEY.md s2.2) ---------------
    # 'zscore' (heart, model.py:1902-1904) or 'hu_window' (LiTS inverted HU
    # window, LiTS_2017/model.py:1875-1886 -- preserved deliberately).
    intensity_norm: str = "zscore"
    hu_window: Tuple[float, float] = (300.0, -300.0)  # (MIN_BOUND, MAX_BOUND), swapped on purpose
    # pad-then-resize molding for LiTS (LiTS_2017/LiTS_main.py:116-124)
    pad_shape: Tuple[int, int, int] | None = None  # (D, H, W) of center-pad target
    mask_class_weights: Tuple[float, ...] | None = None  # LiTS [1,1,100]
    augment_rotate_degrees: float = 20.0  # heart: +-20 (model.py:1555); LiTS +-30
    unet_dropout_rate: float = 0.6  # heart mask_branch.py:19; 0.0 for LiTS

    # ---- TPU-specific ------------------------------------------------------
    compute_dtype: str = "bfloat16"  # conv/matmul compute dtype; params fp32
    # rematerialize the mask U-Net in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for dropping its activation memory -- for the
    # finetune 192^3 mask resolution or larger ROI batches
    remat_unet: bool = False
    # rematerialize the backbone+FPN+RPN trunk: needed where the trunk's
    # saved activations exceed HBM (LiTS P3D35 at 256x320x320 on 16 GB)
    remat_trunk: bool = False
    # memory-safe custom VJP for the U-Net's 1-channel entry conv
    safe_entry_conv: bool = True
    # on a mesh with space > 1: run the mask U-Net as the explicit
    # shard_map halo-exchange graph (ppermute halos + psum instance norms,
    # parallel/halo.py::shard_map_unet) with crop D sharded over 'space',
    # instead of leaving the crops' sharding to GSPMD propagation.  Needs
    # local D % 16 == 0 (four stride-2 levels).
    shard_unet_spatial: bool = False
    # on-device augmentation (ops/augment.py): the feeder ships the
    # UNROTATED molded volume (cached across epochs -- the mold becomes
    # angle-independent) and the jit'd step rotates, re-normalizes and
    # assigns RPN targets on device.  Heart molding only (rotate comes
    # after resize there, matching reference model.py:1019-1052); the
    # subsampling RNG moves to jax.random (PARITY.md).
    augment_on_device: bool = False
    # with augment_on_device: keep the (angle-independent) molded train
    # volumes resident in device memory across epochs -- after the first
    # epoch NO train-image bytes cross the host->device link.  The heart
    # train set fits easily (~47 int8 molded volumes ~= 0.9 GB HBM);
    # leave off where HBM is tight (finetune 192^3 masks).  Single-process
    # trainers only (the multi-controller batch assembly needs host rows).
    device_mold_cache: bool = False

    # explicit mask-shape override (tests / tiny configs); None = stage rule
    mask_shape_override: Tuple[int, int, int] | None = None

    # ---- inference wire format --------------------------------------------
    # 'bfloat16' uploads the z-scored volume losslessly for bf16 compute;
    # 'int8' quantizes (clip +-5 sigma, x25.4) -- halves host->device bytes,
    # noise is ~1% of the data sigma.  Matters on tunneled/PCIe-bound hosts.
    wire_image_dtype: str = "bfloat16"
    # int8 wire quantization scale: 25.4 spans the z-scored heart volume's
    # +-5 sigma; LiTS HU-windowed volumes live in [0, 1] and use 127
    wire_int8_scale: float = 25.4
    # int8 wire for the TRAIN image upload (halves the dominant per-step
    # H2D bytes on link-bound hosts).  Quantization noise is ~0.011 sigma
    # rms (uniform over a 1/25.4 step) -- OFF by default because it
    # changes training numerics vs the reference; the measured loss-curve
    # delta is recorded in README.
    train_wire_int8: bool = False
    # 'pallas' = single-kernel greedy NMS; 'scan' = lax.scan formulation;
    # 'auto' = scan (27 ms at K=500, and Pallas grid steps dispatch as
    # per-step remote calls on tunneled backends, ~32 ms each).  Set
    # 'pallas' explicitly on directly-attached TPU hosts.  Identical keep
    # semantics either way (tests/test_pallas_nms.py).
    nms_backend: str = "auto"
    # True: the inference mask U-Net runs over the fused Pallas
    # conv+InstanceNorm+LeakyReLU kernels (ops/pallas_conv.py).  Opt-in:
    # on tunneled backends every pallas_call dispatches as a remote call
    # (~32 ms), so the fused graph only pays off on directly-attached
    # chips.  Inference only (no VJP); training always uses XLA convs.
    pallas_unet: bool = False
    # approx_max_k for the pre-NMS top-1000 score filter: ~100x faster XLA
    # compile than exact top_k fused with the gather pipeline, negligible
    # recall loss among 43k anchors.  False = exact reference semantics.
    approx_topk: bool = True
    # True: the device upsamples mask probabilities 2x (trilinear) and
    # argmaxes to int8 labels on chip, so only labels cross the wire and the
    # host paste is a nearest gather.  False: exact reference semantics
    # (trilinear probs to box size, then argmax; utils.py:443-460).
    fast_unmold: bool = False
    # True: re-z-score the (dequantized) wire volume ON DEVICE.  z-scoring
    # is affine-invariant, so the host may quantize against cheap sampled
    # raw-volume stats and stream mold slabs to the device while later
    # slabs are still being resized -- the serial mold->upload chain
    # becomes max(mold, upload).  The result equals the reference's
    # molded-volume z-score (model.py:1902-1904) up to int8 rounding.
    device_normalize: bool = False
    # Number of z-slabs the pipelined mold streams per volume (1 = one
    # upload).  Only used on the fast path (int8 wire + device_normalize +
    # native mold available).
    wire_slabs: int = 4

    # ------------------------------------------------------------------------
    def __post_init__(self):
        assert self.stage in STAGES, f"stage must be one of {STAGES}"
        d, h, w = self.image_shape
        for s in (d, h, w):
            if s % 16 != 0:
                raise ValueError("image_shape must be divisible by 16 "
                                 f"(got {self.image_shape})")  # model.py:1263-1265

    # ---- stage-computed fields (reference: config.py:216-224) --------------
    @property
    def mask_shape(self) -> Tuple[int, int, int]:
        if self.mask_shape_override is not None:
            return self.mask_shape_override
        if self.name == "lits":
            # anisotropic masks (LiTS_2017/config.py:210-214)
            return (64, 160, 160) if self.stage == "finetune" else (32, 80, 80)
        return (192, 192, 192) if self.stage == "finetune" else (96, 96, 96)

    @property
    def loss_weight_dict(self) -> Dict[str, float]:
        return dict(self.loss_weights)

    @property
    def num_positive_rois(self) -> int:
        """Fixed positive-ROI capacity (reference samples int(R * ratio),
        model.py:457-458)."""
        return max(1, int(self.train_rois_per_image * self.roi_positive_ratio))

    @property
    def backbone_feature_shapes(self) -> Tuple[Tuple[int, int, int], ...]:
        """(D, H, W) of each FPN level (reference: model.py:91-101)."""
        d, h, w = self.image_shape
        return tuple(
            (-(-d // s), -(-h // s), -(-w // s)) for s in self.backbone_strides
        )

    @property
    def num_anchors(self) -> int:
        n = 0
        for (fd, fh, fw) in self.backbone_feature_shapes:
            per_cell = len(self.anchor_ratios)
            n += ((fd + self.anchor_stride - 1) // self.anchor_stride) * \
                 ((fh + self.anchor_stride - 1) // self.anchor_stride) * \
                 ((fw + self.anchor_stride - 1) // self.anchor_stride) * per_cell
        return n

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def describe(self) -> str:
        """Formatted dump of all fields incl. computed ones (the reference's
        ``Config.display()``, config.py:226-232)."""
        lines = ["Configurations:"]
        for f in dataclasses.fields(self):
            lines.append(f"{f.name:32} {getattr(self, f.name)}")
        for name in ("mask_shape", "num_positive_rois",
                     "backbone_feature_shapes", "num_anchors"):
            lines.append(f"{name:32} {getattr(self, name)}")
        return "\n".join(lines)


def exact_reference_overrides() -> Dict[str, object]:
    """Config overrides bundling every approximation flag off -- bit-level
    A/B comparisons against reference semantics (at tunneled-link latency
    cost): exact top-k, scan NMS, lossless bf16 wire, probability-stack
    unmold."""
    return dict(approx_topk=False, nms_backend="scan",
                wire_image_dtype="bfloat16", fast_unmold=False,
                device_normalize=False)


def heart_config(stage: str = "beginning", **overrides) -> Config:
    """Whole-heart (MM-WHS 2017) experiment config (heart_main.py:26-174)."""
    # U-Net remat only where it is needed: at 'beginning' (96^3 masks) the
    # step peaks at 11.8 GiB either way (XLA's own scheduling already
    # bounds the mask-branch activations) and no-remat is 12% faster
    # (0.83 vs 0.95 s/step); the finetune 192^3 step needs remat to fit
    # (14.3 GiB with it).  Measured via compile().memory_analysis().
    # != "beginning" (not == "finetune"): only 'beginning' was measured
    # safe without remat; any other stage keeps it
    return Config(name="heart", stage=stage,
                  remat_unet=(stage != "beginning")).replace(**overrides)


def heart_inference_config(stage: str = "beginning", **overrides) -> Config:
    """Inference override: a single final detection (heart_main.py:410-417).

    Wire-format defaults are tuned for link-bound hosts; set
    ``wire_image_dtype='bfloat16', fast_unmold=False`` for the exact
    reference unmold semantics.
    """
    return heart_config(stage=stage, detection_max_instances=1,
                        wire_image_dtype="int8", fast_unmold=True,
                        device_normalize=True).replace(**overrides)


def lits_config(stage: str = "beginning", **overrides) -> Config:
    """Liver/tumor (LiTS 2017) experiment config (LiTS_2017/LiTS_main.py:28-176).

    Stage semantics (SURVEY.md s2.2 L5): 'beginning' trains detection only;
    'together'/'finetune' freeze backbone+RPN and train the mask branch.
    """
    stage_rois = 4 if stage in ("together", "finetune") else 50
    stage_ratio = 1.0 if stage in ("together", "finetune") else 0.33
    return Config(
        name="lits",
        stage=stage,
        num_classes=3,  # bg + liver + tumor (LiTS_main.py:40)
        image_shape=(256, 320, 320),
        backbone="P3D35",  # bottleneck depths (4, 5) (LiTS_2017/backbone.py:166-175)
        backbone_channels=(24, 48),
        backbone_stem_kernel=(5, 7, 7),  # LiTS_2017/backbone.py:124
        fpn_channels=160,  # LiTS_2017/LiTS_main.py:105
        rpn_conv_channels=320,
        fc_size=320,
        unet_base_channels=32,
        post_nms_rois_inference=50,
        steps_per_epoch=100,
        validation_steps=20,
        train_rois_per_image=stage_rois,
        roi_positive_ratio=stage_ratio,
        mask_pool_size=(32, 80, 80),  # LiTS_2017/LiTS_main.py:142
        detection_nms_threshold=0.7,  # LiTS_2017/LiTS_main.py:150
        intensity_norm="hu_window",
        pad_shape=(536, 646, 646),  # (D,H,W) of PAD_IMAGE_SHAPE [646,646,536]
        mask_class_weights=(1.0, 1.0, 100.0),  # LiTS_2017/model.py:926-927
        # int8 wires (train or inference) quantize the [0, 1] HU-windowed
        # volume: full int8 range, not the heart default's z-score +-5 sigma
        wire_int8_scale=127.0,
        augment_rotate_degrees=30.0,
        unet_dropout_rate=0.0,  # dropout disabled (LiTS_2017/mask_branch.py:19,130)
        # P3D35 trunk activations at 256x320x320 exceed 16 GB HBM in the
        # backward pass; remat trades ~30% trunk FLOPs for fitting
        remat_trunk=True,
        remat_unet=(stage == "finetune"),
        loss_weights=(  # LiTS_2017/LiTS_main.py:163-170
            ("rpn_class_loss", 50.0),
            ("rpn_bbox_loss", 5.0),
            ("mrcnn_class_loss", 50.0),
            ("mrcnn_bbox_loss", 5.0),
            ("mrcnn_mask_loss", 2.0),
            ("mrcnn_mask_edge_loss", 0.25),
        ),
    ).replace(**overrides)


def lits_inference_config(stage: str = "finetune", **overrides) -> Config:
    """LiTS inference override (LiTS_2017/LiTS_main.py:446-451).

    Wire defaults for link-bound hosts: int8 upload of the [0, 1]
    HU-windowed volume and the device-side overlap-tile unmold
    (``fast_unmold`` with name='lits'), which computes the reference's
    trilinear-paste + hit-count average + argmax (LiTS_2017/utils.py:
    383-408) ON DEVICE in molded coordinates, so int8 labels cross the
    wire instead of the [N, mask, C] float probability stack.  ``--exact``
    restores the host probability-stack path.
    """
    return lits_config(stage, detection_max_instances=10,
                       wire_image_dtype="int8", wire_int8_scale=127.0,
                       fast_unmold=True).replace(**overrides)


def tiny_config(stage: str = "beginning", **overrides) -> Config:
    """A miniature config for tests / dry-runs (not a reference experiment)."""
    return Config(
        name="heart",
        stage=stage,
        num_classes=4,
        image_shape=(32, 64, 64),
        backbone_channels=(4, 8),
        fpn_channels=16,
        rpn_conv_channels=16,
        fc_size=16,
        unet_base_channels=4,
        anchor_scales=(16, 32),
        rpn_train_anchors_per_image=16,
        pre_nms_limit=64,
        post_nms_rois_training=32,
        post_nms_rois_inference=8,
        train_rois_per_image=6,
        pool_size=(4, 4, 4),
        mask_pool_size=(16, 16, 16),
        mask_shape_override=(16, 16, 16) if stage != "finetune" else (32, 32, 32),
        detection_max_instances=4,
        compute_dtype="float32",
    ).replace(**overrides)
