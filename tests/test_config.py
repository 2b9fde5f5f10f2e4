"""Config invariants: stage rules, computed fields, validation."""

import pytest

from cfun_tpu.config import (Config, exact_reference_overrides, heart_config,
                             heart_inference_config, lits_config,
                             lits_inference_config)


def test_heart_values_match_reference():
    cfg = heart_config("beginning")
    assert cfg.image_shape == (192, 320, 320)
    assert cfg.num_classes == 8
    assert cfg.anchor_scales == (64, 128)
    assert cfg.mask_shape == (96, 96, 96)
    assert cfg.num_positive_rois == 4  # int(15 * 0.33)
    assert cfg.backbone_feature_shapes == ((24, 40, 40), (12, 20, 20))
    assert cfg.loss_weight_dict["rpn_class_loss"] == 100.0
    assert heart_config("finetune").mask_shape == (192, 192, 192)


def test_heart_inference_overrides():
    cfg = heart_inference_config("beginning")
    assert cfg.detection_max_instances == 1
    exact = heart_inference_config("beginning", **exact_reference_overrides())
    assert exact.fast_unmold is False and exact.approx_topk is False


def test_lits_stage_rules():
    b = lits_config("beginning")
    assert b.train_rois_per_image == 50 and b.roi_positive_ratio == 0.33
    assert b.mask_shape == (32, 80, 80)
    f = lits_config("finetune")
    assert f.train_rois_per_image == 4 and f.roi_positive_ratio == 1.0
    assert f.mask_shape == (64, 160, 160)
    assert lits_inference_config().detection_max_instances == 10
    assert b.backbone == "P3D35" and b.fpn_channels == 160


def test_describe_contains_computed_fields():
    text = heart_config().describe()
    assert "num_anchors" in text and "43200" in text
    assert "mask_shape" in text


def test_invalid_shape_rejected():
    with pytest.raises(ValueError):
        Config(image_shape=(100, 320, 320))  # not divisible by 16


def test_invalid_stage_rejected():
    with pytest.raises(AssertionError):
        Config(stage="warmup")
