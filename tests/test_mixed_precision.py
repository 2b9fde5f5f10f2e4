"""bf16 compute-path regression tests (forward AND backward) on CPU.

The production configs run convolutions in bfloat16; the tiny test config
is float32, so without these the mixed-precision VJP path would only ever
be exercised on the TPU."""

import numpy as np
import jax
import jax.numpy as jnp

from cfun_tpu.config import tiny_config
from cfun_tpu.models import cfun
from cfun_tpu.ops.anchors import config_anchors
from cfun_tpu.train.step import make_train_step
from tests.test_train_step import _make_batch


def test_bf16_train_step_runs_and_is_finite():
    cfg = tiny_config().replace(compute_dtype="bfloat16")
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    anchors = config_anchors(cfg)
    init_state, step = make_train_step(cfg, anchors)
    state = init_state(params)
    batch = _make_batch(cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # params stay float32 (master weights)
    assert state.params["backbone"]["stem_conv"]["w"].dtype == jnp.float32


def test_bf16_infer_forward():
    cfg = tiny_config().replace(compute_dtype="bfloat16",
                                detection_max_instances=1)
    params = cfun.init_params(jax.random.PRNGKey(0), cfg)
    anchors = jnp.asarray(config_anchors(cfg))
    d, h, w = cfg.image_shape
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, d, h, w, 1)).astype(np.float32))
    window = jnp.asarray([0, 0, 0, d, h, w], jnp.float32)
    out = jax.jit(cfun.infer_forward, static_argnames=("cfg",))(
        params, img, anchors, window, cfg)
    assert np.isfinite(np.asarray(out.detections)).all()
