"""Epoch-level training loop: feeder -> jit'd step -> cadenced validation
and checkpointing.

Schedule semantics from the reference (model.py:1516-1573): epoch-constant
random rotation angle, STEPS_PER_EPOCH train steps, validation + checkpoint
every 5 epochs; resumed runs continue their epoch numbering (the reference
loses it, SURVEY.md s5 -- fixed here via checkpoint metadata).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cfun_tpu.config import Config
from cfun_tpu.data.feeder import TrainFeeder
from cfun_tpu.models import cfun
from cfun_tpu.ops.anchors import config_anchors
from cfun_tpu.train.step import TrainBatch, make_train_step, train_forward
from cfun_tpu.utils import checkpoint
from cfun_tpu.utils.logging import MetricsLogger, progress

LOSS_KEYS = ("rpn_class_loss", "rpn_bbox_loss", "mrcnn_class_loss",
             "mrcnn_bbox_loss", "mrcnn_mask_loss", "mrcnn_mask_edge_loss")


def _to_device(batch: TrainBatch) -> TrainBatch:
    return TrainBatch(*(jnp.asarray(x) for x in batch))


def train_model(cfg: Config, train_dataset, val_dataset,
                log_dir: str = "./logs",
                weights: Optional[str] = None,
                epochs: Optional[int] = None,
                seed: int = 0,
                num_workers: int = 8) -> str:
    """Train to ``epochs`` (defaults to cfg.epochs); returns the final
    checkpoint path."""
    epochs = epochs or cfg.epochs
    anchors = config_anchors(cfg)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    params = cfun.init_params(jax.random.PRNGKey(seed), cfg)
    init_state, step_fn = make_train_step(cfg, anchors)
    state = init_state(params)
    start_epoch = 0
    if weights and weights.lower() != "none" and (
            os.path.exists(weights) or os.path.exists(weights + ".npz")):
        # native .npz (resumes optimizer + epoch) or a reference PyTorch
        # checkpoint (params only), auto-detected
        params, opt_state, meta = checkpoint.load_any(
            weights, cfg, state.params, state.opt_state)
        state = state._replace(params=params, opt_state=opt_state)
        start_epoch = int(meta.get("epoch", 0))
        print(f"Resumed from {weights} at epoch {start_epoch} "
              f"({meta.get('source', 'npz')})")

    run_dir = os.path.join(log_dir, cfg.name,
                           time.strftime("%Y-%m-%d_%H-%M-%S"))
    os.makedirs(run_dir, exist_ok=True)
    logger = MetricsLogger(run_dir)

    val_forward = jax.jit(
        lambda p, b, a, k: train_forward(p, b, a, cfg, k))

    # per-host data sharding: on a multi-process pod every host feeds its
    # own disjoint slice of the global shuffle (same seed on all hosts)
    feeder = TrainFeeder(train_dataset, cfg, anchors, seed=seed,
                         num_workers=num_workers,
                         shard_index=jax.process_index(),
                         num_shards=jax.process_count())
    val_feeder = TrainFeeder(val_dataset, cfg, anchors, seed=seed + 1,
                             num_workers=max(2, num_workers // 2),
                             shard_index=jax.process_index(),
                             num_shards=jax.process_count())
    anchors_dev = jnp.asarray(anchors)
    ckpt_path = os.path.join(run_dir, "model")

    try:
        for epoch in range(start_epoch + 1, epochs + 1):
            t0 = time.time()
            angle = float(rng.integers(-int(cfg.augment_rotate_degrees),
                                       int(cfg.augment_rotate_degrees) + 1))
            # metric sums stay on device so steps pipeline with the feeder;
            # only the periodic progress print forces a sync
            dev_sums = None
            for i, batch in enumerate(
                    feeder.epoch(angle, cfg.steps_per_epoch)):
                key, sub = jax.random.split(key)
                state, metrics = step_fn(state, _to_device(batch), sub)
                dev_sums = metrics if dev_sums is None else jax.tree.map(
                    jnp.add, dev_sums, metrics)
                if (i + 1) % 5 == 0 or i + 1 == cfg.steps_per_epoch:
                    progress(i + 1, cfg.steps_per_epoch,
                             {"loss": float(metrics["total_loss"])},
                             prefix=f"epoch {epoch} ")
            fetched = {k: float(v) / cfg.steps_per_epoch
                       for k, v in dev_sums.items()}
            total_sum = fetched.pop("total_loss")
            logger.log({"epoch": epoch, "angle": angle, "loss": total_sum,
                        **fetched, "epoch_s": round(time.time() - t0, 2)})
            print(f"Epoch {epoch}/{epochs} loss {total_sum:.5f} "
                  f"({time.time() - t0:.1f}s)")

            if epoch % cfg.val_every_epochs == 0:
                val_loss = 0.0
                steps = min(cfg.validation_steps, val_dataset.num_images)
                for batch in val_feeder.epoch(angle, steps):
                    key, sub = jax.random.split(key)
                    total, _ = val_forward(state.params, _to_device(batch),
                                           anchors_dev, sub)
                    val_loss += float(total) / steps
                logger.log({"epoch": epoch, "val_loss": val_loss})
                print(f"  val loss {val_loss:.5f}")
                # async: only the D2H fetch blocks here; the npz write
                # overlaps the next epoch
                checkpoint.save_async(ckpt_path, state.params, epoch=epoch,
                                      step=int(state.step),
                                      opt_state=state.opt_state,
                                      meta={"name": cfg.name,
                                            "stage": cfg.stage,
                                            "loss": total_sum,
                                            "val_loss": val_loss})
    finally:
        feeder.close()
        val_feeder.close()
        logger.close()
        # never mask the loop's own exception with a writer failure
        checkpoint.flush(raise_errors=False)

    checkpoint.save(ckpt_path, state.params, epoch=epochs,
                    step=int(state.step), opt_state=state.opt_state,
                    meta={"name": cfg.name, "stage": cfg.stage})
    return ckpt_path + ".npz"
