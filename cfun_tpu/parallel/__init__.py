"""Scale-out layer: device mesh, shardings, data+spatial-parallel training.

The reference is strictly single-device (SURVEY.md s2.4: GPU_COUNT exists but
every path is batch-1, one CUDA device, no torch.distributed anywhere), so
this layer is a green-field TPU design: a ``jax.sharding.Mesh`` with axes
('data', 'space'), batch sharding for data parallelism, spatial sharding of
the volume's H axis (the volumetric analogue of sequence parallelism) with
XLA GSPMD inserting halo exchanges for convolutions over ICI, and replicated
parameters updated from psum-mean gradients -- all expressed as sharding
annotations on one jit'd program, never hand-written collectives.
"""

from cfun_tpu.parallel.mesh import (  # noqa: F401
    aug_batch_sharding,
    batch_sharding,
    make_mesh,
    make_parallel_train_step,
    put_replicated,
    stack_batches,
)
