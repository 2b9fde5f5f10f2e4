"""GSPMD-propagated vs explicit-halo sharded U-Net: step time on the
8-virtual-CPU-device mesh.

Answers ROADMAP's 'measure GSPMD halo overhead vs the explicit shard_map
halo U-Net' on the only mesh available in this environment (8 virtual CPU
devices on one core -- wall times are serialized compute + partition
overhead, not ICI behaviour; the comparison isolates what the two
partitioners DO, not chip speed).  Both paths run forward+grad of the mask
U-Net on D-sharded crops at a finetune-stage shape.

Usage: python benchmarks/sharded_unet_cpu.py [D H W base]
"""

import os
import sys
import time

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from cfun_tpu.models.unet3d import apply_unet, init_unet  # noqa: E402
from cfun_tpu.parallel import make_mesh  # noqa: E402
from cfun_tpu.parallel.halo import shard_map_unet  # noqa: E402


def main(d=32, h=32, w=32, base=2, stage="finetune", space=2):
    # default shape slimmed for the 1-core host: the grad of the 8-way
    # shard_map U-Net at (32,64,64,base=4) compiled >30 min there; the
    # partitioner comparison is shape-independent enough at (32,32,32)
    mesh = make_mesh(8, space=space)
    params = init_unet(jax.random.PRNGKey(0), 1, 4, base)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, d, h, w, 1),
                          jnp.float32)
    print(f"mesh {dict(mesh.shape)} shape=({d},{h},{w}) base={base}",
          flush=True)
    xspec = NamedSharding(mesh, P(None, "space"))
    x = jax.device_put(x, xspec)
    params = jax.device_put(params, NamedSharding(mesh, P()))

    def loss_gspmd(p, c):
        # crops constrained D-over-'space'; GSPMD materializes the conv
        # halo exchanges from sharding propagation
        c = jax.lax.with_sharding_constraint(c, xspec)
        return jnp.sum(jnp.square(apply_unet(p, c, stage=stage)))

    def loss_halo(p, c):
        return jnp.sum(jnp.square(shard_map_unet(mesh, p, c, stage=stage)))

    results = {}
    for name, fn in (("gspmd", loss_gspmd), ("halo_shard_map", loss_halo)):
        print(f"compiling {name} ...", flush=True)
        g = jax.jit(jax.grad(fn))
        t0 = time.perf_counter()
        out = g(params, x)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(g(params, x))
            times.append(time.perf_counter() - t0)
        results[name] = (float(np.median(times)), compile_s)
        print(f"{name:15} step {results[name][0]*1e3:8.1f} ms "
              f"(compile {compile_s:.1f} s)")
    ratio = results["gspmd"][0] / results["halo_shard_map"][0]
    print(f"gspmd/halo step-time ratio: {ratio:.2f} "
          f"(shape=({d},{h},{w}) base={base} stage={stage} space={space})")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:5]]
    main(*args) if args else main()
