"""Pallas vs scan NMS on the real chip: K=500 proposal sweep (VERDICT r2
#8 -- the Pallas kernel had no recorded real-hardware number).

Two measurements per backend:
* wall per single jit'd call (includes the backend's dispatch -- through
  the tunnel each pallas_call is a remote call, CLAUDE.md);
* amortized kernel time from a jit'd chain of REPS dependent NMS calls
  (dispatch paid once, kernel paid REPS times).

Axon env, one TPU process:  python benchmarks/nms_timing.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(k=500, keep=64, reps=10):
    import jax
    import jax.numpy as jnp

    from cfun_tpu.ops.nms import masked_nms
    from cfun_tpu.ops.pallas_nms import pallas_sorted_nms

    def scan_nms(b, s, v, thr, cap):
        return masked_nms(b, s, v, thr, cap)

    def pallas_nms(b, s, v, thr, cap):
        # the kernel wants score-descending input (as propose() feeds it)
        order = jnp.argsort(-s)
        idx_sorted, keep = pallas_sorted_nms(b[order], v[order], thr, cap)
        return order[idx_sorted], keep

    rng = np.random.default_rng(0)
    centers = rng.uniform(40, 280, size=(k, 3))
    sizes = rng.uniform(20, 90, size=(k, 3))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.uniform(size=(k,)).astype(np.float32)
    valid = np.ones((k,), bool)
    boxes_d = jnp.asarray(boxes)
    scores_d = jnp.asarray(scores)
    valid_d = jnp.asarray(valid)

    results = {}
    for name, fn in (("scan", scan_nms), ("pallas", pallas_nms)):
        one = jax.jit(lambda b, s, v, fn=fn: fn(b, s, v, 0.7, keep)[0])

        def chain(b, s, v, fn=fn):
            def body(carry, _):
                bb, ss = carry
                kept_idx = fn(bb, ss, v, 0.7, keep)[0]
                # data dependence so the chain cannot be CSE'd/elided
                ss = ss + 1e-6 * kept_idx.sum().astype(ss.dtype)
                return (bb, ss), kept_idx[0]
            (_, _), outs = jax.lax.scan(body, (b, s), None, length=reps)
            return outs

        chain_j = jax.jit(chain)

        np.asarray(one(boxes_d, scores_d, valid_d))  # compile
        np.asarray(chain_j(boxes_d, scores_d, valid_d))
        t1 = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(one(boxes_d, scores_d, valid_d))
            t1.append(time.perf_counter() - t0)
        tn = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(chain_j(boxes_d, scores_d, valid_d))
            tn.append(time.perf_counter() - t0)
        single = float(np.median(t1))
        chained = float(np.median(tn))
        kernel = max(chained - single, 0.0) / max(reps - 1, 1)
        results[name] = {
            "single_call_ms": round(single * 1e3, 2),
            f"chain_{reps}_ms": round(chained * 1e3, 2),
            "amortized_kernel_ms": round(kernel * 1e3, 2),
        }
        print(name, results[name])

    # keep-set equality sanity on the same inputs
    ia, ka = jax.jit(lambda b, s, v: scan_nms(b, s, v, 0.7, keep))(
        boxes_d, scores_d, valid_d)
    ib, kb = jax.jit(lambda b, s, v: pallas_nms(b, s, v, 0.7, keep))(
        boxes_d, scores_d, valid_d)
    sa = set(np.asarray(ia)[np.asarray(ka)].tolist())
    sb = set(np.asarray(ib)[np.asarray(kb)].tolist())
    results["keep_sets_equal"] = sa == sb
    print("keep sets equal:", results["keep_sets_equal"])

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "nms_timing.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
