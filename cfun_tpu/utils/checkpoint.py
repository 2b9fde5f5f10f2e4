"""Checkpoint / resume for parameter + optimizer pytrees.

Improves on the reference, which saves only ``state_dict`` every 5 epochs
with the loss baked into the filename and never restores the optimizer or
epoch counter (model.py:1563-1570, SURVEY.md s5).  Here: a single
``.npz`` with '/'-joined tree paths plus a JSON metadata record (epoch,
step, config name/stage), and optional optimizer-state leaves restored
against a freshly-built template -- fully deterministic, no pickling.

Partial (key-filtered) loading supports LiTS-style stage transfer
(LiTS_2017/model.py:1358-1371).
"""

from __future__ import annotations

import json
import os
import zipfile
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save(path: str, params, epoch: int = 0, step: int = 0,
         opt_state: Any = None, meta: Optional[Dict] = None,
         store_dtype: Any = None, compress: bool = False) -> None:
    """``store_dtype`` (e.g. np.float16) downcasts float leaves on disk;
    ``load`` casts back to the template dtype.  ``compress`` zips the npz.
    Both default off (training checkpoints are exact); the committed bench
    weights use f16+compress (165 -> 75 MB for the heart tree)."""
    arrays = {f"params/{k}": v for k, v in _flatten(params).items()}
    if store_dtype is not None:
        sd = np.dtype(store_dtype)
        arrays = {k: (v.astype(sd)
                      if np.issubdtype(v.dtype, np.floating) else v)
                  for k, v in arrays.items()}
    if opt_state is not None:
        opt_leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(opt_leaves):
            arrays[f"opt/{i}"] = np.asarray(leaf)
    info = {"epoch": int(epoch), "step": int(step)}
    info.update(meta or {})
    arrays["__meta__"] = np.frombuffer(
        json.dumps(info).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    writer = np.savez_compressed if compress else np.savez
    writer(path if path.endswith(".npz") else path + ".npz", **arrays)


def _is_native_npz(path: str) -> bool:
    """npz archives contain .npy members; torch zip checkpoints contain
    data.pkl + raw storages, and torch legacy checkpoints are bare
    pickles (not zips at all)."""
    try:
        with zipfile.ZipFile(path) as z:
            return any(n.endswith(".npy") for n in z.namelist())
    except (zipfile.BadZipFile, IsADirectoryError, FileNotFoundError,
            OSError):
        return False


def load_reference_torch(path: str, cfg) -> Any:
    """Import a reference PyTorch checkpoint (``torch.save(state_dict)``,
    reference model.py:1563-1570) as a cfun_tpu params tree, so trained
    reference weights run on TPU directly."""
    import torch

    from cfun_tpu.utils import torch_convert as tc

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    sd = {k: v.detach().cpu().numpy() for k, v in obj.items()}
    return tc.maskrcnn_from_torch(sd, cfg)


def load_any(path: str, cfg, params_template, opt_template: Any = None,
             strict: bool = False) -> Tuple[Any, Any, Dict]:
    """Load a native .npz checkpoint or a reference PyTorch checkpoint,
    auto-detected by content.  Reference checkpoints carry no optimizer
    state or epoch metadata (the reference never saves them, SURVEY s5)."""
    real = path
    if not os.path.exists(real) and os.path.exists(path + ".npz"):
        real = path + ".npz"
    if _is_native_npz(real):
        return load(real, params_template, opt_template, strict=strict)
    params = load_reference_torch(real, cfg)
    return params, opt_template, {"source": "torch", "path": real}


_WRITER: Optional[ThreadPoolExecutor] = None
_PENDING = []


def save_async(path: str, params, epoch: int = 0, step: int = 0,
               opt_state: Any = None, meta: Optional[Dict] = None) -> None:
    """Like :func:`save`, but only the device->host fetch happens on the
    caller's thread; the npz serialization + disk write run on a single
    background writer thread (writes to one path stay ordered).  Call
    :func:`flush` before reading the files back or exiting."""
    global _WRITER
    # materialize now: the caller may donate these buffers to the next step
    params_np = jax.tree.map(np.asarray, params)
    opt_np = None if opt_state is None else jax.tree.map(
        np.asarray, opt_state)
    if _WRITER is None:
        _WRITER = ThreadPoolExecutor(max_workers=1)
    _PENDING.append(_WRITER.submit(save, path, params_np, epoch, step,
                                   opt_np, meta))


def flush(raise_errors: bool = True) -> None:
    """Block until ALL async checkpoint writes have completed.  Every
    pending future is drained even if one failed; the first writer
    exception is re-raised afterwards (or only reported when
    ``raise_errors=False`` -- e.g. from a ``finally`` block, where raising
    would mask the original training exception)."""
    first = None
    while _PENDING:
        try:
            _PENDING.pop(0).result()
        except Exception as e:  # noqa: BLE001 -- surface after draining
            if first is None:
                first = e
    if first is not None:
        if raise_errors:
            raise first
        print(f"checkpoint: background write failed: {first!r}")


def load(path: str, params_template, opt_template: Any = None,
         strict: bool = True) -> Tuple[Any, Any, Dict]:
    """Restore (params, opt_state, meta) shaped like the given templates.

    strict=False key-filters like the LiTS loader: tree leaves missing from
    the checkpoint keep their template values.
    """
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode()) \
            if "__meta__" in data else {}
        stored = {k[len("params/"):]: data[k] for k in data.files
                  if k.startswith("params/")}

        leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(
            params_template)
        new_leaves = []
        for p, leaf in leaves_with_path:
            key = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                           for q in p)
            if key in stored:
                # adopt the template leaf dtype (checkpoints may store
                # float leaves downcast, see save(store_dtype=...)).
                # Read dtype/shape from the leaf WITHOUT np.asarray --
                # templates are often live device arrays (resume path),
                # and asarray would fetch every leaf to host
                arr = np.asarray(stored[key],
                                 dtype=getattr(leaf, "dtype", None)
                                 or np.asarray(leaf).dtype)
                if arr.shape != np.shape(leaf):
                    if strict:
                        raise ValueError(
                            f"shape mismatch for {key}: {arr.shape} vs "
                            f"{np.shape(leaf)}")
                    arr = leaf  # keep the template value (possibly device)
                new_leaves.append(arr)
            else:
                if strict:
                    raise KeyError(f"missing checkpoint key: {key}")
                new_leaves.append(leaf)
        params = jax.tree_util.tree_unflatten(treedef, new_leaves)

        opt_state = opt_template
        opt_keys = sorted((k for k in data.files if k.startswith("opt/")),
                          key=lambda k: int(k.split("/")[1]))
        if opt_template is not None and opt_keys:
            leaves, opt_def = jax.tree_util.tree_flatten(opt_template)
            if len(leaves) == len(opt_keys):
                opt_state = jax.tree_util.tree_unflatten(
                    opt_def, [data[k] for k in opt_keys])
    return params, opt_state, meta
