"""Parameter inspection utilities.

The framework's answer to the reference C stack's 13 shape-aware
``visualize_*`` dump functions (``csrc/vit.c:748-881``): print every tensor in
the pytree with its path, shape, dtype, and value statistics — or full values
for small tensors — without 130 lines of per-tensor boilerplate.
"""

from __future__ import annotations

import numpy as np
import jax


def _walk(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk(tree[k], f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, f"{prefix}{i}/")
    else:
        yield prefix.rstrip("/"), tree


def param_summary(params) -> str:
    """One line per tensor: path, shape, dtype, mean/std/min/max."""
    lines = []
    total = 0
    for path, leaf in _walk(params):
        arr = np.asarray(jax.device_get(leaf), dtype=np.float32)
        total += arr.size
        lines.append(
            f"{path:50s} {str(arr.shape):18s} {str(leaf.dtype):9s} "
            f"mean={arr.mean():+.4f} std={arr.std():.4f} "
            f"min={arr.min():+.4f} max={arr.max():+.4f}")
    lines.append(f"{'TOTAL':50s} {total:,} parameters")
    return "\n".join(lines)


def dump_params(params, *, max_full: int = 64, file=None) -> None:
    """Print the summary; tensors with <= max_full elements print in full
    (the tiny-config behavior of the C visualizers, vit.c:886-939)."""
    print(param_summary(params), file=file)
    for path, leaf in _walk(params):
        arr = np.asarray(jax.device_get(leaf))
        if arr.size <= max_full:
            print(f"\n{path} =\n{np.array2string(arr, precision=4)}",
                  file=file)
