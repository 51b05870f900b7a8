"""Device-mesh construction.

The reference is strictly single-device (``src/train.py:26``; no distributed
code anywhere — SURVEY.md §2.12). Scaling here is the TPU-native way: a
``jax.sharding.Mesh`` with a ``data`` axis (batch / gradient parallelism,
psum over ICI) and an optional ``model`` axis (attention heads + MLP hidden
sharded tensor-parallel). XLA's SPMD partitioner inserts the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh.

    dp defaults to len(devices) // tp. On real slices
    ``mesh_utils.create_device_mesh`` lays devices out so the ``model`` axis
    rides the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    need = dp * tp
    if need > n:
        raise ValueError(f"need {need} devices (dp={dp} x tp={tp}), have {n}")
    try:
        arr = mesh_utils.create_device_mesh((dp, tp), devices=devices[:need])
    except Exception:
        arr = np.asarray(devices[:need]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
