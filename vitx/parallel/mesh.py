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
EXPERT_AXIS = "expert"


def make_mesh(dp: int | None = None, tp: int = 1, ep: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh — (data, model, expert) when ``ep > 1``.

    dp defaults to len(devices) // (tp * ep). On real slices
    ``mesh_utils.create_device_mesh`` lays devices out so the ``model`` axis
    rides the fastest ICI links. The ``expert`` axis (MoE expert
    parallelism, vitx/nn/moe.py) is only materialized when requested — a
    2-axis mesh stays bit-compatible with every existing sharding.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % (tp * ep):
            raise ValueError(f"{n} devices not divisible by "
                             f"tp={tp} x ep={ep}")
        dp = n // (tp * ep)
    need = dp * tp * ep
    if need > n:
        raise ValueError(f"need {need} devices (dp={dp} x tp={tp} x "
                         f"ep={ep}), have {n}")
    shape = (dp, tp, ep) if ep > 1 else (dp, tp)
    axes = ((DATA_AXIS, MODEL_AXIS, EXPERT_AXIS) if ep > 1
            else (DATA_AXIS, MODEL_AXIS))
    try:
        arr = mesh_utils.create_device_mesh(shape, devices=devices[:need])
    except Exception:
        arr = np.asarray(devices[:need]).reshape(shape)
    return Mesh(arr, axes)
