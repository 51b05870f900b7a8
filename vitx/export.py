"""StableHLO deployment artifacts — run the model without vitx (or Python
model code) in the loop.

``export_forward`` serializes the jitted inference forward via ``jax.export``
with the parameters BAKED IN as module constants and a SYMBOLIC batch
dimension, producing one self-contained artifact that any StableHLO consumer
(a jax process, IFRT/PJRT serving stack, or XLA AOT pipeline) can execute at
any batch size with no model code, config, or checkpoint plumbing. This is
the XLA-native analogue of the torch world's TorchScript/ONNX export — a
deployment capability the reference (which can only re-instantiate its
Python modules and load a ``.pt``, ``src/train.py:52-58``) has no answer to.

The exported function is the EXACT production forward: same kernels
(Pallas flash attention lowers into the module as custom calls on TPU —
export on the target platform), same dtype policy, same ToMe routing if
``cfg.tome_r`` is set (ToMe needs a static token count, so tome exports pin
the batch instead of using a symbolic dimension — the unrolled shapes are
already static).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jexport

from vitx.core.config import ViTConfig

SUFFIX = ".stablehlo"


def export_forward(params, cfg: ViTConfig, *, batch_size: int | None = None,
                   with_softmax: bool = False):
    """Export the inference forward with ``params`` baked in.

    batch_size None -> a symbolic batch dimension ("b"): one artifact, any
    batch size (requires no ToMe; merging re-traces per token count, which
    is static only when everything is). An int pins the batch.
    Returns a ``jax.export.Exported`` — call ``.serialize()`` for bytes.
    """
    from vitx.nn.vit import forward

    if batch_size is None and cfg.tome_r:
        raise ValueError("tome_r exports need a pinned batch_size (the "
                         "merge scatter shapes depend on it)")

    def fn(images):
        logits = forward(params, images, cfg, deterministic=True)
        if with_softmax:
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return logits.astype(jnp.float32)

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct(
            (b, cfg.image_size, cfg.image_size, cfg.num_channels),
            cfg.cdtype())
    else:
        spec = jax.ShapeDtypeStruct(
            (batch_size, cfg.image_size, cfg.image_size, cfg.num_channels),
            cfg.cdtype())
    return jexport.export(jax.jit(fn))(spec)


def save_exported(path, params, cfg: ViTConfig, **kw):
    """Serialize ``export_forward`` to ``path``; returns the byte count.

    Also writes a ``<path>.json`` sidecar (config + export options) so the
    artifact is self-describing to vitx surfaces (``serve --checkpoint
    m.stablehlo``, ``resolve_artifact_config``) while the artifact file
    itself stays pure StableHLO for third-party consumers."""
    import json

    blob = export_forward(params, cfg, **kw).serialize()
    with open(path, "wb") as f:
        f.write(blob)
    sidecar = {"config": json.loads(cfg.to_json()),
               "batch_size": kw.get("batch_size"),
               "with_softmax": bool(kw.get("with_softmax", False))}
    with open(f"{path}.json", "w") as f:
        json.dump(sidecar, f)
    return len(blob)


def peek_meta(path):
    """Read an artifact's ``<path>.json`` sidecar (None if absent)."""
    import json
    import os

    side = f"{path}.json"
    if not os.path.exists(side):
        return None
    with open(side) as f:
        return json.load(f)


def load_exported(path):
    """Deserialize an artifact; ``.call(images)`` runs it (jit-compatible:
    wrap in ``jax.jit(exported.call)`` for the compiled dispatch path)."""
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
