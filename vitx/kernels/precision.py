"""Dtype-pinned matmul precision for in-kernel (Mosaic) dots.

The kernels' numeric contract is fixed by construction — bf16 operands feed
the MXU directly, fp32 operands mean REAL fp32 math, and every dot
accumulates in fp32 via ``preferred_element_type`` — so the ambient
``jax_default_matmul_precision`` config must not leak into the kernel trace:

- ``highest`` (set e.g. by the test conftest for XLA-side parity) on a bf16
  operand makes Mosaic fail to compile ("Bad lhs type");
- ``default`` on an fp32 operand would silently truncate it to bf16 on the
  MXU, breaking the <=1e-4 fp32 parity the kernel tests pin.

``dot_precision(*operands)`` returns the precision matching the operands'
dtypes, independent of the global config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_precision(*operands):
    """HIGHEST when every operand is fp32 (real fp32 math), DEFAULT
    otherwise (bf16 operands go straight to the MXU). Accepts arrays,
    Pallas refs, or dtypes."""
    dts = [jnp.dtype(getattr(o, "dtype", o)) for o in operands]
    if all(dt == jnp.float32 for dt in dts):
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT
