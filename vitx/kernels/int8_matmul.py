"""Weight-only int8 matmul kernel: ``y = x @ (q * scale)`` without ever
materializing the dequantized weight in HBM.

The serving counterpart of ``vitx/quant.py``'s storage format. At small
batch (the latency-sensitive serving regime) ViT inference is WEIGHT-bound:
a ViT-B forward at B=1 moves ~172 MB of bf16 weights but only ~KBs of
activations, so weight bytes set the floor (~0.21 ms at 800 GB/s HBM).
Streaming the int8 tensor (half the bytes) and dequantizing in VMEM halves
that floor. The per-output-channel scale means dequantization can be folded
into the OUTPUT tile — ``(x @ q) * scale[None, :]`` — one multiply per
output element instead of one per weight element.

Kernel shape contract (TPU lane alignment): K and N must be multiples of
128 — true for every production ViT width (E, 4E, 3·H·D at base/large
sizes). ``quant_matmul`` (the public entry) transparently falls back to the
XLA dequant path for other shapes, pads M to the sublane multiple, and
flattens leading batch dims. Inference-only: no custom VJP (training always
runs float weights).

Chip benching pending (built during the round-3 axon-tunnel outage;
interpret-mode verified). ROADMAP: wire into serving once measured.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as _P

from vitx.kernels.flash_attention import _use_interpret
from vitx.kernels.precision import dot_precision


def _kernel(x_ref, q_ref, s_ref, o_ref):
    x = x_ref[...]                                    # (mb, K) float
    q = q_ref[...].astype(x.dtype)                    # (K, nb) int8 -> float
    acc = jnp.dot(x, q, preferred_element_type=jnp.float32,
                  precision=dot_precision(x))
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def int8_matmul_reference(x, q, scale):
    """XLA fallback: dequantize then matmul (fp32 accumulation)."""
    w = q.astype(jnp.float32) * scale.reshape(1, -1)
    y = jnp.dot(x.astype(jnp.float32), w,
                preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def quant_matmul(x, q, scale, *, block_n: int = 256):
    """``x @ (q * scale)`` with q int8, scale per output channel.

    x: (..., K) float32/bfloat16; q: (K, N) int8; scale: (N,) or
    broadcastable. Returns (..., N) in x.dtype. Dispatches to the Pallas
    kernel when K and N are 128-aligned, the XLA dequant path otherwise.
    """
    *lead, K = x.shape
    Kq, N = q.shape
    if Kq != K:
        raise ValueError(f"contraction mismatch: x K={K} vs q K={Kq}")
    scale = scale.reshape(-1)
    if scale.shape[0] != N:
        raise ValueError(f"scale has {scale.shape[0]} channels, q has {N}")
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    if K % 128 or N % 128:
        out = int8_matmul_reference(x2, q, scale)
        return out.reshape(*lead, N)

    key = (block_n,)
    if key not in _SHARDED_CACHE:
        _SHARDED_CACHE[key] = _make_sharded(block_n)
    out = _SHARDED_CACHE[key](x2, q,
                              scale.astype(jnp.float32).reshape(1, N))
    return out.reshape(*lead, N)


def _pallas_mm(x2, q, s2, *, block_n: int):
    """The kernel proper: pad M, tile (M, N), one pallas_call. x2 (M, K)
    float, q (K, N) int8, s2 (1, N) fp32 — K, N 128-aligned."""
    M, K = x2.shape
    N = q.shape[1]
    nb = min(block_n, N)
    while N % nb:
        nb //= 2
    # pad M to the fp32 sublane multiple; small serving batches stay one
    # row block, big batches split so x blocks keep a few MB of VMEM
    mb = min(max(8, M), 512)
    m_pad = (-M) % mb
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    Mp = x2.shape[0]

    out = pl.pallas_call(
        _kernel,
        grid=(Mp // mb, N // nb),
        in_specs=[
            pl.BlockSpec((mb, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((Mp, N), x2.dtype),
        out_specs=pl.BlockSpec((mb, nb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            # the point of the kernel: q travels as 1 byte/element
            bytes_accessed=Mp * K * x2.dtype.itemsize + K * N + 4 * N
            + Mp * N * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2, q, s2)
    return out[:M] if m_pad else out


_SHARDED_CACHE: dict = {}


def _make_sharded(block_n: int):
    """Row-parallel custom_partitioning: x2's M axis shards over the mesh
    (each row's output is independent), q/scale replicate — the same
    batch-parallel rule every other kernel entry point here carries.
    M padding happens per shard inside ``_pallas_mm``."""
    def _positional(x2, q, s2):
        return _pallas_mm(x2, q, s2, block_n=block_n)

    f = custom_partitioning(_positional)

    def _out(mesh, x_spec):
        parts = list(x_spec) + [None] * (2 - len(x_spec))
        return NamedSharding(mesh, _P(parts[0], None))

    def infer(mesh, arg_infos, result_infos):
        return _out(mesh, arg_infos[0].sharding.spec)

    def part(mesh, arg_infos, result_infos):
        sh = _out(mesh, arg_infos[0].sharding.spec)
        rep = NamedSharding(mesh, _P())
        return (mesh, _positional, sh, (sh, rep, rep))

    f.def_partition(
        part, infer_sharding_from_operands=infer,
        sharding_rule="m k, k n, u n -> m n",
        need_replication_factors=("k", "n", "u"))
    return f
