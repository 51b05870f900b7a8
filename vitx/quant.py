"""Weight-only int8 quantization — model artifacts at 1/4 fp32 size.

Symmetric per-output-channel int8 for every matmul weight (encoder block
``wqkv/wo/w1/w2``, patch-embed / conv-stem kernels, classifier heads);
embeddings, LayerNorm parameters, and biases stay in their float dtype, so
the quality cost is the well-studied weight-only-int8 regime (<0.5% top-1
on ImageNet ViTs). The artifact is a flat npz of ``q::<path>`` int8 tensors
plus ``s::<path>`` fp32 scales; ``load_quantized`` dequantizes back into a
normal parameter pytree, so EVERY downstream surface (forward, kernels,
meshes, serving) works unchanged.

Beyond-reference capability (the reference ships fp32 ``.pt`` files only,
``src/train.py:101``); the scale granularity is TPU-informed — one scale
per output channel, kept per-layer for the stacked (depth, ...) block
leaves, so dequantization is a single broadcast multiply that XLA fuses
into the weight load.

Storage format ONLY, by measurement: a resident-int8 runtime (dequant-in-
kernel weight-only matmuls) was built and chip-measured SLOWER than the
float path at every reachable shape — ViT-B b1/4/8 (round 3) and
ViT-L/16@384 b1/2/4 (round 4, 6.63 vs 4.03 ms at b1) — because the fused
float MHA/MLP kernels absorb the LN/bias/act seams an int8 path pays
separately, and no vitx config is HBM-capacity-bound. It was deleted in
round 4 (see docs/architecture.md and bench_7); do not rebuild it without
new evidence.
"""

from __future__ import annotations

import jax
import numpy as np

SUFFIX = ".quant.npz"

# Quantize ONLY matmul weights, by leaf name — an allowlist, because the
# encoder-block leaves are STACKED (depth, ...), so an ndim>=2 heuristic
# would sweep in the (L, E) LayerNorm scales/biases and every stacked bias,
# exactly the parameters that must stay float. Covers: block wqkv/wo/w1/w2,
# patch-embed / conv-stem kernels, head w/w1/w2 (both head types, distill
# head included). Token/positional embeddings and all biases/norms pass
# through untouched.
_WEIGHT_NAMES = frozenset({"wqkv", "wo", "w1", "w2", "w3", "w", "kernel"})


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def _should_quantize(path_s: str, leaf) -> bool:
    if leaf.ndim < 2 or not np.issubdtype(
            np.asarray(leaf).dtype, np.floating):
        return False
    return path_s.rsplit("/", 1)[-1] in _WEIGHT_NAMES


def _scale_axes(path_s: str, ndim: int) -> tuple:
    """Reduce over the INPUT (contraction) axes only, so every true output
    channel keeps its own scale. Block leaves are stacked (depth, in, out...)
    — reduce axis 1, keeping per-layer, per-output-channel scales (for wqkv
    (L, E, 3, H, D) that means separate scales per layer, per q/k/v, per
    head, per channel — q/k/v magnitude distributions differ systematically
    in trained ViTs and must not share an amax). Unstacked weights reduce
    everything but the last axis (conv kernels (kh, kw, cin, cout) -> per
    cout; (in, out) matrices -> per out)."""
    if path_s.startswith("blocks/"):
        return (1,)
    return tuple(range(ndim - 1))


def quantize_leaf(w, path_s: str):
    """(int8 q, fp32 scale) with w ≈ q * scale (symmetric, zero-point 0)."""
    w32 = np.asarray(w, dtype=np.float32)
    axes = _scale_axes(path_s, w32.ndim)
    amax = np.max(np.abs(w32), axis=axes, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w32 / scale), -127, 127).astype(np.int8)
    return q, scale


def save_quantized(path, params, meta: dict | None = None):
    """Write an int8 artifact. ``meta`` (e.g. the config json) is stored
    under ``__meta__``. Returns the artifact path."""
    import json
    import pathlib

    path = pathlib.Path(path)
    flat = {}
    dtypes = {}
    for p, leaf in jax.tree_util.tree_leaves_with_path(params):
        ps = _path_str(p)
        arr = np.asarray(leaf)
        dtypes[ps] = str(arr.dtype)
        if _should_quantize(ps, arr):
            q, s = quantize_leaf(arr, ps)
            flat[f"q::{ps}"] = q
            flat[f"s::{ps}"] = s
        else:
            flat[f"f::{ps}"] = arr
    flat["__meta__"] = np.frombuffer(json.dumps(
        {"dtypes": dtypes, "user": meta or {}}).encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **flat)
    return path


def load_quantized(path, template):
    """Dequantize an artifact back into the structure of ``template`` (an
    ``init_params`` pytree for the same config); leaf dtypes restored to
    the saved originals. Returns (params, user_meta)."""
    import json

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    dtypes = meta["dtypes"]

    def rebuild(p, leaf):
        ps = _path_str(p)
        if f"q::{ps}" in arrays:
            w = (arrays[f"q::{ps}"].astype(np.float32)
                 * arrays[f"s::{ps}"])
        elif f"f::{ps}" in arrays:
            w = arrays[f"f::{ps}"]
        else:
            raise KeyError(f"artifact is missing parameter {ps!r}")
        if w.shape != leaf.shape:
            raise ValueError(f"{ps}: artifact shape {w.shape} != model "
                             f"shape {leaf.shape}")
        return jax.numpy.asarray(w.astype(dtypes[ps]))

    params = jax.tree_util.tree_map_with_path(rebuild, template)
    return params, meta["user"]


def peek_meta(path) -> dict:
    """Read just the user meta (e.g. the stored config json) of an
    artifact, without dequantizing anything."""
    import json

    with np.load(path) as z:
        return json.loads(bytes(z["__meta__"]).decode())["user"]


def quantization_error(params):
    """Per-leaf max |w - dequant(quant(w))| / amax — a quick fidelity
    report (expect <= 1/254 ≈ 0.4% for symmetric int8)."""
    out = {}
    for p, leaf in jax.tree_util.tree_leaves_with_path(params):
        ps = _path_str(p)
        arr = np.asarray(leaf)
        if not _should_quantize(ps, arr):
            continue
        q, s = quantize_leaf(arr, ps)
        err = np.max(np.abs(arr.astype(np.float32) - q.astype(np.float32) * s))
        amax = float(np.max(np.abs(arr)))
        out[ps] = float(err / amax) if amax else 0.0
    return out
