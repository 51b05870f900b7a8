"""int8-runtime inference: encoder matmul weights RESIDENT as int8.

``load_quantized`` (vitx/quant.py) dequantizes an artifact back to float at
load — simple, every surface works, but the runtime weights are bf16/fp32
again. This module keeps the encoder's matmul weights as (int8 q, fp32
per-output-channel scale) pairs ON DEVICE and routes every projection
through the Pallas weight-only matmul (``vitx/kernels/int8_matmul.py``), so
resident weight memory AND per-forward weight traffic drop ~2x vs bf16 —
the floor of small-batch serving (`int8_matmul.py` docstring). Embeddings,
LayerNorms, biases and the classifier heads stay float (they are <2% of
the bytes and the head feeds argmax/softmax directly).

Blocks run unrolled (the ToMe-encoder pattern, ``vitx/nn/tome.py``):
per-layer (K, N) weight slices are what the kernel wants, and the scan's
stacked-leaf indexing would rebuild them per step anyway. Inference-only;
training always runs float weights.

Beyond-reference capability; chip perf numbers pending (built during the
round-3 axon-tunnel outage; interpret-verified, see test_int8_infer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vitx.core.config import ViTConfig
from vitx.kernels.int8_matmul import quant_matmul
from vitx.nn.layers import activation, layer_norm

Params = dict


def quantize_for_runtime(params: Params, cfg: ViTConfig) -> Params:
    """Return a runtime tree: block matmul weights replaced by
    ``{"q": int8, "s": fp32}`` dicts (2-D per layer via folding), all other
    leaves passed through unchanged. Shapes: wqkv (L,E,3HD), wo (L,E,E),
    w1 (L,E,M), w2 (L,M,E) with per-(layer, output-channel) scales."""
    from vitx.quant import quantize_leaf

    if cfg.parity == "bug_exact":
        raise ValueError("int8 runtime implements the corrected attention "
                         "semantics; bug_exact parity checkpoints must be "
                         "served on the float path")
    if cfg.tome_r:
        raise ValueError("int8 runtime has no ToMe merging step — use "
                         "tome_r OR int8_runtime, not both (the combination "
                         "would silently drop the merging)")
    if cfg.qk_norm:
        raise ValueError("the int8 runtime block loop does not implement "
                         "QK-Norm — serve qk_norm checkpoints on the float "
                         "path (int8 ARTIFACTS are fine: they dequantize "
                         "into the normal forward)")
    if cfg.moe_experts:
        raise ValueError("the int8 runtime block loop does not implement "
                         "Soft-MoE blocks — serve MoE checkpoints on the "
                         "float path")
    if cfg.lora_rank:
        # the int8 block loop reads dense names only — fold the adapters
        # first so the quantized weights ARE the adapted weights
        from vitx.nn.lora import merge_lora_params

        params, cfg = merge_lora_params(params, cfg)
    L, E = cfg.depth, cfg.embed_dim
    out = dict(params)
    blocks = dict(params["blocks"])
    names = ["wqkv", "wo", "w1", "w2"]
    if cfg.mlp_act == "swiglu":
        names.append("w3")           # the gate up-projection, (L, E, M)
    for name in names:
        w = np.asarray(blocks[name], np.float32).reshape(L, E, -1) \
            if name != "w2" else np.asarray(blocks[name], np.float32)
        q, s = quantize_leaf(w, f"blocks/{name}")
        blocks[name] = {"q": jnp.asarray(q), "s": jnp.asarray(s)}
    out["blocks"] = blocks
    return out


def _qmm(x, leaf, cdt):
    """(B, T, K) @ quantized (K, N) -> (B, T, N) in compute dtype."""
    return quant_matmul(x, leaf["q"], leaf["s"].reshape(-1)).astype(cdt)


def encode_int8(rt: Params, images, cfg: ViTConfig):
    """Unrolled encoder over a ``quantize_for_runtime`` tree. Mirrors the
    production ``encode`` math exactly up to int8 weight rounding (pinned
    by test_int8_infer.py against the float forward)."""
    from vitx.nn.vit import (_append_registers, _join_cls, add_pos_embed,
                             patch_embed, rope_tables)

    cdt = cfg.cdtype()
    H, D = cfg.num_heads, cfg.head_dim
    tokens = patch_embed(rt, images, cfg)
    B = tokens.shape[0]
    x = _join_cls(rt, tokens, cfg, B)
    x = add_pos_embed(rt, x, cfg)
    x = _append_registers(rt, x, cfg, B)
    T = x.shape[1]
    rope = rope_tables(cfg, cdt) if cfg.pos_embed == "rope" else None

    blocks = rt["blocks"]
    for l in range(cfg.depth):
        bp = jax.tree.map(lambda a: a[l], blocks)
        h = layer_norm(x, bp["ln1_scale"], bp["ln1_bias"],
                       eps=cfg.layer_norm_eps)
        qkv = _qmm(h, bp["wqkv"], cdt).reshape(B, T, 3, H, D)
        if bp.get("bqkv") is not None:
            qkv = qkv + bp["bqkv"].astype(cdt)[None, None]
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)        # (B, H, T, D)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        if rope is not None:
            from vitx.nn.vit import apply_rope

            q = apply_rope(q, *rope)
            k = apply_rope(k, *rope)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32) \
            * (1.0 / D ** 0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(cdt)
        o = jnp.einsum("bhts,bhsd->bthd", probs, v,
                       preferred_element_type=jnp.float32).astype(cdt)
        o = _qmm(o.reshape(B, T, H * D), bp["wo"], cdt)
        if bp.get("bo") is not None:
            o = o + bp["bo"].astype(cdt)
        if bp.get("ls1") is not None:
            o = o * bp["ls1"].astype(cdt)       # LayerScale branch gain
        x = x + o

        h = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"],
                       eps=cfg.layer_norm_eps)
        if cfg.mlp_act == "swiglu":
            u = _qmm(h, bp["w1"], jnp.float32) \
                + bp["b1"].astype(jnp.float32)
            gt = _qmm(h, bp["w3"], jnp.float32) \
                + bp["b3"].astype(jnp.float32)
            h = jax.nn.silu(u) * gt
        else:
            h = activation(_qmm(h, bp["w1"], jnp.float32)
                           + bp["b1"].astype(jnp.float32), cfg.mlp_act)
        m = (_qmm(h.astype(cdt), bp["w2"], jnp.float32)
             + bp["b2"].astype(jnp.float32)).astype(cdt)
        if bp.get("ls2") is not None:
            m = m * bp["ls2"].astype(cdt)
        x = x + m

    if cfg.final_norm:
        fn = rt["final_norm"]
        x = layer_norm(x, fn["scale"], fn["bias"], eps=cfg.layer_norm_eps)
    return x


def forward_int8(rt: Params, images, cfg: ViTConfig):
    """images (B, H, W, C) -> logits (B, classes) with int8 encoder
    weights. Head semantics match ``vitx.nn.vit.forward`` (distill heads
    averaged)."""
    from vitx.nn.vit import classify, classify_dist

    x = encode_int8(rt, images, cfg)
    logits = classify(rt, x, cfg)
    if cfg.distill_token:
        logits = 0.5 * (logits + classify_dist(rt, x, cfg))
    return logits
