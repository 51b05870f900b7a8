"""Pretrained ViT checkpoint import: timm / HuggingFace layouts -> vitx.

The reference project trains from scratch only; loading community
pretrained weights is the standard ViT fine-tune workflow this adds
(zero-egress environments supply the state dict from local disk).

Supported source layouts (auto-detected):
- **timm** ``vision_transformer``: ``cls_token``, ``pos_embed``,
  ``patch_embed.proj.*``, ``blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,
  mlp.fc1,mlp.fc2}.*``, ``norm.*``, ``head.*``.
- **HuggingFace** ``ViTModel`` / ``ViTForImageClassification``:
  ``[vit.]embeddings.*``, ``[vit.]encoder.layer.{i}.*``, ``[vit.]layernorm.*``,
  ``classifier.*``.

Both map onto the vitx "standard ViT" configuration:
``head_type="standard"`` (whose head LN receives the source's FINAL
encoder LayerNorm — vitx's classifier reads the CLS token only, so the
final LN folds into the head), ``qkv_bias=True``, ``mlp_act="gelu"``
(use ``vit_config_for_pretrained``). Parity vs
``transformers.ViTForImageClassification`` is pinned to <=2e-4 logits
rel-err in tests/test_pretrained.py.
"""

from __future__ import annotations

import numpy as np

from vitx.core.config import ViTConfig


def vit_config_for_pretrained(*, image_size: int, patch_size: int,
                              num_classes: int, embed_dim: int, depth: int,
                              num_heads: int, layer_norm_eps: float = 1e-12,
                              **overrides) -> ViTConfig:
    """The vitx config matching timm/HF standard ViT semantics.

    ``final_norm=False``: the source's final encoder LayerNorm is imported
    into the head's LN (the classifier reads CLS only), avoiding a double
    normalization."""
    return ViTConfig(
        image_size=image_size, patch_size=patch_size,
        num_classes=num_classes, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, head_type="standard", final_norm=False,
        qkv_bias=True, mlp_act="gelu", layer_norm_eps=layer_norm_eps,
        **overrides)


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def detect_format(sd: dict) -> str:
    keys = sd.keys()
    if any(k.startswith(("vit.embeddings", "embeddings.patch_embeddings"))
           for k in keys):
        return "hf"
    if "patch_embed.proj.weight" in keys:
        return "timm"
    raise ValueError("unrecognized pretrained state-dict layout")


def _conv_to_kernel(conv_w):
    """(E, C, P, P) torch Conv2d weight -> vitx (P*P*C, E) patchify kernel."""
    E, C, P, _ = conv_w.shape
    return conv_w.transpose(2, 3, 1, 0).reshape(P * P * C, E)


def _qkv_from_rows(wq, wk, wv, bq, bk, bv, H):
    """torch per-matrix (E, E) rows-out weights -> (E, 3, H, D) + (3, H, D)."""
    E = wq.shape[1]
    D = E // H
    wqkv = np.stack([w.T.reshape(E, H, D) for w in (wq, wk, wv)], axis=1)
    bqkv = np.stack([b.reshape(H, D) for b in (bq, bk, bv)], axis=0)
    return wqkv, bqkv


def import_timm_state_dict(sd: dict, cfg: ViTConfig) -> dict:
    """timm vision_transformer state dict -> vitx param pytree."""
    L, H, E = cfg.depth, cfg.num_heads, cfg.embed_dim
    D = E // H
    blocks = {k: [] for k in
              ("ln1_scale", "ln1_bias", "wqkv", "bqkv", "wo", "bo",
               "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2")}
    for i in range(L):
        p = f"blocks.{i}."
        wqkv = _np(sd[p + "attn.qkv.weight"])            # (3E, E)
        bqkv = _np(sd[p + "attn.qkv.bias"])              # (3E,)
        blocks["wqkv"].append(wqkv.T.reshape(E, 3, H, D))
        blocks["bqkv"].append(bqkv.reshape(3, H, D))
        blocks["wo"].append(_np(sd[p + "attn.proj.weight"]).T)
        blocks["bo"].append(_np(sd[p + "attn.proj.bias"]))
        blocks["ln1_scale"].append(_np(sd[p + "norm1.weight"]))
        blocks["ln1_bias"].append(_np(sd[p + "norm1.bias"]))
        blocks["ln2_scale"].append(_np(sd[p + "norm2.weight"]))
        blocks["ln2_bias"].append(_np(sd[p + "norm2.bias"]))
        blocks["w1"].append(_np(sd[p + "mlp.fc1.weight"]).T)
        blocks["b1"].append(_np(sd[p + "mlp.fc1.bias"]))
        blocks["w2"].append(_np(sd[p + "mlp.fc2.weight"]).T)
        blocks["b2"].append(_np(sd[p + "mlp.fc2.bias"]))

    params = {
        "patch_embed": {
            "kernel": _conv_to_kernel(_np(sd["patch_embed.proj.weight"])),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "blocks": {k: np.stack(v) for k, v in blocks.items()},
        "head": {
            "ln_scale": _np(sd["norm.weight"]),
            "ln_bias": _np(sd["norm.bias"]),
            "w": (_np(sd["head.weight"]).T if "head.weight" in sd
                  else np.zeros((E, cfg.num_classes), np.float32)),
            "b": (_np(sd["head.bias"]) if "head.bias" in sd
                  else np.zeros((cfg.num_classes,), np.float32)),
        },
    }
    if cfg.distill_token:
        # timm deit_*_distilled layout: dist_token + head_dist, sharing the
        # final norm (timm applies one norm before both heads; folding it
        # into each head's LN is numerically identical)
        if "dist_token" not in sd:
            raise KeyError(
                "cfg.distill_token=True but the state dict has no "
                "'dist_token' (not a deit_*_distilled checkpoint)")
        params["dist_token"] = _np(sd["dist_token"])
        params["dist_head"] = {
            "ln_scale": _np(sd["norm.weight"]),
            "ln_bias": _np(sd["norm.bias"]),
            "w": (_np(sd["head_dist.weight"]).T if "head_dist.weight" in sd
                  else np.zeros((E, cfg.num_classes), np.float32)),
            "b": (_np(sd["head_dist.bias"]) if "head_dist.bias" in sd
                  else np.zeros((cfg.num_classes,), np.float32)),
        }
    return _check_pos_embed(params, cfg)


def import_hf_state_dict(sd: dict, cfg: ViTConfig) -> dict:
    """HuggingFace ViTModel / ViTForImageClassification -> vitx pytree."""
    pre = "vit." if any(k.startswith("vit.") for k in sd) else ""
    L, H, E = cfg.depth, cfg.num_heads, cfg.embed_dim
    emb = pre + "embeddings."
    enc = pre + "encoder.layer."

    blocks = {k: [] for k in
              ("ln1_scale", "ln1_bias", "wqkv", "bqkv", "wo", "bo",
               "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2")}
    for i in range(L):
        p = f"{enc}{i}."
        a = p + "attention.attention."
        wqkv, bqkv = _qkv_from_rows(
            _np(sd[a + "query.weight"]), _np(sd[a + "key.weight"]),
            _np(sd[a + "value.weight"]), _np(sd[a + "query.bias"]),
            _np(sd[a + "key.bias"]), _np(sd[a + "value.bias"]), H)
        blocks["wqkv"].append(wqkv)
        blocks["bqkv"].append(bqkv)
        blocks["wo"].append(_np(sd[p + "attention.output.dense.weight"]).T)
        blocks["bo"].append(_np(sd[p + "attention.output.dense.bias"]))
        blocks["ln1_scale"].append(_np(sd[p + "layernorm_before.weight"]))
        blocks["ln1_bias"].append(_np(sd[p + "layernorm_before.bias"]))
        blocks["ln2_scale"].append(_np(sd[p + "layernorm_after.weight"]))
        blocks["ln2_bias"].append(_np(sd[p + "layernorm_after.bias"]))
        blocks["w1"].append(_np(sd[p + "intermediate.dense.weight"]).T)
        blocks["b1"].append(_np(sd[p + "intermediate.dense.bias"]))
        blocks["w2"].append(_np(sd[p + "output.dense.weight"]).T)
        blocks["b2"].append(_np(sd[p + "output.dense.bias"]))

    params = {
        "patch_embed": {
            "kernel": _conv_to_kernel(_np(
                sd[emb + "patch_embeddings.projection.weight"])),
            "bias": _np(sd[emb + "patch_embeddings.projection.bias"]),
        },
        "cls_token": _np(sd[emb + "cls_token"]),
        "pos_embed": _np(sd[emb + "position_embeddings"]),
        "blocks": {k: np.stack(v) for k, v in blocks.items()},
        "head": {
            "ln_scale": _np(sd[pre + "layernorm.weight"]),
            "ln_bias": _np(sd[pre + "layernorm.bias"]),
            "w": (_np(sd["classifier.weight"]).T if "classifier.weight" in sd
                  else np.zeros((E, cfg.num_classes), np.float32)),
            "b": (_np(sd["classifier.bias"]) if "classifier.bias" in sd
                  else np.zeros((cfg.num_classes,), np.float32)),
        },
    }
    return _check_pos_embed(params, cfg)


def import_pretrained_state_dict(sd: dict, cfg: ViTConfig) -> dict:
    """Auto-detect timm/HF layout and import. cfg must be a standard-ViT
    config (see vit_config_for_pretrained); head weights default to zeros
    when the source is a headless backbone."""
    if cfg.head_type != "standard" or cfg.final_norm or not cfg.qkv_bias:
        raise ValueError(
            "pretrained ViTs need head_type='standard', final_norm=False "
            "(the source's final LN folds into the head), qkv_bias=True — "
            "build the config with vit_config_for_pretrained")
    fmt = detect_format(sd)
    return (import_hf_state_dict(sd, cfg) if fmt == "hf"
            else import_timm_state_dict(sd, cfg))


def resize_pos_embed(params: dict, cfg_from: ViTConfig,
                     cfg_to: ViTConfig) -> dict:
    """Bilinear-resize the patch positional grid for a new image size (the
    standard higher-resolution fine-tune trick; CLS slot passes through)."""
    import jax
    import jax.numpy as jnp

    pe = jnp.asarray(params["pos_embed"])                  # (1, P+N, E)
    n_prefix = cfg_from.num_prefix_tokens                  # CLS (+ DIST)
    prefix, grid_pe = pe[:, :n_prefix], pe[:, n_prefix:]
    g_from, g_to = cfg_from.grid_size, cfg_to.grid_size
    E = pe.shape[-1]
    grid_pe = grid_pe.reshape(1, g_from, g_from, E)
    grid_pe = jax.image.resize(grid_pe, (1, g_to, g_to, E), "bilinear")
    out = dict(params)
    out["pos_embed"] = np.asarray(
        jnp.concatenate([prefix, grid_pe.reshape(1, g_to * g_to, E)],
                        axis=1))
    return out


def _check_pos_embed(params: dict, cfg: ViTConfig) -> dict:
    have = params["pos_embed"].shape[1]
    if have != cfg.pos_len:
        raise ValueError(
            f"pos_embed has {have} positions but the config needs "
            f"{cfg.pos_len}; use resize_pos_embed for a different "
            f"image size")
    return params
