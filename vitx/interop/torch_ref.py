"""Reference-format checkpoint interop.

Maps between the vitx parameter pytree and the PyTorch ``state_dict`` layout
of the reference model (``src/VisionTransformer/vit.py``/``transformer.py``),
so reference checkpoints (``torch.save({'model_state_dict': ...})``,
train.py:107-113) can be imported and vitx params exported back.

Reference key map (torch auto-generated names, misspelling ``emdeddings``
included — vit.py:52):

  emdeddings.sequence.0.{weight,bias}                       Conv2d (E, C, P, P)
  emdeddings.cls_tkn_embd                                   (batch_size, 1, E)!
  emdeddings.pos_embd                                       (1, N+1, E)
  transformer_encoder.blocks.{i}.ln1.{weight,bias}
  transformer_encoder.blocks.{i}.multi_head.heads.{h}.{query,key,value}.weight
  transformer_encoder.blocks.{i}.multi_head.proj.{weight,bias}
  transformer_encoder.blocks.{i}.ln2.{weight,bias}
  transformer_encoder.blocks.{i}.ffwd.mlp.{0,2}.{weight,bias}
  mlp.0.{weight,bias}  mlp.2.{weight,bias}(LayerNorm 4E)  mlp.3.{weight,bias}

The reference's CLS token is sized per batch slot (vit.py:31-33, a design
bug); import takes slot 0, export tiles the single vector to the requested
``batch_size`` so the file round-trips into the reference code.
"""

from __future__ import annotations

import numpy as np

from vitx.core.config import ViTConfig


def _np(t):
    """torch tensor or array-like -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def import_reference_state_dict(sd: dict, cfg: ViTConfig) -> dict:
    """Reference torch state_dict -> vitx param pytree (numpy leaves)."""
    E, H, D, L = cfg.embed_dim, cfg.num_heads, cfg.head_dim, cfg.depth
    P, C = cfg.patch_size, cfg.num_channels

    conv_w = _np(sd["emdeddings.sequence.0.weight"])          # (E, C, P, P)
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(P * P * C, E)
    cls = _np(sd["emdeddings.cls_tkn_embd"])[:1]              # slot 0 of (B,1,E)

    blocks = {k: [] for k in ("ln1_scale", "ln1_bias", "wqkv", "wo", "bo",
                              "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2")}
    for i in range(L):
        pre = f"transformer_encoder.blocks.{i}."
        wqkv = np.zeros((E, 3, H, D), np.float32)
        for h in range(H):
            hp = f"{pre}multi_head.heads.{h}."
            wqkv[:, 0, h, :] = _np(sd[hp + "query.weight"]).T
            wqkv[:, 1, h, :] = _np(sd[hp + "key.weight"]).T
            wqkv[:, 2, h, :] = _np(sd[hp + "value.weight"]).T
        blocks["wqkv"].append(wqkv)
        blocks["wo"].append(_np(sd[pre + "multi_head.proj.weight"]).T)
        blocks["bo"].append(_np(sd[pre + "multi_head.proj.bias"]))
        blocks["ln1_scale"].append(_np(sd[pre + "ln1.weight"]))
        blocks["ln1_bias"].append(_np(sd[pre + "ln1.bias"]))
        blocks["ln2_scale"].append(_np(sd[pre + "ln2.weight"]))
        blocks["ln2_bias"].append(_np(sd[pre + "ln2.bias"]))
        blocks["w1"].append(_np(sd[pre + "ffwd.mlp.0.weight"]).T)
        blocks["b1"].append(_np(sd[pre + "ffwd.mlp.0.bias"]))
        blocks["w2"].append(_np(sd[pre + "ffwd.mlp.2.weight"]).T)
        blocks["b2"].append(_np(sd[pre + "ffwd.mlp.2.bias"]))

    return {
        "patch_embed": {"kernel": kernel,
                        "bias": _np(sd["emdeddings.sequence.0.bias"])},
        "cls_token": cls,
        "pos_embed": _np(sd["emdeddings.pos_embd"]),
        "blocks": {k: np.stack(v) for k, v in blocks.items()},
        "head": {
            "w1": _np(sd["mlp.0.weight"]).T,
            "b1": _np(sd["mlp.0.bias"]),
            "ln_scale": _np(sd["mlp.2.weight"]),
            "ln_bias": _np(sd["mlp.2.bias"]),
            "w2": _np(sd["mlp.3.weight"]).T,
            "b2": _np(sd["mlp.3.bias"]),
        },
    }


def export_reference_state_dict(params: dict, cfg: ViTConfig,
                                batch_size: int = 1) -> dict:
    """vitx param pytree -> reference torch state_dict (numpy values)."""
    E, H, D, L = cfg.embed_dim, cfg.num_heads, cfg.head_dim, cfg.depth
    P, C = cfg.patch_size, cfg.num_channels
    if "head" not in params or "w1" not in params["head"]:
        raise ValueError("export requires head_type='reference' params")

    kernel = np.asarray(params["patch_embed"]["kernel"], np.float32)
    conv_w = kernel.reshape(P, P, C, E).transpose(3, 2, 0, 1)   # (E, C, P, P)
    cls = np.asarray(params["cls_token"], np.float32)
    sd = {
        "emdeddings.sequence.0.weight": conv_w,
        "emdeddings.sequence.0.bias":
            np.asarray(params["patch_embed"]["bias"], np.float32),
        "emdeddings.cls_tkn_embd": np.tile(cls, (batch_size, 1, 1)),
        "emdeddings.pos_embd": np.asarray(params["pos_embed"], np.float32),
    }
    b = params["blocks"]
    for i in range(L):
        pre = f"transformer_encoder.blocks.{i}."
        wqkv = np.asarray(b["wqkv"][i], np.float32)            # (E, 3, H, D)
        for h in range(H):
            hp = f"{pre}multi_head.heads.{h}."
            sd[hp + "query.weight"] = wqkv[:, 0, h, :].T
            sd[hp + "key.weight"] = wqkv[:, 1, h, :].T
            sd[hp + "value.weight"] = wqkv[:, 2, h, :].T
        sd[pre + "multi_head.proj.weight"] = np.asarray(b["wo"][i]).T
        sd[pre + "multi_head.proj.bias"] = np.asarray(b["bo"][i])
        sd[pre + "ln1.weight"] = np.asarray(b["ln1_scale"][i])
        sd[pre + "ln1.bias"] = np.asarray(b["ln1_bias"][i])
        sd[pre + "ln2.weight"] = np.asarray(b["ln2_scale"][i])
        sd[pre + "ln2.bias"] = np.asarray(b["ln2_bias"][i])
        sd[pre + "ffwd.mlp.0.weight"] = np.asarray(b["w1"][i]).T
        sd[pre + "ffwd.mlp.0.bias"] = np.asarray(b["b1"][i])
        sd[pre + "ffwd.mlp.2.weight"] = np.asarray(b["w2"][i]).T
        sd[pre + "ffwd.mlp.2.bias"] = np.asarray(b["b2"][i])

    hp = params["head"]
    sd["mlp.0.weight"] = np.asarray(hp["w1"], np.float32).T
    sd["mlp.0.bias"] = np.asarray(hp["b1"], np.float32)
    sd["mlp.2.weight"] = np.asarray(hp["ln_scale"], np.float32)
    sd["mlp.2.bias"] = np.asarray(hp["ln_bias"], np.float32)
    sd["mlp.3.weight"] = np.asarray(hp["w2"], np.float32).T
    sd["mlp.3.bias"] = np.asarray(hp["b2"], np.float32)
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    return sd
