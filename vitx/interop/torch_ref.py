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

import warnings

import numpy as np

from vitx.core.config import ViTConfig


def _np(t):
    """torch tensor or array-like -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def import_reference_state_dict(sd: dict, cfg: ViTConfig) -> dict:
    """Reference torch state_dict -> vitx param pytree (numpy leaves).

    With ``cfg.parity == "bug_exact"`` the import is prediction-exact for
    checkpoints trained by the reference's own ``train.py``: the full
    per-batch-slot CLS (vit.py:31-33) is kept, and the forward reproduces
    CLS-appended + *sqrt(head_dim) semantics (vit.py:41, transformer.py:24).
    With the default corrected parity, keys/format map exactly but vitx
    computes the corrected semantics (CLS slot 0 prepended, 1/sqrt scaling)
    — such checkpoints load but won't reproduce train.py's predictions,
    hence the runtime warning.
    """
    if cfg.parity != "bug_exact":
        warnings.warn(
            "import_reference_state_dict maps keys exactly, but this config "
            "computes the corrected semantics (CLS prepended, "
            "1/sqrt(head_dim) scaling); a checkpoint trained with the "
            "reference's train.py will not reproduce that model's "
            "predictions. Use ViTConfig(parity='bug_exact') for "
            "prediction-exact loading of such checkpoints.", stacklevel=2)
    E, H, D, L = cfg.embed_dim, cfg.num_heads, cfg.head_dim, cfg.depth
    P, C = cfg.patch_size, cfg.num_channels

    conv_w = _np(sd["emdeddings.sequence.0.weight"])          # (E, C, P, P)
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(P * P * C, E)
    cls_full = _np(sd["emdeddings.cls_tkn_embd"])             # (B_train, 1, E)
    # bug_exact keeps every per-batch-slot CLS; corrected takes slot 0
    cls = cls_full if cfg.parity == "bug_exact" else cls_full[:1]

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
    if cfg.distill_token:
        raise ValueError("the reference layout has no distillation token; "
                         "export requires distill_token=False")
    if cfg.pos_embed != "learned":
        raise ValueError("the reference layout stores a learned positional "
                         "table; sincos2d/rope models have none to export")
    if cfg.mlp_act == "swiglu":
        raise ValueError("the reference FeedForward is Linear->act->Linear; "
                         "swiglu gate weights (w3) have no export slot")
    if "kernel" not in params["patch_embed"]:
        raise ValueError("export requires stem='patch' params (the "
                         "reference has no conv-stem equivalent)")
    if "bo" not in params["blocks"]:
        raise ValueError("export requires proj_bias=True params (the "
                         "reference projection always has a bias, "
                         "transformer.py:38)")
    if "reg_tokens" in params:
        raise ValueError("export requires num_registers=0 params (the "
                         "reference has no register tokens)")
    if "lnq_scale" in params["blocks"]:
        raise ValueError("the reference layout has no QK-Norm scales; "
                         "export requires qk_norm=False")
    if "moe_blocks" in params:
        raise ValueError("the reference layout has no Soft-MoE blocks; "
                         "export requires moe_experts=0")
    if "ls1" in params["blocks"]:
        raise ValueError("the reference layout has no LayerScale gains; "
                         "export requires layerscale_init=0")

    kernel = np.asarray(params["patch_embed"]["kernel"], np.float32)
    conv_w = kernel.reshape(P, P, C, E).transpose(3, 2, 0, 1)   # (E, C, P, P)
    cls = np.asarray(params["cls_token"], np.float32)
    # a bug_exact import keeps the per-slot CLS (B, 1, E) — round-trip it
    # untiled; a single (1, 1, E) vector tiles to the requested batch size
    cls_out = cls if cls.shape[0] > 1 else np.tile(cls, (batch_size, 1, 1))
    sd = {
        "emdeddings.sequence.0.weight": conv_w,
        "emdeddings.sequence.0.bias":
            np.asarray(params["patch_embed"]["bias"], np.float32),
        "emdeddings.cls_tkn_embd": cls_out,
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


# ---------------------------------------------------------------------------
# Optimizer-state export (reference resume path, train.py:66,73)
# ---------------------------------------------------------------------------

def reference_parameter_order(cfg: ViTConfig) -> list[str]:
    """State-dict keys in ``model.parameters()`` order for the reference model.

    torch's ``named_parameters`` yields a module's own parameters before its
    children: PatchEmbedding registers cls/pos as direct Parameters (vit.py:31,
    34) and the Conv2d inside a child Sequential (vit.py:20), so cls/pos come
    FIRST; each Head registers key, query, value in that order
    (transformer.py:12-17); Block registers multi_head, ffwd, then ln1/ln2
    (transformer.py:70-73). ``optim.AdamW(model.parameters())`` (train.py:66)
    numbers params 0..n-1 in exactly this order.
    """
    keys = ["emdeddings.cls_tkn_embd", "emdeddings.pos_embd",
            "emdeddings.sequence.0.weight", "emdeddings.sequence.0.bias"]
    for i in range(cfg.depth):
        pre = f"transformer_encoder.blocks.{i}."
        for h in range(cfg.num_heads):
            hp = f"{pre}multi_head.heads.{h}."
            keys += [hp + "key.weight", hp + "query.weight",
                     hp + "value.weight"]
        keys += [pre + "multi_head.proj.weight", pre + "multi_head.proj.bias",
                 pre + "ffwd.mlp.0.weight", pre + "ffwd.mlp.0.bias",
                 pre + "ffwd.mlp.2.weight", pre + "ffwd.mlp.2.bias",
                 pre + "ln1.weight", pre + "ln1.bias",
                 pre + "ln2.weight", pre + "ln2.bias"]
    keys += ["mlp.0.weight", "mlp.0.bias", "mlp.2.weight", "mlp.2.bias",
             "mlp.3.weight", "mlp.3.bias"]
    return keys


def _find_adam_state(opt_state):
    """Locate optax's ScaleByAdamState (mu/nu/count) inside a chained state."""
    if hasattr(opt_state, "mu") and hasattr(opt_state, "nu"):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            found = _find_adam_state(sub)
            if found is not None:
                return found
    return None


def export_reference_optimizer_state(opt_state, cfg: ViTConfig, *,
                                     lr: float = 1e-4,
                                     weight_decay: float = 1e-4,
                                     betas=(0.9, 0.999), eps: float = 1e-8,
                                     batch_size: int = 1) -> dict:
    """vitx AdamW opt_state -> ``torch.optim.AdamW`` state_dict.

    AdamW moments share the parameter pytree structure, so the weight-export
    layout transforms (transposes/reshapes/per-head slices) apply verbatim —
    they are pure relayouts and commute with the elementwise Adam update.
    The result loads into the reference's resume path (train.py:73) and
    continues training with identical moments.
    """
    import torch

    adam = _find_adam_state(opt_state)
    if adam is None:
        raise ValueError("no ScaleByAdamState found in opt_state; was the "
                         "optimizer built by vitx.train.step.make_optimizer?")
    mu_sd = export_reference_state_dict(adam.mu, cfg, batch_size=batch_size)
    nu_sd = export_reference_state_dict(adam.nu, cfg, batch_size=batch_size)
    step = torch.tensor(float(np.asarray(adam.count)))

    order = reference_parameter_order(cfg)
    state = {
        i: {"step": step.clone(),
            "exp_avg": torch.from_numpy(mu_sd[key].copy()),
            "exp_avg_sq": torch.from_numpy(nu_sd[key].copy())}
        for i, key in enumerate(order)
    }
    return {
        "state": state,
        "param_groups": [{
            "lr": lr, "betas": tuple(betas), "eps": eps,
            "weight_decay": weight_decay, "amsgrad": False,
            "maximize": False, "foreach": None, "capturable": False,
            "differentiable": False, "fused": None,
            "decoupled_weight_decay": True,
            "params": list(range(len(order))),
        }],
    }
