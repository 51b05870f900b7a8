"""LoRA — low-rank adapters for parameter-efficient fine-tuning.

Hu et al. 2021 ("LoRA: Low-Rank Adaptation of Large Language Models"),
applied to the ViT encoder: each targeted block weight ``w`` gains a pair
``(A, B)`` with ``w_eff = w + (alpha/rank) * A @ B``; only the adapters
(plus the classifier head) train, the base weights stay frozen.

Beyond-reference extension (the reference has no fine-tuning story at all —
its train.py trains from scratch, ``/root/reference/src/train.py:123-183``);
it completes vitx's transfer surface: ``--init-from`` grafts a pretrained
backbone, ``--lora-rank`` then fine-tunes ~1% of the parameters.

TPU-native design choices:

- Adapters live INSIDE ``params["blocks"]`` as stacked ``(L, ...)`` leaves
  (``lora_wqkv_a`` etc.), so the encoder's single ``lax.scan`` slices them
  per layer exactly like the base weights — no second parameter tree, no
  per-layer Python loops.
- The delta is folded into the dense weight at the top of each block
  (``merge_block``): one ``(E, r) x (r, ...)`` matmul per target per layer
  (rank 4-16 -> well under 0.1% of the block's FLOPs), after which every
  downstream path — the fused Pallas MHA/MLP kernels, flash attention,
  rollout, ToMe, Grad-CAM — consumes ordinary dense weights unchanged.
- Freezing is by GRADIENT STRUCTURE, not update masking alone: the train
  step wraps frozen leaves in ``lax.stop_gradient`` (vitx/train/step.py),
  so XLA never emits the frozen weight-gradient matmuls (~half the backward
  matmul FLOPs), and the optimizer is ``optax.masked`` so no moments are
  allocated for frozen leaves (the ZeRO-style memory win, single-chip).

``merge_lora_params`` folds the adapters into a plain dense checkpoint for
deployment (int8 artifacts, StableHLO export, reference-``.pt`` export).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vitx.core.config import ViTConfig

# target name -> (einsum folding A@B to the base weight's shape,
#                 A trailing shape fn, B trailing shape fn). Shapes are per
# layer; init stacks a leading (L,) axis. The ellipsis makes each equation
# serve BOTH forms: per-layer slices inside the encoder scan (merge_block
# from _encoder_block) and the full stacked (L, ...) leaves
# (merge_lora_params).
_TARGETS = {
    "wqkv": ("...er,...rshd->...eshd",
             lambda c: (c.embed_dim,),
             lambda c: (3, c.num_heads, c.head_dim)),
    "wo": ("...er,...rf->...ef",
           lambda c: (c.embed_dim,),
           lambda c: (c.embed_dim,)),
    "w1": ("...er,...rm->...em",
           lambda c: (c.embed_dim,),
           lambda c: (c.mlp_dim,)),
    "w2": ("...mr,...re->...me",
           lambda c: (c.mlp_dim,),
           lambda c: (c.embed_dim,)),
}


def target_names(cfg: ViTConfig) -> tuple:
    """The block weights cfg adapts: attention always, MLP with "all"."""
    return (("wqkv", "wo", "w1", "w2") if cfg.lora_targets == "all"
            else ("wqkv", "wo"))


def init_lora_leaves(rng, cfg: ViTConfig) -> dict:
    """Stacked (L, ...) adapter leaves to insert into ``params["blocks"]``.

    A ~ trunc-normal(init_std), B = 0 (the paper's init): the adapted model
    starts EXACTLY at the base model — step 0 logits are bit-identical to
    the un-adapted forward, which tests/test_lora.py pins.
    """
    if not cfg.lora_rank:
        return {}
    from vitx.nn.vit import _trunc_normal

    L, r, pdt = cfg.depth, cfg.lora_rank, cfg.pdtype()
    leaves = {}
    keys = jax.random.split(rng, len(_TARGETS))
    for key, name in zip(keys, target_names(cfg)):
        _, a_shape, b_shape = _TARGETS[name]
        leaves[f"lora_{name}_a"] = _trunc_normal(
            key, (L,) + a_shape(cfg) + (r,), cfg.init_std, pdt)
        leaves[f"lora_{name}_b"] = jnp.zeros((L,) + (r,) + b_shape(cfg), pdt)
    return leaves


def merge_block(bp: dict, cfg: ViTConfig) -> dict:
    """Fold the adapters of ONE block (per-layer slices, inside the encoder
    scan) into its dense weights: ``w + (alpha/rank) * A @ B``. Returns a
    new dict with the ``lora_*`` keys removed so downstream consumers (the
    fused kernels' argument packing, weight exports) see only dense names."""
    if not any(k.startswith("lora_") for k in bp):
        return bp
    out = {k: v for k, v in bp.items() if not k.startswith("lora_")}
    scale = cfg.lora_scale
    for name, (eq, _, _) in _TARGETS.items():
        a = bp.get(f"lora_{name}_a")
        if a is None:
            continue
        b = bp[f"lora_{name}_b"]
        w = out[name]
        delta = jnp.einsum(eq, a.astype(jnp.float32), b.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        out[name] = w + (scale * delta).astype(w.dtype)
    return out


def merge_lora_params(params: dict, cfg: ViTConfig):
    """Fold ALL adapters into the dense weights and drop them: returns
    ``(plain_params, plain_cfg)`` — an ordinary checkpoint any consumer
    (int8 artifacts, StableHLO export, ``.pt`` export, serving) can take.
    The merged forward is exactly the adapted forward
    (tests/test_lora.py::test_merged_params_match_runtime_merge)."""
    if not cfg.lora_rank:
        return params, cfg
    out = dict(params)
    out["blocks"] = merge_block(dict(params["blocks"]), cfg)
    return out, cfg.replace(lora_rank=0, lora_alpha=0.0)


def has_lora(params: dict) -> bool:
    blocks = params.get("blocks", {})
    return any(k.startswith("lora_") for k in blocks)
