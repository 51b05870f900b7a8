"""Pretrained-checkpoint import parity: HuggingFace / timm layouts -> vitx.

The HF test is a true oracle: a transformers ViTForImageClassification with
random weights is imported and must reproduce its logits. The timm test uses
a structurally-faithful state dict (timm itself is not installed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitx import forward
from vitx.interop.pretrained import (
    detect_format,
    import_pretrained_state_dict,
    resize_pos_embed,
    vit_config_for_pretrained,
)

CFG = vit_config_for_pretrained(
    image_size=32, patch_size=8, num_classes=4, embed_dim=64, depth=2,
    num_heads=2, compute_dtype="float32")


def _hf_model():
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=256, image_size=32, patch_size=8, num_labels=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    model = transformers.ViTForImageClassification(hf_cfg)
    model.eval()
    return model


def test_hf_import_logit_parity():
    import torch

    model = _hf_model()
    sd = model.state_dict()
    assert detect_format(sd) == "hf"
    params = import_pretrained_state_dict(sd, CFG)

    x = np.random.default_rng(0).standard_normal((3, 32, 32, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref = model(torch.asarray(x.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(forward(jax.tree.map(jnp.asarray, params), x, CFG))
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel <= 2e-4, rel


def test_timm_layout_import_runs():
    """timm key layout: fused qkv rows; import must produce a working model
    and agree with the HF import of the same underlying weights."""
    import torch

    model = _hf_model()
    hf_sd = model.state_dict()
    E, H = 64, 2

    # re-express the same weights in timm layout
    sd = {
        "cls_token": hf_sd["vit.embeddings.cls_token"],
        "pos_embed": hf_sd["vit.embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            hf_sd["vit.embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            hf_sd["vit.embeddings.patch_embeddings.projection.bias"],
        "norm.weight": hf_sd["vit.layernorm.weight"],
        "norm.bias": hf_sd["vit.layernorm.bias"],
        "head.weight": hf_sd["classifier.weight"],
        "head.bias": hf_sd["classifier.bias"],
    }
    for i in range(2):
        h = f"vit.encoder.layer.{i}."
        t = f"blocks.{i}."
        qkv_w = torch.cat([hf_sd[h + f"attention.attention.{m}.weight"]
                           for m in ("query", "key", "value")], dim=0)
        qkv_b = torch.cat([hf_sd[h + f"attention.attention.{m}.bias"]
                           for m in ("query", "key", "value")], dim=0)
        sd[t + "attn.qkv.weight"] = qkv_w
        sd[t + "attn.qkv.bias"] = qkv_b
        sd[t + "attn.proj.weight"] = hf_sd[h + "attention.output.dense.weight"]
        sd[t + "attn.proj.bias"] = hf_sd[h + "attention.output.dense.bias"]
        sd[t + "norm1.weight"] = hf_sd[h + "layernorm_before.weight"]
        sd[t + "norm1.bias"] = hf_sd[h + "layernorm_before.bias"]
        sd[t + "norm2.weight"] = hf_sd[h + "layernorm_after.weight"]
        sd[t + "norm2.bias"] = hf_sd[h + "layernorm_after.bias"]
        sd[t + "mlp.fc1.weight"] = hf_sd[h + "intermediate.dense.weight"]
        sd[t + "mlp.fc1.bias"] = hf_sd[h + "intermediate.dense.bias"]
        sd[t + "mlp.fc2.weight"] = hf_sd[h + "output.dense.weight"]
        sd[t + "mlp.fc2.bias"] = hf_sd[h + "output.dense.bias"]

    assert detect_format(sd) == "timm"
    p_timm = import_pretrained_state_dict(sd, CFG)
    p_hf = import_pretrained_state_dict(hf_sd, CFG)
    for a, b in zip(jax.tree.leaves(p_timm), jax.tree.leaves(p_hf)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_resize_pos_embed_for_finetune():
    model = _hf_model()
    params = import_pretrained_state_dict(model.state_dict(), CFG)
    cfg_hi = CFG.replace(image_size=64)
    params_hi = resize_pos_embed(params, CFG, cfg_hi)
    assert params_hi["pos_embed"].shape == (1, cfg_hi.seq_len, 64)
    x = np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(
        np.float32)
    logits = forward(jax.tree.map(jnp.asarray, params_hi), x, cfg_hi)
    assert np.all(np.isfinite(np.asarray(logits)))
    # CLS slot passes through untouched
    np.testing.assert_allclose(params_hi["pos_embed"][0, 0],
                               params["pos_embed"][0, 0], rtol=1e-6)


def test_wrong_config_rejected():
    model = _hf_model()
    with pytest.raises(ValueError):
        import_pretrained_state_dict(model.state_dict(),
                                     CFG.replace(head_type="reference"))


def test_timm_deit_distilled_import():
    """deit_*_distilled layout: dist_token + head_dist import onto a
    distill_token config; the shared final norm folds into both heads."""
    import torch

    model = _hf_model()
    hf_sd = model.state_dict()
    cfg = CFG.replace(distill_token=True)

    # timm-layout sd (as in test_timm_layout_import_runs) + deit extras
    sd = {
        "cls_token": hf_sd["vit.embeddings.cls_token"],
        "dist_token": torch.randn(1, 1, 64),
        # deit pos_embed covers CLS + DIST + patches
        "pos_embed": torch.randn(1, cfg.seq_len, 64),
        "patch_embed.proj.weight":
            hf_sd["vit.embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            hf_sd["vit.embeddings.patch_embeddings.projection.bias"],
        "norm.weight": hf_sd["vit.layernorm.weight"],
        "norm.bias": hf_sd["vit.layernorm.bias"],
        "head.weight": hf_sd["classifier.weight"],
        "head.bias": hf_sd["classifier.bias"],
        "head_dist.weight": torch.randn(4, 64),
        "head_dist.bias": torch.randn(4),
    }
    for i in range(2):
        h = f"vit.encoder.layer.{i}."
        t = f"blocks.{i}."
        sd[t + "attn.qkv.weight"] = torch.cat(
            [hf_sd[h + f"attention.attention.{m}.weight"]
             for m in ("query", "key", "value")], dim=0)
        sd[t + "attn.qkv.bias"] = torch.cat(
            [hf_sd[h + f"attention.attention.{m}.bias"]
             for m in ("query", "key", "value")], dim=0)
        sd[t + "attn.proj.weight"] = hf_sd[h + "attention.output.dense.weight"]
        sd[t + "attn.proj.bias"] = hf_sd[h + "attention.output.dense.bias"]
        sd[t + "norm1.weight"] = hf_sd[h + "layernorm_before.weight"]
        sd[t + "norm1.bias"] = hf_sd[h + "layernorm_before.bias"]
        sd[t + "norm2.weight"] = hf_sd[h + "layernorm_after.weight"]
        sd[t + "norm2.bias"] = hf_sd[h + "layernorm_after.bias"]
        sd[t + "mlp.fc1.weight"] = hf_sd[h + "intermediate.dense.weight"]
        sd[t + "mlp.fc1.bias"] = hf_sd[h + "intermediate.dense.bias"]
        sd[t + "mlp.fc2.weight"] = hf_sd[h + "output.dense.weight"]
        sd[t + "mlp.fc2.bias"] = hf_sd[h + "output.dense.bias"]

    params = import_pretrained_state_dict(sd, cfg)
    np.testing.assert_allclose(params["dist_token"],
                               sd["dist_token"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(params["dist_head"]["w"],
                               sd["head_dist.weight"].numpy().T, rtol=1e-6)
    # shared final norm folded into BOTH heads
    np.testing.assert_allclose(params["dist_head"]["ln_scale"],
                               params["head"]["ln_scale"], rtol=1e-6)

    from vitx import forward_heads
    x = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(
        np.float32)
    jp = jax.tree.map(jnp.asarray, params)
    fused = np.asarray(forward(jp, x, cfg))
    cls_l, dist_l = forward_heads(jp, x, cfg)
    np.testing.assert_allclose(
        fused, 0.5 * (np.asarray(cls_l) + np.asarray(dist_l)),
        rtol=1e-5, atol=1e-5)

    # a non-distilled sd cannot satisfy a distill_token config
    sd2 = {k: v for k, v in sd.items() if k != "dist_token"}
    with pytest.raises(KeyError, match="dist_token"):
        import_pretrained_state_dict(sd2, cfg)
