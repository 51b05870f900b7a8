"""Corrected PyTorch reference ViT — the parity oracle.

An independent re-implementation (from the SURVEY.md spec, not copied code) of
the reference architecture (``/root/reference/src/VisionTransformer/
{vit.py,transformer.py}``) with its bugs fixed, exactly as BASELINE.md
specifies ("scale-corrected PyTorch reference"):

- attention scales by 1/sqrt(head_dim) (reference multiplied, transformer.py:24)
- CLS token is a single (1, 1, E) vector PREPENDED (reference: per-batch-slot
  CLS appended, vit.py:31-41)
- stable softmax (torch's built-in)

Everything else matches the reference semantics: per-head K/Q/V Linears with
no bias (transformer.py:12-17), output projection with bias, ReLU MLP in
blocks, pre-LN residuals, no final encoder norm, and the unusual classifier
head Linear(E,4E) -> GELU -> LayerNorm(4E) -> Linear(4E, classes)
(vit.py:69-74).

Also provides the weight-layout export into the vitx pytree.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn


class TorchHeadAttention(nn.Module):
    """Multi-head attention with per-head no-bias K/Q/V Linears (corrected)."""

    def __init__(self, embed_dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.q = nn.ModuleList(
            nn.Linear(embed_dim, self.head_dim, bias=False)
            for _ in range(num_heads))
        self.k = nn.ModuleList(
            nn.Linear(embed_dim, self.head_dim, bias=False)
            for _ in range(num_heads))
        self.v = nn.ModuleList(
            nn.Linear(embed_dim, self.head_dim, bias=False)
            for _ in range(num_heads))
        self.proj = nn.Linear(embed_dim, embed_dim)

    def forward(self, x):
        outs = []
        probs = []
        for h in range(self.num_heads):
            q, k, v = self.q[h](x), self.k[h](x), self.v[h](x)
            wei = (q @ k.transpose(-2, -1)) / math.sqrt(self.head_dim)
            wei = torch.softmax(wei, dim=-1)
            probs.append(wei)
            outs.append(wei @ v)
        out = torch.cat(outs, dim=-1)
        self.attention_probs = torch.stack(probs, dim=1)
        return self.proj(out)


class TorchBlock(nn.Module):
    def __init__(self, embed_dim: int, num_heads: int):
        super().__init__()
        self.ln1 = nn.LayerNorm(embed_dim)
        self.attn = TorchHeadAttention(embed_dim, num_heads)
        self.ln2 = nn.LayerNorm(embed_dim)
        self.mlp = nn.Sequential(
            nn.Linear(embed_dim, 4 * embed_dim),
            nn.ReLU(),
            nn.Linear(4 * embed_dim, embed_dim),
        )

    def forward(self, x):
        x = x + self.attn(self.ln1(x))
        x = x + self.mlp(self.ln2(x))
        return x


class TorchViT(nn.Module):
    """Corrected reference ViT. Input: (B, C, H, W) NCHW like torch."""

    def __init__(self, *, image_size, patch_size, num_channels, num_classes,
                 embed_dim, depth, num_heads):
        super().__init__()
        grid = image_size // patch_size
        self.patch = nn.Conv2d(num_channels, embed_dim,
                               kernel_size=patch_size, stride=patch_size)
        self.cls_token = nn.Parameter(torch.randn(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(torch.randn(1, grid * grid + 1, embed_dim))
        self.blocks = nn.ModuleList(
            TorchBlock(embed_dim, num_heads) for _ in range(depth))
        self.head = nn.Sequential(
            nn.Linear(embed_dim, 4 * embed_dim),
            nn.GELU(),
            nn.LayerNorm(4 * embed_dim),
            nn.Linear(4 * embed_dim, num_classes),
        )

    def forward(self, x):
        B = x.shape[0]
        x = self.patch(x).flatten(2).permute(0, 2, 1)          # (B, N, E)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)                          # prepend
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(x[:, 0, :])


# ---------------------------------------------------------------------------
# Weight export: torch reference -> vitx pytree layout
# ---------------------------------------------------------------------------

def export_to_vitx(model: TorchViT, patch_size: int, num_heads: int):
    """Map TorchViT weights into the vitx param pytree (numpy arrays)."""

    def t2n(t):
        return t.detach().cpu().numpy().astype(np.float32)

    E = model.cls_token.shape[-1]
    H = num_heads
    D = E // H
    P = patch_size

    conv_w = t2n(model.patch.weight)                    # (E, C, P, P)
    # vitx patchify flattens (p_row, p_col, channel) -> kernel (P*P*C, E)
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(P * P * conv_w.shape[1], E)

    blocks = {
        "ln1_scale": [], "ln1_bias": [], "wqkv": [], "wo": [], "bo": [],
        "ln2_scale": [], "ln2_bias": [], "w1": [], "b1": [], "w2": [], "b2": [],
    }
    for blk in model.blocks:
        wqkv = np.zeros((E, 3, H, D), np.float32)
        for h in range(H):
            wqkv[:, 0, h, :] = t2n(blk.attn.q[h].weight).T
            wqkv[:, 1, h, :] = t2n(blk.attn.k[h].weight).T
            wqkv[:, 2, h, :] = t2n(blk.attn.v[h].weight).T
        blocks["wqkv"].append(wqkv)
        blocks["wo"].append(t2n(blk.attn.proj.weight).T)
        blocks["bo"].append(t2n(blk.attn.proj.bias))
        blocks["ln1_scale"].append(t2n(blk.ln1.weight))
        blocks["ln1_bias"].append(t2n(blk.ln1.bias))
        blocks["ln2_scale"].append(t2n(blk.ln2.weight))
        blocks["ln2_bias"].append(t2n(blk.ln2.bias))
        blocks["w1"].append(t2n(blk.mlp[0].weight).T)
        blocks["b1"].append(t2n(blk.mlp[0].bias))
        blocks["w2"].append(t2n(blk.mlp[2].weight).T)
        blocks["b2"].append(t2n(blk.mlp[2].bias))

    params = {
        "patch_embed": {"kernel": kernel, "bias": t2n(model.patch.bias)},
        "cls_token": t2n(model.cls_token),
        "pos_embed": t2n(model.pos_embed),
        "blocks": {k: np.stack(v) for k, v in blocks.items()},
        "head": {
            "w1": t2n(model.head[0].weight).T,
            "b1": t2n(model.head[0].bias),
            "ln_scale": t2n(model.head[2].weight),
            "ln_bias": t2n(model.head[2].bias),
            "w2": t2n(model.head[3].weight).T,
            "b2": t2n(model.head[3].bias),
        },
    }
    return params


# ---------------------------------------------------------------------------
# BUG-EXACT torch oracle — the reference train.py model with its bugs intact
# ---------------------------------------------------------------------------
# Re-expression (not a copy) of /root/reference/src/VisionTransformer/
# {vit.py,transformer.py} keeping the three semantic bugs vitx's
# parity="bug_exact" mode reproduces: per-batch-slot CLS APPENDED while the
# head reads token 0 (vit.py:31-41 vs :80), and attention logits MULTIPLIED
# by sqrt(head_size) (transformer.py:24). Module attribute names are chosen
# so state_dict() keys match a real reference checkpoint exactly
# (the key map documented in vitx/interop/torch_ref.py).

class _BuggyHead(nn.Module):
    def __init__(self, head_size, n_embd):
        super().__init__()
        self.key = nn.Linear(n_embd, head_size, bias=False)
        self.query = nn.Linear(n_embd, head_size, bias=False)
        self.value = nn.Linear(n_embd, head_size, bias=False)

    def forward(self, x):
        k, q = self.key(x), self.query(x)
        wei = (q @ k.transpose(-2, -1)) * (k.shape[-1] ** 0.5)  # BUG: multiply
        wei = torch.softmax(wei, dim=-1)
        return wei @ self.value(x)


class _BuggyMHA(nn.Module):
    def __init__(self, num_heads, head_size, n_embd, dropout=0.2):
        super().__init__()
        self.heads = nn.ModuleList(
            _BuggyHead(head_size, n_embd) for _ in range(num_heads))
        self.proj = nn.Linear(n_embd, n_embd)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):
        out = torch.cat([h(x) for h in self.heads], dim=-1)
        return self.dropout(self.proj(out))


class _BuggyFFwd(nn.Module):
    def __init__(self, n_embd, dropout=0.2):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(n_embd, 4 * n_embd), nn.ReLU(),
            nn.Linear(4 * n_embd, n_embd), nn.Dropout(dropout))

    def forward(self, x):
        return self.mlp(x)


class _BuggyBlock(nn.Module):
    def __init__(self, n_embd, n_head):
        super().__init__()
        self.multi_head = _BuggyMHA(n_head, n_embd // n_head, n_embd)
        self.ffwd = _BuggyFFwd(n_embd)
        self.ln1 = nn.LayerNorm(n_embd)
        self.ln2 = nn.LayerNorm(n_embd)

    def forward(self, x):
        x = x + self.multi_head(self.ln1(x))
        x = x + self.ffwd(self.ln2(x))
        return x


class _BuggyEncoder(nn.Module):
    def __init__(self, n_embd, n_head, n_blocks):
        super().__init__()
        self.blocks = nn.Sequential(
            *[_BuggyBlock(n_embd, n_head) for _ in range(n_blocks)])

    def forward(self, x):
        return self.blocks(x)


class _BuggyEmbeddings(nn.Module):
    def __init__(self, channels, n_embd, patch, num_patches, batch_size):
        super().__init__()
        self.sequence = nn.Sequential(
            nn.Conv2d(channels, n_embd, kernel_size=patch, stride=patch),
            nn.Flatten(2))
        self.cls_tkn_embd = nn.Parameter(
            torch.randn(batch_size, 1, n_embd))          # BUG: per batch slot
        self.pos_embd = nn.Parameter(torch.randn(1, num_patches + 1, n_embd))

    def forward(self, x):
        x = self.sequence(x).permute(0, 2, 1)
        x = torch.cat([x, self.cls_tkn_embd], dim=1)     # BUG: CLS appended
        return x + self.pos_embd


class TorchBuggyViT(nn.Module):
    """Bug-exact reference model (NCHW input, batch locked to batch_size).

    ``state_dict()`` keys are identical to a checkpoint written by the
    reference's train.py, so saving ``{"model_state_dict": sd}`` produces a
    file both the reference's resume path and vitx's importer accept.
    """

    def __init__(self, *, image_size, patch_size, num_channels, num_classes,
                 embed_dim, depth, num_heads, batch_size):
        super().__init__()
        grid = image_size // patch_size
        self.emdeddings = _BuggyEmbeddings(
            num_channels, embed_dim, patch_size, grid * grid, batch_size)
        self.transformer_encoder = _BuggyEncoder(embed_dim, num_heads, depth)
        self.mlp = nn.Sequential(
            nn.Linear(embed_dim, 4 * embed_dim), nn.GELU(),
            nn.LayerNorm(4 * embed_dim), nn.Linear(4 * embed_dim, num_classes))

    def forward(self, x):
        x = self.emdeddings(x)
        x = self.transformer_encoder(x)
        return self.mlp(x[:, 0, :])                      # BUG: reads a patch
