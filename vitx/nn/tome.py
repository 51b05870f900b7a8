"""Token merging (ToMe) — inference acceleration by shrinking the token set.

Implements Bolya et al. 2023, "Token Merging: Your ViT But Faster": between
the attention and MLP of every block, the ``r`` most similar pairs of patch
tokens are merged (size-weighted average), so block ``l`` runs on
``T - l*r`` tokens. Attention logits get a ``log(size)`` key bias
("proportional attention") so a merged token counts as many.

Beyond-reference capability (the reference always runs every token,
``src/VisionTransformer/transformer.py:20-31``); the TPU-native design
constraint is STATIC SHAPES: ``r`` is a compile-time constant, each block
is traced at its own fixed token count (an unrolled loop, not the scan),
and the merge itself is expressed as one-hot matmuls + static-size gathers
— no dynamic shapes anywhere, everything lowers onto the MXU/VPU.

Layout invariant: tokens stay ordered [prefix (CLS + distill) | patches |
registers]; only PATCH tokens are merge candidates, so the head's token-0
read, the distill token and the register tail are untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vitx.core.config import ViTConfig
from vitx.nn.layers import layer_norm

Params = dict


def parse_tome_r(s):
    """argparse type for ``--tome-r``: a constant (``13``), a per-block
    schedule (``23,23,22`` — shorter than depth pads with zeros, i.e. no
    merging in the remaining blocks), or ``toN`` (e.g. ``to128``) — resolved
    against the model geometry into :func:`aligned_schedule` at config
    time."""
    if isinstance(s, int):
        return s
    s = str(s).strip()
    if s.startswith("to") and s[2:].isdigit():
        return s                    # resolved by resolve_artifact_config
    parts = [p.strip() for p in s.split(",") if p.strip()]
    if len(parts) == 1:
        return int(parts[0])
    return tuple(int(p) for p in parts)


def aligned_schedule(cfg: ViTConfig, target_tokens: int = 128) -> tuple:
    """A lane-aligned merge schedule: reach ``target_tokens`` TOTAL tokens
    in the fewest leading blocks such that no block merges more than a
    third of its remaining patches (an even split — merging is gentlest
    when spread, and bipartite matching needs ``r_l <= patches_l // 2``
    anyway). After the target every block runs lane-exact attention tiles
    when it is a multiple of 128.

    Chip-measured (v5e-1, round 3): ViT-B/16 @224 b256 ``to128`` =
    (35, 34) -> 5509 img/s and ViT-L/16 @384 b32 explicit (65, 64 x6)
    -> 1017 img/s, vs 3878 / 375 full-token — both faster AND gentler on
    accuracy than the paper's constant-r operating points (128 final
    tokens retained vs 41 / 25)."""
    total = cfg.seq_len
    patches = cfg.num_patches
    if target_tokens >= total:
        raise ValueError(f"target_tokens={target_tokens} >= the model's "
                         f"{total} tokens — nothing to merge")
    floor = total - patches  # prefix + registers can never merge
    if target_tokens <= floor:
        raise ValueError(f"target_tokens={target_tokens} <= the "
                         f"{floor} protected (non-patch) tokens")
    needed = total - target_tokens
    for k in range(1, cfg.depth + 1):
        base, extra = divmod(needed, k)
        sched = tuple(base + (1 if l < extra else 0) for l in range(k))
        p = patches
        if all(r <= p // 3 and not (p := p - r) < 0 for r in sched):
            return sched
    raise ValueError(f"cannot reach target_tokens={target_tokens} within "
                     f"depth={cfg.depth} at <=1/3 of the patches per block")


def _use_fused_tome_attn(cfg: ViTConfig) -> bool:
    """Mirror of ``vitx.nn.vit._use_fused_mha`` for the ToMe block: the ToMe
    kernel variant handles QKV bias in-kernel, so (unlike the plain fused
    block) bqkv does not force the composed path."""
    if cfg.parity == "bug_exact" or cfg.fuse_mha == "off":
        return False
    if cfg.fuse_mha == "on":
        return True
    return (cfg.attn_impl in ("auto", "flash")
            and jax.default_backend() == "tpu")


def merge_tokens(x, sizes, metric, r: int, n_prefix: int, n_reg: int,
                 sources=None):
    """One bipartite-soft-matching merge step (paper Alg. 1), static shapes.

    Args:
      x:      (B, T, E) tokens, ordered [prefix | patches | registers].
      sizes:  (B, T) how many original tokens each current token stands for.
      metric: (B, T, D) similarity metric (head-mean attention keys).
      r:      tokens to remove (static).
      n_prefix / n_reg: protected token counts at the front / tail.
      sources: optional (B, T, N0) 0/1 map of which ORIGINAL tokens each
        current token contains (the paper's source tracking, used for
        visualization); merged rows are summed, so it stays a partition.

    Returns (x', sizes') with T' = T - r, same ordering invariant —
    or (x', sizes', sources') when sources is given.
    """
    B, T, E = x.shape
    npatch = T - n_prefix - n_reg
    if not (0 < r <= npatch // 2):
        raise ValueError(f"tome r={r} needs 0 < r <= {npatch // 2} "
                         f"(half the {npatch} patch tokens)")
    p = slice(n_prefix, n_prefix + npatch)
    xp, sp, mp = x[:, p], sizes[:, p], metric[:, p]

    # alternate split of the patch region: A = even, B = odd local index
    ma, mb = mp[:, 0::2], mp[:, 1::2]
    xa, xb = xp[:, 0::2], xp[:, 1::2]
    sa, sb = sp[:, 0::2], sp[:, 1::2]
    na, nb = ma.shape[1], mb.shape[1]

    # cosine similarity of every A token to every B token
    ma = ma / jnp.maximum(jnp.linalg.norm(ma, axis=-1, keepdims=True), 1e-6)
    mbn = mb / jnp.maximum(jnp.linalg.norm(mb, axis=-1, keepdims=True), 1e-6)
    scores = jnp.einsum("bad,bcd->bac", ma, mbn,
                        preferred_element_type=jnp.float32)  # (B, na, nb)
    best = jnp.max(scores, axis=-1)                          # (B, na)
    dst = jnp.argmax(scores, axis=-1)                        # (B, na)

    # the r most-similar A tokens merge into their best B match
    _, sel = jax.lax.top_k(best, r)                          # (B, r)
    merged = jnp.zeros((B, na), bool).at[
        jnp.arange(B)[:, None], sel].set(True)

    dst_sel = jnp.take_along_axis(dst, sel, axis=1)          # (B, r)
    xa_sel = jnp.take_along_axis(xa, sel[..., None], axis=1)  # (B, r, E)
    sa_sel = jnp.take_along_axis(sa, sel, axis=1)            # (B, r)

    # size-weighted scatter-add into B, as one-hot matmuls (MXU-friendly,
    # and duplicate destinations accumulate correctly)
    onehot = jax.nn.one_hot(dst_sel, nb, dtype=jnp.float32)  # (B, r, nb)
    add_x = jnp.einsum("brn,bre->bne", onehot,
                       xa_sel.astype(jnp.float32) * sa_sel[..., None])
    add_s = jnp.einsum("brn,br->bn", onehot, sa_sel.astype(jnp.float32))
    sb_new = sb + add_s
    xb_new = ((xb.astype(jnp.float32) * sb[..., None] + add_x)
              / sb_new[..., None]).astype(x.dtype)

    # surviving A tokens, original order (stable sort: unmerged first)
    order = jnp.argsort(merged, axis=1, stable=True)[:, : na - r]
    xa_keep = jnp.take_along_axis(xa, order[..., None], axis=1)
    sa_keep = jnp.take_along_axis(sa, order, axis=1)

    x_out = jnp.concatenate(
        [x[:, :n_prefix], xa_keep, xb_new, x[:, T - n_reg:]], axis=1) \
        if n_reg else jnp.concatenate(
            [x[:, :n_prefix], xa_keep, xb_new], axis=1)
    s_out = jnp.concatenate(
        [sizes[:, :n_prefix], sa_keep, sb_new, sizes[:, T - n_reg:]],
        axis=1) if n_reg else jnp.concatenate(
            [sizes[:, :n_prefix], sa_keep, sb_new], axis=1)
    if sources is None:
        return x_out, s_out

    # source map follows the same routing with SUM semantics (like sizes,
    # but per-original-token columns)
    srcp = sources[:, p]
    srca, srcb = srcp[:, 0::2], srcp[:, 1::2]
    srca_sel = jnp.take_along_axis(srca, sel[..., None], axis=1)
    srcb_new = srcb + jnp.einsum("brn,brk->bnk", onehot,
                                 srca_sel.astype(jnp.float32)).astype(
                                     sources.dtype)
    srca_keep = jnp.take_along_axis(srca, order[..., None], axis=1)
    src_out = jnp.concatenate(
        [sources[:, :n_prefix], srca_keep, srcb_new,
         sources[:, T - n_reg:]], axis=1) \
        if n_reg else jnp.concatenate(
            [sources[:, :n_prefix], srca_keep, srcb_new], axis=1)
    return x_out, s_out, src_out


def encode_tome(params: Params, images, cfg: ViTConfig,
                return_sources: bool = False, *, rng=None,
                deterministic: bool = True):
    """ToMe encoder: unrolled blocks, ``cfg.tome_schedule[l]`` patch tokens
    merged after block ``l``'s attention (a constant ``tome_r`` or an
    explicit per-block schedule). Returns final tokens (B, T', E) with the
    [prefix | merged patches | registers] layout preserved.

    Training mode (``cfg.tome_train``; Bolya et al. 2023 §4): called with
    ``rng``/``deterministic=False`` it applies the same stochastic pieces
    as the full-token encoder — embedding dropout, per-branch dropout and
    the linearly-scheduled stochastic depth — so gradients flow through
    the merged token set (the pair matching is non-differentiable routing;
    the size-weighted averages carry the gradients, like pooling).

    With ``return_sources`` also returns a (B, T', T0) 0/1 partition map of
    which original tokens each final token contains (the paper's source
    tracking; see ``tome_patch_assignment`` for the visualization form)."""
    from vitx.nn.layers import drop_path, dropout, mlp
    from vitx.nn.vit import (_append_registers, _join_cls, add_pos_embed,
                             patch_embed)

    cdt = cfg.cdtype()
    tokens = patch_embed(params, images, cfg)
    B = tokens.shape[0]
    x = _join_cls(params, tokens, cfg, B)
    x = add_pos_embed(params, x, cfg)   # rope is validated out (config.py)
    x = _append_registers(params, x, cfg, B)
    block_rngs = None
    if rng is not None:
        rng, r_emb = jax.random.split(rng)
        x = dropout(x, cfg.dropout, r_emb, deterministic=deterministic)
        block_rngs = jax.random.split(rng, cfg.depth)
    dp_rates = (jnp.linspace(0.0, cfg.drop_path, cfg.depth)
                if cfg.drop_path else None)

    from vitx.nn.vit import _use_fused_mlp

    use_fused_mlp = _use_fused_mlp(cfg)
    use_fused_attn = _use_fused_tome_attn(cfg)
    sizes = jnp.ones((B, x.shape[1]), jnp.float32)
    sources = (jnp.broadcast_to(jnp.eye(x.shape[1], dtype=jnp.float32),
                                (B, x.shape[1], x.shape[1]))
               if return_sources else None)
    blocks = params["blocks"]
    sched = cfg.tome_schedule
    n_pre, n_reg = cfg.num_prefix_tokens, cfg.num_registers

    for l in range(cfg.depth):
        r = sched[l]
        bp = jax.tree.map(lambda a: a[l], blocks)
        if cfg.lora_rank:
            from vitx.nn.lora import merge_block

            bp = merge_block(bp, cfg)
        # one Pallas call for LN -> QKV(+bias) -> proportional attention ->
        # out-proj, emitting the head-mean merge metric in-kernel (the
        # composed path was bench_6's 3082-vs-3879 gap, ROADMAP round 3);
        # per-block static T keeps one kernel variant per block of the
        # unrolled loop. Composed = the same math via _composed_tome (also
        # the kernel's shape fallback and VJP reference).
        from vitx.kernels.mha_block import (_composed_tome,
                                            fused_mha_block_tome)

        bq = (bp["bqkv"].astype(jnp.float32)
              if bp.get("bqkv") is not None
              else jnp.zeros((3, cfg.num_heads, cfg.head_dim), jnp.float32))
        bo = (bp["bo"].astype(jnp.float32)
              if bp.get("bo") is not None
              else jnp.zeros((cfg.embed_dim,), jnp.float32))
        attn_fn = fused_mha_block_tome if use_fused_attn else _composed_tome
        attn_out, k_mean = attn_fn(
            x, bp["wqkv"].astype(x.dtype), bq, bp["wo"].astype(x.dtype), bo,
            bp["ln1_scale"].astype(jnp.float32),
            bp["ln1_bias"].astype(jnp.float32),
            jnp.log(sizes), eps=cfg.layer_norm_eps)
        r_attn = r_mlp = r_dp1 = r_dp2 = None
        if block_rngs is not None:
            if cfg.drop_path:
                r_attn, r_mlp, r_dp1, r_dp2 = jax.random.split(
                    block_rngs[l], 4)
            else:
                r_attn, r_mlp = jax.random.split(block_rngs[l])
        if "ls1" in bp:
            attn_out = attn_out * bp["ls1"].astype(attn_out.dtype)
        if r_attn is not None:
            attn_out = dropout(attn_out, cfg.dropout, r_attn,
                               deterministic=deterministic)
            if cfg.drop_path:
                attn_out = drop_path(attn_out, dp_rates[l], r_dp1,
                                     deterministic=deterministic)
        x = x + attn_out
        if r and sources is not None:
            x, sizes, sources = merge_tokens(x, sizes, k_mean, r, n_pre,
                                             n_reg, sources=sources)
        elif r:
            x, sizes = merge_tokens(x, sizes, k_mean, r, n_pre, n_reg)
        if use_fused_mlp:
            # the fused LN->Linear->act->Linear kernel takes any static T
            # and auto-falls back below T=128 — exactly ToMe's shrinking
            # per-block shapes (chip-measured: bench_6 2656 -> see ROADMAP)
            from vitx.kernels.mlp_block import fused_mlp_block

            mlp_out = fused_mlp_block(
                x, bp["w1"].astype(x.dtype), bp["b1"].astype(jnp.float32),
                bp["w2"].astype(x.dtype), bp["b2"].astype(jnp.float32),
                bp["ln2_scale"].astype(jnp.float32),
                bp["ln2_bias"].astype(jnp.float32),
                act=cfg.mlp_act, eps=cfg.layer_norm_eps)
        else:
            h = layer_norm(x, bp["ln2_scale"], bp["ln2_bias"],
                           eps=cfg.layer_norm_eps)
            mlp_out = mlp(h, bp["w1"], bp["b1"], bp["w2"], bp["b2"],
                          act=cfg.mlp_act, w3=bp.get("w3"), b3=bp.get("b3"))
        if "ls2" in bp:
            mlp_out = mlp_out * bp["ls2"].astype(mlp_out.dtype)
        if r_mlp is not None:
            mlp_out = dropout(mlp_out, cfg.dropout, r_mlp,
                              deterministic=deterministic)
            if cfg.drop_path:
                mlp_out = drop_path(mlp_out, dp_rates[l], r_dp2,
                                    deterministic=deterministic)
        x = x + mlp_out

    if cfg.final_norm:
        fn = params["final_norm"]
        x = layer_norm(x, fn["scale"], fn["bias"], eps=cfg.layer_norm_eps)
    return (x, sources) if return_sources else x


def tome_patch_assignment(sources, cfg: ViTConfig):
    """Visualization helper: collapse a source map from ``encode_tome(...,
    return_sources=True)`` to a (B, grid, grid) int map — for every original
    patch position, the index of the final merged token that absorbed it
    (same-integer cells merged together; plot with a categorical cmap)."""
    n_pre = cfg.num_prefix_tokens
    npatch = cfg.num_patches
    patch_cols = sources[:, :, n_pre:n_pre + npatch]   # (B, T', npatch)
    owner = jnp.argmax(patch_cols, axis=1)             # (B, npatch)
    g = cfg.image_size // cfg.patch_size
    return owner.reshape(-1, g, g)
