"""Golden seed-69 cross-implementation test.

The reference's only test (``tests/multihead-attention-test.ipynb``) validates
its C attention (``csrc/vit.c``, srand(69)) against a corrected torch oracle.
We keep that idea: the C-derived embeddings + QKV weights (fixture JSON) run
through (a) an independent torch oracle computed here and (b) the vitx
attention path — the two must agree to <= 1e-4 (BASELINE.md metric).
"""

import json
import pathlib

import jax.numpy as jnp
import numpy as np
import torch

from vitx.nn.attention import reference_attention

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "golden_seed69.json"


def _load():
    d = json.loads(FIXTURE.read_text())
    emb = np.array(d["cls_patch_embeddings"], np.float32)        # (5, 4)
    qkv = np.array(d["qkv_weights_flat"], np.float32).reshape(2, 2, 4, 6)
    return emb, qkv


def _torch_oracle(q, k, v):
    """Scaled dot-product attention, the validation notebook's corrected
    semantics (QK^T / sqrt(d_k) -> softmax -> @V)."""
    d_k = q.shape[-1]
    scores = torch.matmul(q, k.transpose(-2, -1)) / (d_k ** 0.5)
    return torch.matmul(torch.softmax(scores, dim=-1), v)


def test_golden_seed69_attention():
    emb, qkv = _load()
    wq, wk, wv = qkv[..., 0:2], qkv[..., 2:4], qkv[..., 4:6]

    # project: (blocks, heads, tokens=5, head_size=2)
    q = np.einsum("td,bhds->bhts", emb, wq)
    k = np.einsum("td,bhds->bhts", emb, wk)
    v = np.einsum("td,bhds->bhts", emb, wv)

    with torch.no_grad():
        expected = _torch_oracle(torch.from_numpy(q), torch.from_numpy(k),
                                 torch.from_numpy(v)).numpy()

    # vitx path: treat blocks as the batch axis -> (B=2, H=2, T=5, D=2)
    out, probs = reference_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), return_probs=True)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-6)

    rows = np.asarray(jnp.sum(probs, axis=-1))
    np.testing.assert_allclose(rows, np.ones_like(rows), rtol=1e-5)


def test_golden_softmax_stability():
    """The C softmax has no max subtraction (vit.c:215-229) and overflows on
    large logits; ours must not."""
    big = jnp.asarray(np.array([[2000.0, 1000.0, 0.0]], np.float32))
    q = big.reshape(1, 1, 1, 3)
    k = jnp.eye(3, dtype=jnp.float32).reshape(1, 1, 3, 3)
    v = jnp.ones((1, 1, 3, 3), jnp.float32)
    out, probs = reference_attention(q, k, v, return_probs=True)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.isfinite(np.asarray(probs)))
