"""int8-runtime inference (vitx/nn/int8_infer.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vitx.core.config import ViTConfig
from vitx.nn.int8_infer import (
    encode_int8,
    forward_int8,
    quantize_for_runtime,
)
from vitx.nn.vit import forward, init_params

CFG = ViTConfig(image_size=32, patch_size=4, num_classes=4, embed_dim=32,
                depth=3, num_heads=2, compute_dtype="float32")


def test_runtime_tree_is_int8_resident():
    params = init_params(jax.random.PRNGKey(0), CFG)
    rt = quantize_for_runtime(params, CFG)
    L, E = CFG.depth, CFG.embed_dim
    for name, n_out in (("wqkv", 3 * E), ("wo", E), ("w1", 4 * E),
                        ("w2", E)):
        leaf = rt["blocks"][name]
        assert leaf["q"].dtype == jnp.int8
        assert leaf["q"].shape[0] == L and leaf["q"].shape[-1] == n_out
        assert leaf["s"].shape == (L, 1, n_out)
    # float leaves pass through untouched
    np.testing.assert_array_equal(np.asarray(rt["blocks"]["ln1_scale"]),
                                  np.asarray(params["blocks"]["ln1_scale"]))
    np.testing.assert_array_equal(np.asarray(rt["pos_embed"]),
                                  np.asarray(params["pos_embed"]))
    # resident encoder matmul bytes drop 4x vs fp32 (modulo tiny scales)
    fp32 = sum(np.asarray(params["blocks"][n]).nbytes
               for n in ("wqkv", "wo", "w1", "w2"))
    int8 = sum(int(rt["blocks"][n]["q"].size)
               + 4 * int(rt["blocks"][n]["s"].size)
               for n in ("wqkv", "wo", "w1", "w2"))
    assert int8 < 0.3 * fp32


def test_forward_int8_tracks_float_forward():
    """On an overfit model the int8 runtime keeps argmax and stays within
    the weight-only-int8 logit regime."""
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    opt = make_optimizer(lr=3e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (8, 32, 32, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 4)}
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss"]) < 0.1

    rt = quantize_for_runtime(state.params, CFG)
    full = np.asarray(forward(state.params, batch["image"], CFG))
    got = np.asarray(jax.jit(
        lambda r, x: forward_int8(r, x, CFG))(rt, batch["image"]))
    np.testing.assert_array_equal(got.argmax(-1), full.argmax(-1))
    rel = np.abs(got - full).max() / np.abs(full).max()
    assert rel < 0.06, rel


def test_forward_int8_with_distill_and_registers():
    cfg = CFG.replace(distill_token=True, num_registers=2)
    params = init_params(jax.random.PRNGKey(1), cfg)
    rt = quantize_for_runtime(params, cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    toks = encode_int8(rt, x, cfg)
    assert toks.shape == (2, cfg.seq_len, cfg.embed_dim)
    logits = forward_int8(rt, x, cfg)
    assert logits.shape == (2, 4) and np.isfinite(np.asarray(logits)).all()
    # structural closeness to the float forward even at random init
    ref = np.asarray(forward(params, x, cfg))
    assert np.abs(np.asarray(logits) - ref).max() / np.abs(ref).max() < 0.1


def test_server_int8_runtime_matches_float_argmax():
    from vitx.serve import InferenceServer

    params = init_params(jax.random.PRNGKey(0), CFG)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (32, 32, 3)))
    with InferenceServer(params, CFG, batch_size=4) as plain, \
            InferenceServer(params, CFG, batch_size=4,
                            int8_runtime=True) as quant:
        a, b = plain.predict(x), quant.predict(x)
    assert a["classes"][0] == b["classes"][0]
    assert abs(a["probs"][0] - b["probs"][0]) < 0.05


def test_forward_int8_dp_mesh_matches_single_device():
    """int8 forward under a dp mesh: the quant kernel's row-parallel rule
    shards the flattened token rows; logits must match single-device."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    params = init_params(jax.random.PRNGKey(0), CFG)
    rt = quantize_for_runtime(params, CFG)
    x = jax.random.normal(jax.random.PRNGKey(6), (16, 32, 32, 3))
    want = np.asarray(forward_int8(rt, x, CFG))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    rt_p = jax.device_put(rt, NamedSharding(mesh, P()))
    x_p = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    got = np.asarray(jax.jit(
        lambda r, xx: forward_int8(r, xx, CFG))(rt_p, x_p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_int8_runtime_rejects_bug_exact_and_tome():
    import pytest

    params = init_params(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="bug_exact"):
        quantize_for_runtime(params, CFG.replace(parity="bug_exact"))
    with pytest.raises(ValueError, match="tome"):
        quantize_for_runtime(params, CFG.replace(tome_r=4))
