"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4:
"distributed-without-a-cluster"). Verifies that data-parallel and
tensor-parallel sharded training matches single-device training exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vitx import ViTConfig
from vitx.parallel import (
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    shard_batch,
)
from vitx.parallel.sharded import place_state
from vitx.train import create_train_state, make_eval_step, make_train_step
from vitx.train.step import make_optimizer

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=4, compute_dtype="float32")

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _batch(seed, n=16):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {"image": jax.random.normal(k1, (n, 16, 16, 3)),
            "label": jax.random.randint(k2, (n,), 0, 4)}


def _single_device_losses(n_steps=3):
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    losses = []
    for i in range(n_steps):
        state, m = step(state, _batch(i), None)
        losses.append(float(m["loss"]))
    return losses, state


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_parallel_matches_single_device(dp, tp):
    ref_losses, ref_state = _single_device_losses()

    mesh = make_mesh(dp=dp, tp=tp)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    state = place_state(state, CFG, mesh, tp=tp > 1)
    step = make_parallel_train_step(CFG, opt, mesh, tp=tp > 1)
    losses = []
    for i in range(3):
        batch = shard_batch(_batch(i), mesh)
        state, m = step(state, batch, None)
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
    # final params identical to the single-device run
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(ref_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_tp_params_actually_sharded():
    mesh = make_mesh(dp=4, tp=2)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    state = place_state(state, CFG, mesh, tp=True)
    wqkv = state.params["blocks"]["wqkv"]
    # head axis split across 2 model shards
    assert wqkv.sharding.spec == P(None, None, None, "model", None)
    shard_shapes = {s.data.shape for s in wqkv.addressable_shards}
    L, E, _, H, D = wqkv.shape
    assert shard_shapes == {(L, E, 3, H // 2, D)}
    # adam moments follow the param sharding
    mu_wqkv = state.opt_state[0][0].mu["blocks"]["wqkv"]
    assert mu_wqkv.sharding.spec == P(None, None, None, "model", None)


def test_parallel_eval_matches_single_device():
    mesh = make_mesh(dp=8, tp=1)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)

    eval_single = make_eval_step(CFG)
    batch = _batch(42, n=32)
    cm_ref, loss_ref = eval_single(state.params, batch)

    state_p = place_state(state, CFG, mesh)
    eval_par = make_parallel_eval_step(CFG, mesh)
    cm_par, loss_par = eval_par(state_p.params, shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(cm_ref), np.asarray(cm_par))
    np.testing.assert_allclose(float(loss_ref), float(loss_par), rtol=1e-5)


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(dp=16, tp=1)
    mesh = make_mesh()    # defaults: all devices on data axis
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_zero1_moments_sharded_and_training_matches():
    from vitx.parallel.sharded import state_sharding

    ref_losses, _ = _single_device_losses()
    mesh = make_mesh(dp=8, tp=1)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    state = place_state(state, CFG, mesh, zero1=True)
    shardings = state_sharding(state, CFG, mesh, zero1=True)
    step = make_parallel_train_step(CFG, opt, mesh, zero1=True,
                                    state_shardings=shardings)
    losses = []
    for i in range(3):
        state, m = step(state, shard_batch(_batch(i), mesh), None)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
    # a large adam moment is actually sharded over `data`
    mu_w1 = state.opt_state[0][0].mu["blocks"]["w1"]
    assert "data" in jax.tree.leaves(
        [mu_w1.sharding.spec])[0] or any(
        s == "data" for s in mu_w1.sharding.spec if s)
    shard_bytes = mu_w1.addressable_shards[0].data.size
    assert shard_bytes * 8 == mu_w1.size


def test_zero2_grads_reduce_scattered_and_training_matches():
    """ZeRO-2: zero1 moment layout + a data-axis constraint pinned on the
    gradients (train_step grad_shardings) so XLA reduce-scatters them; the
    trajectory must stay exactly single-device-identical."""
    from vitx.parallel.sharded import grad_sharding, state_sharding

    ref_losses, ref_state = _single_device_losses()
    mesh = make_mesh(dp=8, tp=1)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    state = place_state(state, CFG, mesh, zero1=True)
    shardings = state_sharding(state, CFG, mesh, zero1=True)
    gshard = grad_sharding(state.params, CFG, mesh)
    step = make_parallel_train_step(CFG, opt, mesh, zero1=True,
                                    state_shardings=shardings,
                                    grad_shardings=gshard)
    losses = []
    for i in range(3):
        state, m = step(state, shard_batch(_batch(i), mesh), None)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(ref_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # grad sharding spec matches the moment sharding spec leaf-for-leaf,
    # so the optimizer update is purely local elementwise math
    mu = state.opt_state[0][0].mu
    for (path, g_sh) in jax.tree_util.tree_flatten_with_path(gshard)[0]:
        leaf = mu
        for p in path:
            leaf = leaf[p.key]
        assert leaf.sharding.spec == g_sh.spec, path
    # params stay replicated (this is zero2, not zero3)
    assert state.params["blocks"]["w1"].sharding.spec == P(None, None, None)


def test_zero2_trainer_e2e():
    """Trainer(zero2=True) wires grad_sharding through automatically."""
    from vitx.data import BatchLoader, SyntheticDataset
    from vitx.train.loop import Trainer, TrainerConfig

    mesh = make_mesh(dp=8, tp=1)
    ds = SyntheticDataset(num_examples=64, image_size=16, num_classes=4,
                          noise=0.1)
    loader = BatchLoader(ds, batch_size=16, shuffle=True, seed=0)
    tcfg = TrainerConfig(epochs=1, lr=1e-3)
    tr = Trainer(CFG, tcfg, mesh=mesh, zero2=True)
    tr.fit(loader)
    mu_w1 = tr.state.opt_state[0][0].mu["blocks"]["w1"]
    assert any(s == "data" for s in mu_w1.sharding.spec if s)
    assert tr.state.params["blocks"]["w1"].sharding.spec == P(None, None,
                                                              None)


def test_trainer_with_mesh_e2e():
    """Trainer(mesh=...) trains data-parallel end-to-end and evaluates."""
    from vitx.data import BatchLoader, SyntheticDataset
    from vitx.train.loop import Trainer, TrainerConfig

    mesh = make_mesh(dp=8, tp=1)
    ds = SyntheticDataset(num_examples=128, image_size=16, num_classes=4,
                          noise=0.1)
    ds_eval = SyntheticDataset(num_examples=64, image_size=16, num_classes=4,
                               noise=0.1, seed=1)
    from vitx.data.pipeline import make_preprocess

    pre = make_preprocess(out_size=None, mean=(0.5, 0.5, 0.5),
                          std=(0.5, 0.5, 0.5))
    trainer = Trainer(CFG, TrainerConfig(epochs=4, lr=3e-3), mesh=mesh,
                      preprocess=pre)
    history = trainer.fit(
        BatchLoader(ds, 32, shuffle=True, drop_last=True),
        BatchLoader(ds_eval, 32, drop_last=True))
    assert len(history) == 4
    assert history[-1]["epoch_loss_sum"] < history[0]["epoch_loss_sum"]
    assert history[-1]["val_accuracy"] > 0.5
    # state is actually distributed
    w1 = trainer.state.params["blocks"]["w1"]
    assert len(w1.sharding.device_set) == 8


@pytest.mark.parametrize("dp,tp", [(4, 2), (8, 1)])
def test_flash_kernel_under_spmd(dp, tp):
    """attn_impl='flash' (Pallas, interpret on CPU) under a sharded jit:
    the kernel's custom_partitioning rule shards B over `data` and heads
    over `model`, and the dp x tp training trajectory matches the
    single-device flash run exactly (VERDICT r1 item 4)."""
    cfg = CFG.replace(attn_impl="flash")

    opt = make_optimizer(lr=1e-3)
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    ref_step = make_train_step(cfg, opt)
    ref_losses = []
    for i in range(3):
        ref_state, m = ref_step(ref_state, _batch(i), None)
        ref_losses.append(float(m["loss"]))

    mesh = make_mesh(dp=dp, tp=tp)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    state = place_state(state, cfg, mesh, tp=tp > 1)
    step = make_parallel_train_step(cfg, opt, mesh, tp=tp > 1)
    losses = []
    for i in range(3):
        state, m = step(state, shard_batch(_batch(i), mesh), None)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(ref_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_flash_kernel_spmd_eval_probs_path_guard():
    """The sharded eval path with flash impl also runs (fwd kernel under
    SPMD, no probs instrumentation)."""
    cfg = CFG.replace(attn_impl="flash")
    mesh = make_mesh(dp=4, tp=2)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    state_p = place_state(state, cfg, mesh, tp=True)
    eval_par = make_parallel_eval_step(cfg, mesh)
    batch = _batch(7, n=16)
    cm, loss = eval_par(state_p.params, shard_batch(batch, mesh))
    eval_single = make_eval_step(cfg)
    cm_ref, loss_ref = eval_single(state.params, batch)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_ref))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


def test_zero3_params_sharded_and_training_matches():
    """ZeRO-3 / FSDP: parameters AND moments sharded over `data`; the
    training trajectory stays identical to single-device."""
    from vitx.parallel.sharded import state_sharding

    ref_losses, ref_state = _single_device_losses()
    mesh = make_mesh(dp=8, tp=1)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    state = place_state(state, CFG, mesh, zero3=True)
    shardings = state_sharding(state, CFG, mesh, zero3=True)
    step = make_parallel_train_step(CFG, opt, mesh, zero3=True,
                                    state_shardings=shardings)
    losses = []
    for i in range(3):
        state, m = step(state, shard_batch(_batch(i), mesh), None)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)

    # params are actually sharded over data (each device holds 1/8)
    w1 = state.params["blocks"]["w1"]
    assert any(s == "data" for s in w1.sharding.spec if s)
    assert w1.addressable_shards[0].data.size * 8 == w1.size
    # and the final values match single-device training
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(ref_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_zero3_with_tp_composes():
    """zero3 + tensor parallelism: model-axis sharding on heads plus
    data-axis parameter sharding on the remaining dims."""
    mesh = make_mesh(dp=4, tp=2)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    state = place_state(state, CFG, mesh, tp=True, zero3=True)
    step = make_parallel_train_step(CFG, opt, mesh, tp=True, zero3=True)
    state, m = step(state, shard_batch(_batch(0), mesh), None)
    assert np.isfinite(float(m["loss"]))
    wqkv = state.params["blocks"]["wqkv"]
    assert "model" in [s for s in wqkv.sharding.spec if s]


def test_ln_bwd_kernel_under_spmd():
    """The Pallas LN-backward (vitx/kernels/layer_norm.py::ln_bwd, the VJP
    behind nn.layers.layer_norm on TPU) under a batch-sharded jit: its
    custom_partitioning rule shards B over `data`; results must match the
    unsharded call exactly."""
    from vitx.kernels.layer_norm import ln_bwd

    x = jax.random.normal(jax.random.PRNGKey(0), (16, 9, 256), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (256,)) * 0.3 + 1.0
    dy = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)
    ref = ln_bwd(x, s, dy)

    mesh = make_mesh(dp=8, tp=1)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    dys = jax.device_put(dy, NamedSharding(mesh, P("data", None, None)))
    out = jax.jit(lambda x, s, dy: ln_bwd(x, s, dy))(xs, s, dys)
    for a, b, name in zip(out, ref, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_shard_host_batch_single_process_equals_shard_batch():
    """shard_host_batch is the multi-host input path; with one process it
    must reduce exactly to shard_batch (same shardings, same values)."""
    import numpy as np

    from vitx.parallel import make_mesh, shard_batch, shard_host_batch

    mesh = make_mesh(dp=8, tp=1)
    batch = {"image": np.random.default_rng(0)
             .normal(size=(16, 8, 8, 3)).astype(np.float32),
             "label": np.arange(16, dtype=np.int32)}
    a = shard_batch(batch, mesh)
    b = shard_host_batch(batch, mesh)
    for k in batch:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_ema_optimizer_state_shards_cleanly():
    """The EMA shadow (an extra opt_state leaf pytree) survives dp/tp/zero1
    placement and the step keeps the single-device trajectory."""
    import jax
    import numpy as np

    from vitx.core.config import ViTConfig
    from vitx.parallel import make_mesh, make_parallel_train_step, shard_batch
    from vitx.parallel.sharded import place_state, state_sharding
    from vitx.train import create_train_state, make_train_step
    from vitx.train.step import get_ema_params, make_optimizer

    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=4, compute_dtype="float32")
    opt = make_optimizer(lr=1e-3, ema_decay=0.9)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    batch = {"image": jax.random.normal(k1, (16, 16, 16, 3)),
             "label": jax.random.randint(k2, (16,), 0, 4)}
    ref = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    ref, m_ref = make_train_step(cfg, opt)(ref, batch, jax.random.PRNGKey(3))
    ema_ref = get_ema_params(ref.opt_state)

    for mode in ("dp", "tp", "zero1"):
        mesh = make_mesh(dp=4 if mode == "tp" else 8,
                         tp=2 if mode == "tp" else 1)
        st = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        kw = dict(tp=mode == "tp", zero1=mode == "zero1")
        st = place_state(st, cfg, mesh, **kw)
        sh = (state_sharding(st, cfg, mesh, tp=False, zero1=True)
              if mode == "zero1" else None)
        step = make_parallel_train_step(cfg, opt, mesh, state_shardings=sh,
                                        **kw)
        st, m = step(st, shard_batch(batch, mesh), jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                                   rtol=1e-5, err_msg=mode)
        ema = get_ema_params(st.opt_state)
        np.testing.assert_allclose(
            np.asarray(ema["blocks"]["wqkv"]),
            np.asarray(ema_ref["blocks"]["wqkv"]), rtol=1e-4, atol=1e-6,
            err_msg=mode)


def test_tp_safe_cfg_gates_fusion():
    """Mesh-aware kernel gating (VERDICT r2 item 4): under tp>1 the 'auto'
    fusion choices fall back to the composed path (the fused kernels'
    partition rules replicate weights on the model axis); an explicit 'on'
    is honored; tp=False passes the config through untouched."""
    from vitx.parallel.sharded import tp_safe_cfg

    cfg = CFG.replace(fuse_mha="auto", fuse_mlp="auto")
    gated = tp_safe_cfg(cfg, tp=True)
    assert gated.fuse_mha == "off" and gated.fuse_mlp == "off"
    assert tp_safe_cfg(cfg, tp=False) is cfg
    forced = CFG.replace(fuse_mha="on", fuse_mlp="on")
    assert tp_safe_cfg(forced, tp=True) is forced


def test_tp_train_default_config_needs_no_manual_fusion_off():
    """A tp run with the DEFAULT config (fuse_mha='auto') builds + steps
    without any manual fuse override and matches the single-device
    trajectory — the builder gates fusion itself."""
    cfg = CFG.replace(fuse_mha="auto", fuse_mlp="auto")
    opt = make_optimizer(lr=1e-3)
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    ref_step = make_train_step(cfg, opt)
    ref_state, m_ref = ref_step(ref_state, _batch(0), None)

    mesh = make_mesh(dp=4, tp=2)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    state = place_state(state, cfg, mesh, tp=True)
    step = make_parallel_train_step(cfg, opt, mesh, tp=True)
    state, m = step(state, shard_batch(_batch(0), mesh), None)
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)


def test_chunked_probs_kernel_under_spmd():
    """The probs-emitting chunked MHA op (rollout fast path) carries the
    same batch-parallel custom_partitioning rule as every other kernel
    entry point — under a dp mesh both outputs shard over `data` and match
    the unsharded kernel exactly (ADVICE r2)."""
    from vitx.kernels import mha_block as mb

    B, T, E, H = 8, 128, 256, 4
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    x = jax.random.normal(ks[0], (B, T, E), jnp.float32)
    wqkv = jax.random.normal(ks[1], (E, 3, H, E // H), jnp.float32) * 0.05
    wo = jax.random.normal(ks[2], (E, E), jnp.float32) * 0.05
    bo = jax.random.normal(ks[3], (E,), jnp.float32) * 0.05
    g = jax.random.normal(ks[4], (E,)) * 0.2 + 1.0
    b = jax.random.normal(ks[5], (E,)) * 0.1

    ref_out, ref_probs = mb._chunked_fwd(x, wqkv, wo, bo, g, b, eps=1e-5,
                                         mean_probs=True)

    mesh = make_mesh(dp=8, tp=1)
    op = mb._make_chunked_probs_sharded(1e-5)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    out, probs = jax.jit(op)(xs, wqkv, wo, bo, g, b)
    assert "data" in [s for s in out.sharding.spec if s]
    assert "data" in [s for s in probs.sharding.spec if s]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               rtol=2e-5, atol=2e-5)


def test_distill_token_params_place_and_step():
    """distill_token params (dist_token + dist_head) have matching
    PartitionSpecs, place onto a dp mesh, and the dp train step runs."""
    from vitx.parallel.sharded import param_pspecs
    from jax.sharding import PartitionSpec as _P

    cfg = CFG.replace(distill_token=True)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    # spec tree covers the param tree exactly
    specs = param_pspecs(cfg)
    s_struct = jax.tree.structure(
        jax.tree.map(lambda s: 0, specs,
                     is_leaf=lambda x: isinstance(x, _P)))
    p_struct = jax.tree.structure(jax.tree.map(lambda a: 0, state.params))
    assert s_struct == p_struct

    mesh = make_mesh(dp=8, tp=1)
    state = place_state(state, cfg, mesh)
    step = make_parallel_train_step(cfg, opt, mesh)
    batch = shard_batch(_batch(0, n=16), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_sp_requires_tp():
    """sp is a tp-axis feature: requesting it without a model axis is a
    config error (vitx/parallel/sharded.py::sp_cfg)."""
    from vitx.parallel.sharded import sp_cfg

    with pytest.raises(ValueError, match="sp=True requires tp"):
        sp_cfg(CFG, tp=False, sp=True)
    assert sp_cfg(CFG, tp=False, sp=False) is CFG
    assert sp_cfg(CFG, tp=True, sp=True).sp is True


def test_sp_matches_single_device():
    """Megatron sequence parallelism (cfg.sp): the inter-block residual
    carriers are token-sharded over the model axis via
    with_sharding_constraint (vitx/nn/vit.py::run_blocks). Pure layout
    annotation — the tp+sp training trajectory must equal single-device
    exactly, and eval must produce the identical confusion matrix."""
    ref_losses, ref_state = _single_device_losses()

    mesh = make_mesh(dp=4, tp=2)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    state = place_state(state, CFG, mesh, tp=True)
    step = make_parallel_train_step(CFG, opt, mesh, tp=True, sp=True)
    losses = []
    for i in range(3):
        state, m = step(state, shard_batch(_batch(i), mesh), None)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(ref_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    eval_single = make_eval_step(CFG)
    batch = _batch(42, n=32)
    cm_ref, loss_ref = eval_single(ref_state.params, batch)
    eval_sp = make_parallel_eval_step(CFG, mesh, tp=True, sp=True)
    cm_sp, loss_sp = eval_sp(state.params, shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(cm_ref), np.asarray(cm_sp))
    np.testing.assert_allclose(float(loss_ref), float(loss_sp), rtol=1e-4)


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_sharded_checkpoint_resume_trajectory(tmp_path, backend):
    """Checkpoint/resume UNDER A MESH: a ZeRO-3-sharded TrainState saved at
    step 2 and restored onto a fresh mesh placement must continue the exact
    single-device trajectory (save gathers via device_get; restore re-shards
    via place_state — the single-process form of the multi-host recipe)."""
    pytest.importorskip("orbax.checkpoint") if backend == "orbax" else None
    from vitx.train.checkpoint import restore_latest, save_checkpoint

    ref_losses, _ = _single_device_losses(n_steps=4)

    mesh = make_mesh(dp=8, tp=1)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    state = place_state(state, CFG, mesh, zero3=True)
    from vitx.parallel.sharded import state_sharding

    shardings = state_sharding(state, CFG, mesh, zero3=True)
    step = make_parallel_train_step(CFG, opt, mesh, zero3=True,
                                    state_shardings=shardings)
    losses = []
    for i in range(2):
        state, m = step(state, shard_batch(_batch(i), mesh), None)
        losses.append(float(m["loss"]))
    save_checkpoint(tmp_path, state, epoch=0, backend=backend)

    # fresh process simulation: template from init, restore, re-place
    template = create_train_state(jax.random.PRNGKey(7), CFG, opt)
    restored, meta = restore_latest(tmp_path, template)
    assert meta["epoch"] == 0
    restored = place_state(restored, CFG, mesh, zero3=True)
    step2 = make_parallel_train_step(CFG, opt, mesh, zero3=True,
                                     state_shardings=shardings)
    for i in range(2, 4):
        restored, m = step2(restored, shard_batch(_batch(i), mesh), None)
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
