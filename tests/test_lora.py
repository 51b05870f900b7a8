"""LoRA parameter-efficient fine-tuning (vitx/nn/lora.py + the freeze
machinery in vitx/train/step.py).

Beyond-reference capability (the reference trains from scratch only,
/root/reference/src/train.py:123-183); these tests pin the three defining
LoRA properties — identity at init, exact foldability, frozen base — plus
the optimizer-memory masking and the CLI/checkpoint/mesh integrations.
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitx.core.config import get_config
from vitx.nn.lora import has_lora, merge_lora_params
from vitx.nn.vit import forward, init_params


def _cfg(**kw):
    return get_config("tiny").replace(lora_rank=4, **kw)


def _strip_lora(params):
    out = dict(params)
    out["blocks"] = {k: v for k, v in params["blocks"].items()
                     if not k.startswith("lora_")}
    return out


def _images(key, n=2):
    return jax.random.normal(key, (n, 64, 64, 3), jnp.float32)


def _randomize_b(params, std=0.02):
    """Give the zero-initialized B factors real values so the adapters
    contribute (training would do this; tests shortcut it)."""
    bl = dict(params["blocks"])
    for i, k in enumerate(sorted(bl)):
        if k.startswith("lora_") and k.endswith("_b"):
            bl[k] = std * jax.random.normal(jax.random.PRNGKey(100 + i),
                                            bl[k].shape, bl[k].dtype)
    return dict(params, blocks=bl)


def test_lora_init_is_identity():
    """B = 0 at init (the paper's init): the adapted forward is BIT-EXACT
    the base forward — fine-tuning starts from the pretrained model."""
    cfg = _cfg(lora_targets="all")
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert has_lora(params)
    x = _images(jax.random.PRNGKey(1))
    got = forward(params, x, cfg)
    want = forward(_strip_lora(params), x, cfg.replace(lora_rank=0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_merged_params_match_runtime_merge():
    """merge_lora_params folds A@B into the dense weights exactly: the
    plain-config forward on merged params equals the runtime-merged
    adapted forward (same einsum, parameter-level vs in-scan)."""
    cfg = _cfg(lora_targets="all", lora_alpha=8.0)
    params = _randomize_b(init_params(jax.random.PRNGKey(0), cfg))
    x = _images(jax.random.PRNGKey(1))
    runtime = forward(params, x, cfg)
    merged, mcfg = merge_lora_params(params, cfg)
    assert not has_lora(merged) and mcfg.lora_rank == 0
    np.testing.assert_allclose(np.asarray(forward(merged, x, mcfg)),
                               np.asarray(runtime), atol=1e-5, rtol=1e-5)
    # and the adapters genuinely change the function
    base = forward(_strip_lora(params), x, cfg.replace(lora_rank=0))
    assert float(jnp.max(jnp.abs(runtime - base))) > 1e-4


def test_train_step_freezes_base_and_masks_optimizer():
    """train_filter="lora": after 3 steps every backbone leaf is
    bit-identical, the adapters + head moved, and the masked optimizer
    allocates NO moments for frozen leaves."""
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    cfg = _cfg()
    opt = make_optimizer(lr=1e-2, trainable="lora")
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    n_full = len(jax.tree.leaves(create_train_state(
        jax.random.PRNGKey(0), cfg, make_optimizer(lr=1e-2)).opt_state))
    assert len(jax.tree.leaves(state.opt_state)) < n_full

    step = make_train_step(cfg, opt, train_filter="lora")
    batch = {"image": _images(jax.random.PRNGKey(1), 8),
             "label": jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 4)}
    before = jax.device_get(state.params)
    for _ in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.device_get(state.params)

    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree.leaves(after)
    moved = 0
    for (kp, b), a in zip(flat_b, flat_a):
        key = "/".join(str(k.key) for k in kp)
        trainable = key.startswith("head/") or "/lora_" in key
        if trainable:
            moved += int(not np.array_equal(b, a))
        else:
            np.testing.assert_array_equal(
                b, a, err_msg=f"frozen leaf {key} changed")
    assert moved >= 9  # 4 adapter pairs + >=1 head leaf


def test_freeze_backbone_trains_head_only():
    """train_filter="head" (the --freeze-backbone path): only the
    classifier head moves — linear-probe-style fine-tuning."""
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    cfg = get_config("tiny")
    opt = make_optimizer(lr=1e-2, trainable="head")
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt, train_filter="head")
    batch = {"image": _images(jax.random.PRNGKey(1), 8),
             "label": jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 4)}
    before = jax.device_get(state.params)
    state, _ = step(state, batch, jax.random.PRNGKey(3))
    after = jax.device_get(state.params)
    for (kp, b), a in zip(jax.tree_util.tree_flatten_with_path(before)[0],
                          jax.tree.leaves(after)):
        key = "/".join(str(k.key) for k in kp)
        if key.startswith("head/"):
            assert not np.array_equal(b, a), f"head leaf {key} frozen"
        else:
            np.testing.assert_array_equal(
                b, a, err_msg=f"non-head leaf {key} changed")


def test_trainer_checkpoint_roundtrip_records_filter(tmp_path):
    """A LoRA Trainer run writes train_filter into the checkpoint meta and
    restore_eval_params rebuilds the masked-optimizer template (positional
    npz restore would shift every leaf otherwise)."""
    from vitx.data.synthetic import SyntheticDataset
    from vitx.data import BatchLoader
    from vitx.train.checkpoint import peek_meta, restore_eval_params
    from vitx.train.loop import Trainer, TrainerConfig

    cfg = _cfg()
    tcfg = TrainerConfig(epochs=1, lr=1e-3, checkpoint_dir=str(tmp_path),
                         log_every=4, seed=0)
    ds = SyntheticDataset(num_examples=16, image_size=64, num_classes=4)
    trainer = Trainer(cfg, tcfg)
    assert trainer.tcfg.train_filter == "lora"   # auto from cfg.lora_rank
    trainer.fit(BatchLoader(ds, 8), BatchLoader(ds, 8))

    meta = peek_meta(tmp_path)
    assert meta["train_filter"] == "lora"
    saved_cfg = get_config("tiny").__class__(**meta["config"])
    params, meta2 = restore_eval_params(tmp_path, saved_cfg)
    assert has_lora(params)
    logits = forward(params, _images(jax.random.PRNGKey(1)), saved_cfg)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_cli_lora_e2e(tmp_path, capsys):
    """`train --lora-rank 2` end-to-end, then the eval CLI consumes the
    self-describing checkpoint (cfg.lora_rank travels in the meta)."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    ckpt = tmp_path / "ckpt"
    rc = train_main(["--preset", "tiny", "--data", "synthetic",
                     "--epochs", "1", "--batch-size", "8",
                     "--lora-rank", "2", "--lora-targets", "all",
                     "--checkpoint-dir", str(ckpt), "--log-every", "4"])
    assert rc == 0
    capsys.readouterr()
    rc = eval_main(["--checkpoint", str(ckpt), "--data", "synthetic",
                    "--batch-size", "8"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= report["accuracy"] <= 1.0


def test_cli_freeze_backbone_conflicts_with_lora(capsys):
    from vitx.cli.train import main as train_main

    rc = train_main(["--preset", "tiny", "--data", "synthetic",
                     "--epochs", "1", "--lora-rank", "2",
                     "--freeze-backbone"])
    assert rc == 1
    assert "conflicts" in capsys.readouterr().err


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_lora_dp_mesh_matches_single_device():
    """Data-parallel LoRA: 2 steps on a dp=8 mesh reproduce the
    single-device trajectory (adapters replicated, grads psummed)."""
    from vitx.parallel import make_mesh
    from vitx.parallel.sharded import (make_parallel_train_step, place_state,
                                       shard_batch, state_sharding)
    from vitx.train.step import (create_train_state, make_optimizer,
                                 make_train_step)

    cfg = _cfg(compute_dtype="float32")
    opt = make_optimizer(lr=1e-2, trainable="lora")
    batch = {"image": _images(jax.random.PRNGKey(1), 16),
             "label": jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 4)}

    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    ref_step = make_train_step(cfg, opt, train_filter="lora")
    for _ in range(2):
        ref_state, ref_m = ref_step(ref_state, batch, jax.random.PRNGKey(3))

    mesh = make_mesh(dp=8)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    state = place_state(state, cfg, mesh)
    shardings = state_sharding(state, cfg, mesh)
    step = make_parallel_train_step(cfg, opt, mesh,
                                    state_shardings=shardings,
                                    train_filter="lora")
    sbatch = shard_batch(batch, mesh)
    for _ in range(2):
        state, m = step(state, sbatch, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(ref_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
