"""Checkpoint save / resume-from-latest / reference .pt interop round trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitx import ViTConfig, forward
from vitx.train import create_train_state, make_train_step
from vitx.train.checkpoint import (
    find_latest,
    list_checkpoints,
    load_reference_pt,
    restore_latest,
    save_checkpoint,
    save_reference_pt,
)
from vitx.train.step import make_optimizer

CFG = ViTConfig(image_size=32, patch_size=8, num_classes=4, embed_dim=16,
                depth=2, num_heads=2, compute_dtype="float32",
                mlp_act="relu")


def _state_and_step():
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    return state, make_train_step(CFG, opt), opt


def _batch(seed=0, n=4):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {"image": jax.random.normal(k1, (n, 32, 32, 3)),
            "label": jax.random.randint(k2, (n,), 0, 4)}


def test_save_restore_roundtrip(tmp_path):
    state, step, opt = _state_and_step()
    state, _ = step(state, _batch(), jax.random.PRNGKey(1))
    save_checkpoint(tmp_path, jax.device_get(state), epoch=3,
                    meta={"loss": 1.25})

    fresh, _, _ = _state_and_step()
    restored, meta = restore_latest(tmp_path, fresh)
    assert meta["epoch"] == 3 and meta["loss"] == 1.25
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state (adam moments) restored too
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_from_max_stem(tmp_path):
    """Discovery = max integer stem (reference train.py:52-58)."""
    state, _, _ = _state_and_step()
    host = jax.device_get(state)
    for epoch in (0, 2, 10, 9):
        save_checkpoint(tmp_path, host, epoch=epoch)
    assert list_checkpoints(tmp_path) == [0, 2, 9, 10]
    assert find_latest(tmp_path) == 10
    _, meta = restore_latest(tmp_path, state)
    assert meta["epoch"] == 10


def test_resume_falls_back_past_corrupt_checkpoint(tmp_path):
    """A torn/garbage newest checkpoint is quarantined (<name>.corrupt) and
    resume falls back to the previous epoch instead of wedging the restart;
    a clean-but-structure-mismatched checkpoint still raises."""
    import pytest

    state, step, _ = _state_and_step()
    host = jax.device_get(state)
    save_checkpoint(tmp_path, host, epoch=4, meta={"loss": 0.5})
    save_checkpoint(tmp_path, host, epoch=5)
    (tmp_path / "5.ckpt").write_bytes(b"not a checkpoint at all")

    fresh, _, _ = _state_and_step()
    with pytest.warns(UserWarning, match="quarantined"):
        restored, meta = restore_latest(tmp_path, fresh)
    assert meta["epoch"] == 4 and meta["loss"] == 0.5
    assert (tmp_path / "5.ckpt.corrupt").exists()
    assert not (tmp_path / "5.ckpt").exists()
    # the quarantined file no longer shadows the good one on the NEXT resume
    assert find_latest(tmp_path) == 4

    # every checkpoint corrupt -> template + None (fresh start)
    (tmp_path / "4.ckpt").write_bytes(b"also garbage")
    with pytest.warns(UserWarning):
        restored2, meta2 = restore_latest(tmp_path, fresh)
    assert meta2 is None and restored2 is fresh

    # structural mismatch is NOT corruption: it must raise, not quarantine
    save_checkpoint(tmp_path, {"only": np.zeros((2,))}, epoch=7)
    with pytest.raises(KeyError):
        restore_latest(tmp_path, fresh)
    assert (tmp_path / "7.ckpt").exists()


def test_eval_restore_skips_corrupt_without_quarantine(tmp_path):
    """peek_meta / restore_eval_params skip unreadable checkpoints and use
    the newest readable one, WITHOUT renaming anything — eval and serving
    must not mutate a training directory a live trainer may own."""
    from vitx.train.checkpoint import peek_meta, restore_eval_params

    state, _, _ = _state_and_step()
    host = jax.device_get(state)
    save_checkpoint(tmp_path, host, epoch=1, meta={"loss": 0.9})
    save_checkpoint(tmp_path, host, epoch=2)
    (tmp_path / "2.ckpt").write_bytes(b"junk")

    with pytest.warns(UserWarning, match="skipping"):
        meta = peek_meta(tmp_path)
    assert meta["epoch"] == 1 and meta["loss"] == 0.9
    with pytest.warns(UserWarning, match="skipping"):
        params, meta2 = restore_eval_params(tmp_path, CFG)
    assert meta2["epoch"] == 1 and params is not None
    assert (tmp_path / "2.ckpt").exists()        # read-only: left in place


def test_restore_empty_dir_returns_template(tmp_path):
    state, _, _ = _state_and_step()
    restored, meta = restore_latest(tmp_path / "nope", state)
    assert meta is None and restored is state


def test_keep_n_checkpoints(tmp_path):
    state, _, _ = _state_and_step()
    host = jax.device_get(state)
    for epoch in range(5):
        save_checkpoint(tmp_path, host, epoch=epoch, keep=2)
    assert list_checkpoints(tmp_path) == [3, 4]


def test_training_continues_identically_after_resume(tmp_path):
    """Resume must reproduce the exact same trajectory (step count, loss)."""
    state, step, _ = _state_and_step()
    rng = jax.random.PRNGKey(7)
    for i in range(3):
        state, _ = step(state, _batch(i), rng)
    save_checkpoint(tmp_path, jax.device_get(state), epoch=0)
    # branch A: continue in-process
    state_a = state
    for i in range(3, 6):
        state_a, ma = step(state_a, _batch(i), rng)
    # branch B: restore and continue
    fresh, step2, _ = _state_and_step()
    state_b, _ = restore_latest(tmp_path, fresh)
    for i in range(3, 6):
        state_b, mb = step2(state_b, _batch(i), rng)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-6)
    assert int(state_a.step) == int(state_b.step) == 6


def test_reference_pt_roundtrip(tmp_path):
    """vitx params -> reference .pt -> vitx params preserves logits."""
    state, _, _ = _state_and_step()
    params = jax.device_get(state.params)
    path = tmp_path / "5.pt"
    save_reference_pt(path, params, CFG, epoch=5, loss=0.5, step=100,
                      batch_size=3)
    loaded, meta = load_reference_pt(path, CFG)
    assert meta == {"epoch": 5, "loss": 0.5, "step": 100}

    batch = _batch(2)
    a = np.asarray(forward(params, batch["image"], CFG))
    b = np.asarray(forward(jax.tree.map(jnp.asarray, loaded),
                           batch["image"], CFG))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_reference_pt_optimizer_state_resumes_reference_code(tmp_path):
    """Exported .pt must round-trip into the ACTUAL reference training code:
    model.load_state_dict + optimizer.load_state_dict (train.py:72-73) succeed
    and the AdamW moments carry over exactly."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference/src")
    try:
        from VisionTransformer import config as ref_config
        from VisionTransformer import vit as ref_vit
    except Exception as e:   # pragma: no cover - reference tree unavailable
        pytest.skip(f"reference package not importable: {e}")
    finally:
        sys.path.pop(0)

    state, step, _ = _state_and_step()
    for i in range(3):
        state, _ = step(state, _batch(i), jax.random.PRNGKey(1))
    host = jax.device_get(state)
    path = tmp_path / "7.pt"
    save_reference_pt(path, host.params, CFG, epoch=7, batch_size=2,
                      opt_state=host.opt_state, lr=1e-4, weight_decay=1e-4)

    rcfg = ref_config.ViTConfig(
        input_channels=3, num_classes=CFG.num_classes,
        num_patches=CFG.num_patches, embedding_size=CFG.embed_dim,
        patch_size=CFG.patch_size, num_heads=CFG.num_heads,
        num_blocks=CFG.depth, device="cpu", batch_size=2, dropout=0.0)
    model = ref_vit.VisionTransformer(rcfg)
    optimizer = torch.optim.AdamW(model.parameters(), lr=1e-4,
                                  weight_decay=1e-4)
    ckpt = torch.load(path, weights_only=False)
    model.load_state_dict(ckpt["model_state_dict"], strict=True)
    optimizer.load_state_dict(ckpt["optimizer_state_dict"])

    # moments map to the right parameters: check cls (index 0 in
    # model.parameters() order) and one per-head value projection
    from vitx.interop.torch_ref import _find_adam_state
    adam = _find_adam_state(host.opt_state)
    params_in_order = list(model.parameters())
    st = optimizer.state[params_in_order[0]]           # cls_tkn_embd
    np.testing.assert_allclose(
        st["exp_avg"].numpy(),
        np.tile(np.asarray(adam.mu["cls_token"], np.float32), (2, 1, 1)),
        rtol=1e-6)
    assert float(st["step"]) == 3.0
    # heads.0 registers key,query,value (transformer.py:12-17) after cls,
    # pos, conv w/b -> value.weight of block 0 head 0 is parameter index 6
    np.testing.assert_allclose(
        optimizer.state[params_in_order[6]]["exp_avg_sq"].numpy(),
        np.asarray(adam.nu["blocks"]["wqkv"][0, :, 2, 0, :], np.float32).T,
        rtol=1e-6)

    # and the reference optimizer can actually take a step
    out = model(torch.randn(2, 3, CFG.image_size, CFG.image_size))
    out.sum().backward()
    optimizer.step()


def test_reference_pt_loads_into_torch_oracle(tmp_path):
    """The exported .pt state dict must load into a reference-shaped torch
    module (strict=True) — proving format fidelity, not just round-trip."""
    import torch

    state, _, _ = _state_and_step()
    params = jax.device_get(state.params)
    path = tmp_path / "1.pt"
    save_reference_pt(path, params, CFG, epoch=1, batch_size=2)
    ckpt = torch.load(path, weights_only=False)
    sd = ckpt["model_state_dict"]
    # spot-check reference key names and shapes (vit.py:52, conv (E,C,P,P))
    assert "emdeddings.sequence.0.weight" in sd
    assert tuple(sd["emdeddings.sequence.0.weight"].shape) == (16, 3, 8, 8)
    assert tuple(sd["emdeddings.cls_tkn_embd"].shape) == (2, 1, 16)
    assert "transformer_encoder.blocks.1.multi_head.heads.1.value.weight" in sd
    assert tuple(sd["mlp.3.weight"].shape) == (4, 64)


def test_orbax_backend_roundtrip(tmp_path):
    """backend='orbax' saves/restores behind the same {epoch} discovery
    convention, interoperable with npz checkpoints in the same directory."""
    state, step, _ = _state_and_step()
    state, _ = step(state, _batch(), jax.random.PRNGKey(1))
    save_checkpoint(tmp_path, jax.device_get(state), epoch=1,
                    meta={"loss": 0.7}, backend="orbax")
    # an older npz checkpoint coexists; discovery picks the newest (orbax)
    save_checkpoint(tmp_path, jax.device_get(state), epoch=0, backend="npz")
    assert list_checkpoints(tmp_path) == [0, 1]
    assert find_latest(tmp_path) == 1

    fresh, _, _ = _state_and_step()
    restored, meta = restore_latest(tmp_path, fresh)
    assert meta["epoch"] == 1 and meta["loss"] == 0.7
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_backend_keep_n(tmp_path):
    state, _, _ = _state_and_step()
    host = jax.device_get(state)
    for epoch in range(4):
        save_checkpoint(tmp_path, host, epoch=epoch, backend="orbax", keep=2)
    assert list_checkpoints(tmp_path) == [2, 3]


def test_checkpoints_are_self_describing(tmp_path, capsys):
    """Trainer stores the exact model config in checkpoint meta; the eval
    CLI rebuilds the trained geometry from it even when it differs from the
    named preset (e.g. a final_norm=True fine-tune from an MAE export)."""
    import json

    from vitx.cli.eval import main as eval_main
    from vitx.core.config import ViTConfig
    from vitx.data import BatchLoader, SyntheticDataset
    from vitx.train.checkpoint import peek_meta
    from vitx.train.loop import Trainer, TrainerConfig

    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, compute_dtype="float32",
                    final_norm=True)
    loader = BatchLoader(SyntheticDataset(num_examples=64, image_size=16,
                                          num_classes=4), 16)
    tcfg = TrainerConfig(epochs=1, lr=1e-3,
                         checkpoint_dir=str(tmp_path / "c"))
    Trainer(cfg, tcfg).fit(loader)

    meta = peek_meta(tmp_path / "c")
    assert ViTConfig.from_json(json.dumps(meta["config"])) == cfg

    capsys.readouterr()
    # preset 'tiny' describes a DIFFERENT geometry — the stored config wins
    rc = eval_main(["--preset", "tiny", "--data", "synthetic",
                    "--checkpoint", str(tmp_path / "c"),
                    "--batch-size", "16"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["accuracy"] <= 1.0


def test_restore_eval_params_prefers_ema_shadow(tmp_path):
    """A checkpoint trained with ema_decay restores the EMA shadow for
    eval/serving — via the recorded meta, and (legacy checkpoints) via the
    npz leaf-count probe when the meta key is absent (ADVICE r2)."""
    import jax.numpy as jnp

    from vitx.core.config import ViTConfig
    from vitx.train import create_train_state, make_train_step
    from vitx.train.checkpoint import restore_eval_params, save_checkpoint
    from vitx.train.step import get_ema_params, make_optimizer

    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, compute_dtype="float32")
    opt = make_optimizer(lr=5e-3, ema_decay=0.5)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, opt)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(1),
                                        (8, 16, 16, 3)),
             "label": jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 4)}
    for _ in range(5):
        state, _ = step(state, batch, None)
    shadow = get_ema_params(state.opt_state)
    live = state.params
    # shadow and live params must differ for the assertion to mean anything
    assert float(jnp.linalg.norm(shadow["head"]["w1"]
                                 - live["head"]["w1"])) > 0

    # (a) modern checkpoint: meta records ema_decay
    save_checkpoint(tmp_path / "a", jax.device_get(state), 0,
                    meta={"ema_decay": 0.5})
    params, meta = restore_eval_params(tmp_path / "a", cfg)
    np.testing.assert_array_equal(np.asarray(params["head"]["w1"]),
                                  np.asarray(shadow["head"]["w1"]))

    # (b) legacy checkpoint: no meta key -> leaf-count probe finds the shadow
    save_checkpoint(tmp_path / "b", jax.device_get(state), 0, meta={})
    params_b, _ = restore_eval_params(tmp_path / "b", cfg)
    np.testing.assert_array_equal(np.asarray(params_b["head"]["w1"]),
                                  np.asarray(shadow["head"]["w1"]))

    # (c) no EMA in the checkpoint: live params come back unchanged
    opt_p = make_optimizer(lr=5e-3)
    state_p = create_train_state(jax.random.PRNGKey(0), cfg, opt_p)
    save_checkpoint(tmp_path / "c", jax.device_get(state_p), 0, meta={})
    params_c, _ = restore_eval_params(tmp_path / "c", cfg)
    np.testing.assert_array_equal(np.asarray(params_c["head"]["w1"]),
                                  np.asarray(state_p.params["head"]["w1"]))


def test_eval_cli_on_reference_pt(tmp_path, capsys):
    """The eval CLI evaluates a reference .pt DIRECTLY (the shared artifact
    loading rule) — report well-formed, epoch read from the .pt meta."""
    import json

    from vitx.cli.eval import main as eval_main

    state, _, _ = _state_and_step()
    params = jax.device_get(state.params)
    path = tmp_path / "3.pt"
    save_reference_pt(path, params, CFG, epoch=3, batch_size=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(CFG.to_json())
    rc = eval_main(["--checkpoint", str(path),
                    "--config-json", str(cfg_path),
                    "--data", "synthetic", "--batch-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epoch"] == 3
    assert out["num_examples"] == 512
    assert 0.0 <= out["accuracy"] <= 1.0


def test_transfer_params_new_head_and_resolution(tmp_path):
    """transfer_params grafts a trained checkpoint into a NEW geometry:
    encoder verbatim, a different-class-count head fresh (warned), a
    doubled resolution's pos_embed bilinearly resized."""
    import warnings

    from vitx.train.checkpoint import transfer_params

    state, step, _ = _state_and_step()
    state, _ = step(state, _batch(0), jax.random.PRNGKey(1))
    save_checkpoint(tmp_path / "c", state, epoch=0,
                    meta={"config": __import__("json").loads(CFG.to_json())})

    target = CFG.replace(num_classes=CFG.num_classes + 3,
                         image_size=CFG.image_size * 2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        params = transfer_params(tmp_path / "c", target,
                                 jax.random.PRNGKey(2))
    msgs = " | ".join(str(x.message) for x in w)
    assert "pos_embed resized" in msgs and "fresh init" in msgs

    np.testing.assert_array_equal(
        np.asarray(params["blocks"]["wqkv"]),
        np.asarray(jax.device_get(state.params)["blocks"]["wqkv"]))
    assert params["pos_embed"].shape == (1, target.pos_len,
                                         target.embed_dim)
    assert params["head"]["w2"].shape[-1] == target.num_classes
    # grafted params run at the new geometry
    imgs = jax.random.normal(jax.random.PRNGKey(3),
                             (2, target.image_size, target.image_size, 3))
    logits = np.asarray(forward(params, imgs, target))
    assert logits.shape == (2, target.num_classes)
    assert np.all(np.isfinite(logits))


def test_cli_transfer_finetune_from_checkpoint(tmp_path, capsys):
    """CLI transfer loop: train -> --init-from CKPT_DIR --image-size 2x
    fine-tunes at the new resolution (pos_embed resized, not fresh)."""
    import json

    from vitx.cli.train import main as train_main
    from vitx.train.checkpoint import peek_meta

    rc = train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--compute-dtype", "float32",
        "--image-size", "32",
        "--checkpoint-dir", str(tmp_path / "a"),
    ])
    assert rc == 0
    capsys.readouterr()
    rc = train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--compute-dtype", "float32",
        "--image-size", "64", "--init-from", str(tmp_path / "a"),
        "--checkpoint-dir", str(tmp_path / "b"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["loss"])
    assert peek_meta(tmp_path / "b")["config"]["image_size"] == 64


def test_transfer_params_guards(tmp_path):
    """transfer_params refuses config-less sources (MAE pretrain dirs)
    instead of silently grafting against the tiny preset; cross-parity
    sources keep pos_embed fresh (row order differs at identical shape);
    a non-params flat npz never silently 'loads'."""
    import warnings

    import pytest

    from vitx.train.checkpoint import load_artifact_params, transfer_params

    # 1. config-less checkpoint dir -> clear error
    state, _, _ = _state_and_step()
    save_checkpoint(tmp_path / "mae", state, epoch=0,
                    meta={"kind": "mae", "loss": 1.0})
    with pytest.raises(ValueError, match="no model config"):
        transfer_params(tmp_path / "mae", CFG, jax.random.PRNGKey(0))

    # 2. bug_exact source -> corrected target: pos_embed stays fresh
    import json as _json
    bug = CFG.replace(parity="bug_exact")
    opt = make_optimizer(lr=1e-3)
    bstate = create_train_state(jax.random.PRNGKey(1), bug, opt)
    save_checkpoint(tmp_path / "bug", bstate, epoch=0,
                    meta={"config": _json.loads(bug.to_json())})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = transfer_params(tmp_path / "bug", CFG, jax.random.PRNGKey(2))
    assert any("fresh init" in str(x.message)
               and "pos_embed" in str(x.message) for x in w)
    # encoder still transfers (layout-independent leaves)
    np.testing.assert_array_equal(
        np.asarray(got["blocks"]["wqkv"]),
        np.asarray(jax.device_get(bstate.params)["blocks"]["wqkv"]))

    # 3. a features-export-style npz (no pos_embed) must not silently load
    np.savez(tmp_path / "feats.npz",
             train_features=np.zeros((4, 8), np.float32))
    with pytest.raises(Exception):
        load_artifact_params(tmp_path / "feats.npz", CFG)


def test_async_writer_matches_sync_save(tmp_path):
    """AsyncCheckpointWriter writes through save_checkpoint: the drained
    artifact loads identically to a synchronous save, back-to-back saves
    serialize (one in flight), and keep-pruning applies."""
    from vitx.train.checkpoint import AsyncCheckpointWriter

    state, step, _ = _state_and_step()
    state, _ = step(state, _batch(), jax.random.PRNGKey(1))
    host = jax.device_get(state)

    sync_dir = tmp_path / "sync"
    save_checkpoint(sync_dir, host, epoch=2, meta={"loss": 0.5})

    w = AsyncCheckpointWriter()
    async_dir = tmp_path / "async"
    w.save(async_dir, host, 1, meta={"loss": 0.9}, keep=1)
    w.save(async_dir, host, 2, meta={"loss": 0.5}, keep=1)  # waits for 1
    w.wait()
    assert list_checkpoints(async_dir) == [2]               # keep=1 pruned

    fresh, _, _ = _state_and_step()
    a, am = restore_latest(async_dir, fresh)
    fresh2, _, _ = _state_and_step()
    s, sm = restore_latest(sync_dir, fresh2)
    assert am == sm
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(s)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_writer_propagates_errors(tmp_path):
    from vitx.train.checkpoint import AsyncCheckpointWriter

    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file where the ckpt dir should go")
    w = AsyncCheckpointWriter()
    w.save(blocker, {"x": np.zeros((2,))}, 1)
    with pytest.raises(Exception):
        w.wait()
    w.wait()   # exception is consumed; a drained writer is reusable


def test_trainer_async_checkpoint_e2e(tmp_path):
    """--async-checkpoint end to end: checkpoints land, resume matches."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    ckpt = tmp_path / "c"
    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "2",
        "--batch-size", "32", "--checkpoint-dir", str(ckpt),
        "--compute-dtype", "float32", "--async-checkpoint",
    ])
    assert list_checkpoints(ckpt) == [0, 1]
    rc = eval_main(["--preset", "tiny", "--data", "synthetic",
                    "--checkpoint", str(ckpt), "--batch-size", "32"])
    assert rc == 0
