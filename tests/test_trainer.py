"""End-to-end Trainer tests: tiny train run (loss falls, metrics logged),
checkpoint/resume mid-run, CLI entry point."""

import json
import os

import numpy as np
import pytest

from vitx.core.config import ViTConfig
from vitx.data import BatchLoader, SyntheticDataset
from vitx.data.pipeline import make_preprocess
from vitx.train.checkpoint import find_latest
from vitx.train.loop import Trainer, TrainerConfig

CFG = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                depth=2, num_heads=2, compute_dtype="float32")


def _loaders(batch=16):
    train = SyntheticDataset(num_examples=128, image_size=16, num_classes=4,
                             noise=0.1)
    test = SyntheticDataset(num_examples=48, image_size=16, num_classes=4,
                            noise=0.1, seed=1)
    return (BatchLoader(train, batch, shuffle=True),
            BatchLoader(test, batch))


def test_trainer_e2e_loss_decreases_and_evaluates(tmp_path):
    train_loader, eval_loader = _loaders()
    tcfg = TrainerConfig(epochs=3, lr=3e-3, log_dir=str(tmp_path / "logs"),
                         checkpoint_dir=str(tmp_path / "ckpt"), log_every=4)
    pre = make_preprocess(out_size=None, mean=(0.5, 0.5, 0.5),
                          std=(0.5, 0.5, 0.5))
    trainer = Trainer(CFG, tcfg, preprocess=pre)
    history = trainer.fit(train_loader, eval_loader)

    assert len(history) == 3
    assert history[-1]["epoch_loss_sum"] < history[0]["epoch_loss_sum"]
    assert "val_accuracy" in history[-1]
    assert history[-1]["val_accuracy"] > 0.5   # gratings are easy
    # checkpoints written per epoch
    assert find_latest(tmp_path / "ckpt") == 2
    # tensorboard event files (or jsonl fallback) exist
    logs = os.listdir(tmp_path / "logs")
    assert logs


def test_trainer_resume(tmp_path):
    train_loader, eval_loader = _loaders()
    ckpt_dir = str(tmp_path / "ckpt")
    tcfg1 = TrainerConfig(epochs=2, lr=3e-3, checkpoint_dir=ckpt_dir)
    t1 = Trainer(CFG, tcfg1)
    t1.fit(train_loader, eval_loader=None)
    step_after_2 = int(t1.state.step)

    tcfg2 = TrainerConfig(epochs=4, lr=3e-3, checkpoint_dir=ckpt_dir)
    t2 = Trainer(CFG, tcfg2)
    history = t2.fit(train_loader, eval_loader=None)
    # epochs 0-1 resumed, only 2-3 run
    assert [h["epoch"] for h in history] == [2, 3]
    assert int(t2.state.step) == 2 * step_after_2


def test_cli_smoke(tmp_path, capsys):
    from vitx.cli.train import main

    rc = main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--lr", "1e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    final = json.loads(out[-1])
    assert "loss" in final and np.isfinite(final["loss"])
    assert find_latest(tmp_path / "c") == 0


def test_preemption_checkpoint(tmp_path):
    """SIGTERM mid-training saves a checkpoint and exits the loop cleanly."""
    import os
    import signal as sig

    train_loader, _ = _loaders()

    class SignalingLoader:
        def __init__(self, inner, after):
            self.inner, self.after = inner, after

        def set_epoch(self, e):
            self.inner.set_epoch(e)

        def __iter__(self):
            for i, b in enumerate(self.inner):
                if i == self.after:
                    os.kill(os.getpid(), sig.SIGTERM)
                yield b

    tcfg = TrainerConfig(epochs=50, lr=1e-3,
                         checkpoint_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(CFG, tcfg)
    history = trainer.fit(SignalingLoader(train_loader, after=2))
    # exited long before 50 epochs, with a checkpoint on disk
    assert len(history) < 50
    assert find_latest(tmp_path / "ckpt") == history[-1]["epoch"]


def test_cli_eval(tmp_path, capsys):
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    capsys.readouterr()
    rc = eval_main(["--preset", "tiny", "--data", "synthetic",
                    "--checkpoint", str(tmp_path / "c"),
                    "--batch-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epoch"] == 0
    assert 0.0 <= out["accuracy"] <= 1.0
    assert len(out["per_class_accuracy"]) == 4
    assert out["num_examples"] == 512


def test_cli_eval_missing_checkpoint(tmp_path, capsys):
    from vitx.cli.eval import main as eval_main

    rc = eval_main(["--preset", "tiny", "--data", "synthetic",
                    "--checkpoint", str(tmp_path / "nope")])
    assert rc == 1


def test_padded_training_batch_excluded_from_loss():
    """Loader padding rows must not contribute to loss/grads (review fix)."""
    import jax
    import jax.numpy as jnp
    from vitx.train import create_train_state, make_train_step
    from vitx.train.step import make_optimizer

    opt = make_optimizer(lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = make_train_step(CFG, opt)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    imgs = jax.random.normal(k1, (6, 16, 16, 3))
    labels = jax.random.randint(k2, (6,), 0, 4)

    # unpadded 6-row batch
    s1, m1 = step(state, {"image": imgs, "label": labels}, None)
    # same 6 rows padded to 8 with garbage rows + mask
    pad_img = jnp.concatenate([imgs, 100.0 * jnp.ones((2, 16, 16, 3))])
    pad_lab = jnp.concatenate([labels, jnp.zeros((2,), jnp.int32)])
    mask = jnp.array([1, 1, 1, 1, 1, 1, 0, 0], jnp.int32)
    state2 = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    s2, m2 = step(state2, {"image": pad_img, "label": pad_lab,
                           "mask": mask}, None)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["accuracy"]), float(m2["accuracy"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_partial_epoch_checkpoint_reruns_epoch(tmp_path):
    """A preemption checkpoint mid-epoch is marked partial; resume re-runs
    that epoch instead of silently skipping its unseen remainder."""
    import os
    import signal as sig

    from vitx.train.checkpoint import restore_latest

    train_loader, _ = _loaders()

    class SignalingLoader:
        def __init__(self, inner, after):
            self.inner, self.after = inner, after

        def set_epoch(self, e):
            self.inner.set_epoch(e)

        def __iter__(self):
            for i, b in enumerate(self.inner):
                if i == self.after:
                    os.kill(os.getpid(), sig.SIGTERM)
                yield b

    ckpt_dir = str(tmp_path / "ckpt")
    tcfg = TrainerConfig(epochs=5, lr=1e-3, checkpoint_dir=ckpt_dir)
    t1 = Trainer(CFG, tcfg)
    history = t1.fit(SignalingLoader(train_loader, after=1))
    assert len(history) == 1                      # stopped in epoch 0
    _, meta = restore_latest(ckpt_dir, t1.state)
    assert meta["partial"] is True

    t2 = Trainer(CFG, TrainerConfig(epochs=2, lr=1e-3,
                                    checkpoint_dir=ckpt_dir))
    history2 = t2.fit(train_loader)
    # epoch 0 re-run (not skipped), then epoch 1
    assert [h["epoch"] for h in history2] == [0, 1]


def test_eval_loss_is_sample_exact_over_ragged_batches():
    """Eval loss must weight batches by valid-sample count: a ragged final
    batch and a single full batch over the same data give the same loss."""
    ds = SyntheticDataset(num_examples=24, image_size=16, num_classes=4,
                          noise=0.3)
    tcfg = TrainerConfig(epochs=1, lr=1e-3)
    trainer = Trainer(CFG, tcfg)
    ragged = trainer.evaluate(BatchLoader(ds, 16))      # 16 + 8(padded)
    full = trainer.evaluate(BatchLoader(ds, 24))        # one exact batch
    np.testing.assert_allclose(ragged["loss"], full["loss"], rtol=1e-5)
    np.testing.assert_allclose(ragged["accuracy"], full["accuracy"],
                               rtol=1e-6)


def test_loader_early_abandon_no_hang():
    """Abandoning iteration early must not leave the producer blocked."""
    import threading

    from vitx.data import BatchLoader, SyntheticDataset

    before = threading.active_count()
    ds = SyntheticDataset(num_examples=256, image_size=16, num_classes=4)
    for _ in range(5):
        it = iter(BatchLoader(ds, 8, prefetch=2))
        next(it)
        it.close()     # generator finalizer -> stop event -> join
    assert threading.active_count() <= before + 1


def test_cli_recipe_and_fsdp_flags(tmp_path, capsys):
    """CLI exposes the recipe knobs and ZeRO/dp scale-out flags."""
    import jax as _jax

    from vitx.cli.train import main

    argv = [
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--lr", "1e-3", "--compute-dtype", "float32",
        "--label-smoothing", "0.1", "--mixup-alpha", "0.2",
        "--drop-path", "0.05", "--grad-clip", "1.0",
    ]
    if len(_jax.devices()) >= 8:
        argv += ["--dp", "8", "--zero", "3"]
    rc = main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    final = json.loads(out[-1])
    assert np.isfinite(final["loss"])


def test_cli_cosine_schedule(tmp_path, capsys):
    """--schedule cosine trains through the CLI; the schedule is really
    applied (injected optimizer): with warmup covering the whole run the
    early updates are tiny, so the final loss stays near the const-lr
    run's starting point is NOT asserted — instead we assert the run is
    finite and the checkpoint resumes under the same flags."""
    from vitx.cli.train import main

    args = [
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--lr", "1e-3", "--compute-dtype", "float32",
        "--schedule", "cosine", "--warmup-steps", "4",
        "--checkpoint-dir", str(tmp_path / "c"),
    ]
    assert main(args) == 0
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["loss"])
    # resume path with an injected-schedule optimizer state
    assert main(args + ["--epochs", "2"]) == 0


def test_cli_eval_restores_cosine_checkpoint(tmp_path, capsys):
    """Regression: a --schedule cosine run saves one extra opt_state leaf
    (optax scale_by_schedule count). restore_eval_params used to misread it
    as an EMA shadow and crash the positional restore with a missing-leaf
    KeyError; the checkpoint meta now records the schedule, and a leaf-count
    probe disambiguates legacy checkpoints (extra==1 -> schedule,
    extra==n_params -> EMA)."""
    import numpy as _np

    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    ckpt = str(tmp_path / "c")
    assert train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--compute-dtype", "float32",
        "--schedule", "cosine", "--warmup-steps", "4",
        "--checkpoint-dir", ckpt]) == 0
    capsys.readouterr()
    assert eval_main(["--preset", "tiny", "--data", "synthetic",
                      "--checkpoint", ckpt, "--batch-size", "16"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["accuracy"] <= 1.0

    # legacy path: strip the recorded recipe from the meta so the
    # leaf-count probe must do the disambiguation itself
    import pathlib

    from vitx import get_config
    from vitx.train.checkpoint import restore_eval_params

    path = next(pathlib.Path(ckpt).glob("*.ckpt"))
    with _np.load(path) as z:
        payload = {k: z[k] for k in z.files if k != "__meta__"}
        meta = json.loads(bytes(z["__meta__"]).decode())
    for key in ("schedule", "ema_decay"):
        meta.pop(key, None)
    payload["__meta__"] = _np.frombuffer(
        json.dumps(meta).encode(), dtype=_np.uint8)
    _np.savez(path, **payload)
    cfg = get_config("tiny").replace(compute_dtype="float32", num_classes=4)
    params, meta2 = restore_eval_params(ckpt, cfg)
    assert params is not None and meta2["epoch"] == 0


def test_multisteps_schedule_ticks_per_update():
    """Pins the optax contract behind the train CLI's cosine+accum horizon
    math: MultiSteps advances the inner schedule count once per accum_steps
    micro-batches, so schedule horizons must be in UPDATES (the CLI divides
    total/warmup steps by --accum-steps)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vitx.train.step import make_optimizer

    opt = make_optimizer(schedule=lambda c: 1e-3, accum_steps=2)
    params = {"w": jnp.zeros(3)}
    st = opt.init(params)
    g = {"w": jnp.ones(3)}
    for _ in range(4):
        _, st = opt.update(g, st, params)
    is_sched = lambda x: isinstance(x, optax.ScaleByScheduleState)
    counts = [int(x.count) for x in jax.tree_util.tree_leaves(
        st, is_leaf=is_sched) if is_sched(x)]
    assert counts == [2]     # 4 micro-steps / k=2 -> 2 schedule ticks


def test_cli_cosine_with_accum_smoke(tmp_path, capsys):
    """cosine + gradient accumulation through the CLI trains, checkpoints,
    and the checkpoint evals (schedule+MultiSteps template alignment)."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    ckpt = str(tmp_path / "c")
    assert train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--compute-dtype", "float32",
        "--schedule", "cosine", "--warmup-steps", "4", "--accum-steps", "2",
        "--checkpoint-dir", ckpt]) == 0
    capsys.readouterr()
    assert eval_main(["--preset", "tiny", "--data", "synthetic",
                      "--checkpoint", ckpt, "--batch-size", "16"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["accuracy"] <= 1.0


def test_warmup_cosine_schedule_shape():
    """warmup_cosine: 0 at step 0, peak at warmup end, ~0 at the end."""
    from vitx.train.step import warmup_cosine

    sched = warmup_cosine(1e-3, total_steps=100, warmup_steps=10)
    assert float(sched(0)) < 1.5e-4
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert float(sched(100)) < 1e-4


def test_ema_params_shadow_and_eval():
    """EMA transform: trajectory identical to no-EMA; the shadow lags the
    live params and converges toward them; Trainer.eval_params picks it."""
    import jax
    import jax.numpy as jnp

    from vitx.train import create_train_state, make_train_step
    from vitx.train.step import get_ema_params, make_optimizer

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    batch = {"image": jax.random.normal(k1, (8, 16, 16, 3)),
             "label": jax.random.randint(k2, (8,), 0, 4)}

    opt_plain = make_optimizer(lr=1e-3)
    opt_ema = make_optimizer(lr=1e-3, ema_decay=0.9)
    s_plain = create_train_state(jax.random.PRNGKey(0), CFG, opt_plain)
    s_ema = create_train_state(jax.random.PRNGKey(0), CFG, opt_ema)
    step_p = make_train_step(CFG, opt_plain)
    step_e = make_train_step(CFG, opt_ema)

    assert get_ema_params(s_plain.opt_state) is None
    for _ in range(10):
        s_plain, m_p = step_p(s_plain, batch, None)
        s_ema, m_e = step_e(s_ema, batch, None)
    # the EMA transform must not change the training trajectory
    np.testing.assert_allclose(float(m_p["loss"]), float(m_e["loss"]),
                               rtol=1e-6)
    ema = get_ema_params(s_ema.opt_state)
    assert ema is not None
    # shadow lags the live params but has moved off the init
    p_live = s_ema.params["blocks"]["wqkv"]
    p_init = create_train_state(jax.random.PRNGKey(0), CFG,
                                opt_ema).params["blocks"]["wqkv"]
    d_live = float(jnp.linalg.norm(ema["blocks"]["wqkv"] - p_live))
    d_init = float(jnp.linalg.norm(ema["blocks"]["wqkv"] - p_init))
    assert 0 < d_live and 0 < d_init

    # Trainer.eval_params returns the shadow when enabled
    tcfg = TrainerConfig(epochs=1, lr=1e-3, ema_decay=0.9)
    tr = Trainer(CFG, tcfg)
    tr.state = s_ema
    np.testing.assert_array_equal(
        np.asarray(tr.eval_params()["blocks"]["wqkv"]),
        np.asarray(ema["blocks"]["wqkv"]))


def test_cli_ema_flag(tmp_path, capsys):
    from vitx.cli.train import main

    rc = main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--lr", "1e-3", "--compute-dtype", "float32",
        "--ema-decay", "0.99", "--checkpoint-dir", str(tmp_path / "c"),
    ])
    assert rc == 0
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["loss"])


def test_cli_accum_steps(tmp_path, capsys):
    """--accum-steps k: the optimizer updates every k micro-batches
    (optax.MultiSteps). The checkpoint records the chain shape so
    restore_eval_params rebuilds a structure-matched template."""
    import jax

    from vitx.cli.train import main
    from vitx.train.checkpoint import peek_meta, restore_eval_params

    rc = main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--lr", "1e-3", "--compute-dtype", "float32",
        "--accum-steps", "2", "--checkpoint-dir", str(tmp_path / "c"),
    ])
    assert rc == 0
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["loss"])
    saved = peek_meta(tmp_path / "c")
    assert saved.get("accum_steps") == 2
    cfg = ViTConfig.from_json(json.dumps(saved["config"]))
    params, meta = restore_eval_params(tmp_path / "c", cfg)
    assert params is not None and meta.get("accum_steps") == 2
    leaf = np.asarray(jax.tree_util.tree_leaves(params)[0])
    assert np.all(np.isfinite(leaf))


def test_cli_eval_predict_output(tmp_path, capsys):
    """--predict writes one JSON line per (unpadded) eval example with the
    argmax class and its probability."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3",
        "--checkpoint-dir", str(tmp_path / "c"),
        "--compute-dtype", "float32",
    ])
    capsys.readouterr()
    out_path = tmp_path / "preds.jsonl"
    rc = eval_main(["--preset", "tiny", "--data", "synthetic",
                    "--checkpoint", str(tmp_path / "c"),
                    "--batch-size", "48",          # ragged final batch
                    "--predict", str(out_path)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rows = [json.loads(line) for line in out_path.read_text().splitlines()]
    assert len(rows) == summary["num_examples"]
    assert all(0.0 < r["prob"] <= 1.0 for r in rows)
    # accuracy recomputed from the rows matches the CM-derived accuracy
    acc = sum(r["pred"] == r["label"] for r in rows) / len(rows)
    assert abs(acc - summary["accuracy"]) < 1e-6


def test_cli_train_eval_on_folder_dataset(tmp_path, capsys):
    """Full CLI train + eval over a REAL on-disk folder dataset (PNG files,
    mixed L/RGB modes, ragged class counts) — the reference's
    BrainTumorDataset usage end to end."""
    from PIL import Image

    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    for cls, n in {"glioma": 9, "meningioma": 8, "none": 11}.items():
        d = root / cls
        d.mkdir(parents=True)
        for i in range(n):
            arr = rng.integers(0, 255, (40, 30, 3), dtype=np.uint8)
            img = Image.fromarray(arr if i % 3 else arr[:, :, 0],
                                  "RGB" if i % 3 else "L")
            img.save(d / f"img_{i:03d}.png")

    rc = train_main([
        "--preset", "tiny", "--data", f"folder:{root}", "--epochs", "1",
        "--batch-size", "8", "--lr", "1e-3", "--compute-dtype", "float32",
        "--checkpoint-dir", str(tmp_path / "c"),
    ])
    assert rc == 0
    capsys.readouterr()
    rc = eval_main(["--data", f"folder:{root}",
                    "--checkpoint", str(tmp_path / "c"), "--batch-size", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 20% stratified test split of 28 images
    assert out["num_examples"] == 6
    assert set(out["per_class_accuracy"]) == {"glioma", "meningioma", "none"}


def test_cli_init_from_with_ema_const_schedule(tmp_path, capsys):
    """--init-from + --ema-decay with the default const schedule: the
    init_state's opt_state must be built by the SAME optimizer chain the
    Trainer steps with (a chain-length mismatch used to crash the first
    step with optax's 'number of updates and states' error; ADVICE r2)."""
    import jax

    from vitx.cli.pretrain import _flatten_strs
    from vitx.cli.train import main
    from vitx.core.config import get_config
    from vitx.nn.vit import init_params

    cfg = get_config("tiny", compute_dtype="float32", final_norm=True)
    params = init_params(jax.random.PRNGKey(7), cfg)
    flat = {"/".join(path): np.asarray(leaf)
            for path, leaf in _flatten_strs(jax.device_get(params))}
    init_npz = tmp_path / "init.npz"
    np.savez(init_npz, **flat)

    rc = main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "16", "--lr", "1e-3", "--compute-dtype", "float32",
        "--init-from", str(init_npz), "--ema-decay", "0.99",
    ])
    assert rc == 0
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["loss"])


def test_steps_per_dispatch_matches_single_step_trajectory():
    """steps_per_dispatch folds k train steps into one scanned dispatch;
    with dropout off the parameter trajectory is identical to the 1-step
    path over the same batches (incl. an epoch remainder < k)."""
    import jax

    from vitx.core.config import ViTConfig
    from vitx.data import BatchLoader, SyntheticDataset

    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=2, num_heads=2, compute_dtype="float32")
    ds = SyntheticDataset(num_examples=48, image_size=16, num_classes=4)

    def run(k):
        tcfg = TrainerConfig(epochs=2, lr=1e-3, steps_per_dispatch=k,
                             log_every=3, seed=7)
        tr = Trainer(cfg, tcfg)
        # 6 batches/epoch: with k=4 that is one 4-step dispatch + 2
        # remainder steps through the single-step path
        hist = tr.fit(BatchLoader(ds, 8, shuffle=True, seed=1,
                                  drop_last=True))
        return tr, hist

    tr1, h1 = run(1)
    tr4, h4 = run(4)
    assert int(tr1.state.step) == int(tr4.state.step) == 12
    for a, b in zip(jax.tree.leaves(jax.device_get(tr1.state.params)),
                    jax.tree.leaves(jax.device_get(tr4.state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(h1[-1]["epoch_loss_sum"],
                               h4[-1]["epoch_loss_sum"], rtol=1e-4)


def test_steps_per_dispatch_rejects_mesh():
    import jax
    import pytest

    from vitx.core.config import ViTConfig
    from vitx.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    cfg = ViTConfig(image_size=16, patch_size=4, num_classes=4, embed_dim=32,
                    depth=1, num_heads=2, compute_dtype="float32")
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        Trainer(cfg, TrainerConfig(epochs=1, steps_per_dispatch=4),
                mesh=make_mesh(dp=2, tp=1))


def test_cli_distill_from_teacher_checkpoint(tmp_path, capsys):
    """--distill-from: train a teacher through the CLI, then distill a
    student (with the DeiT distillation token) from its checkpoint; the
    student checkpoint evals through the standard eval CLI (the meta
    records distill_token so the geometry rebuilds)."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    teacher = str(tmp_path / "teacher")
    student = str(tmp_path / "student")
    assert train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3", "--compute-dtype", "float32",
        "--checkpoint-dir", teacher]) == 0
    capsys.readouterr()
    assert train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3", "--compute-dtype", "float32",
        "--distill-from", teacher, "--distill-token",
        "--distill-alpha", "0.5", "--distill-tau", "2.0",
        "--checkpoint-dir", student]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["loss"])
    assert eval_main(["--data", "synthetic", "--checkpoint", student,
                      "--batch-size", "32"]) == 0
    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= ev["accuracy"] <= 1.0


def test_llrd_scales_updates_geometrically_per_layer():
    """layerwise_lr_decay (BEiT fine-tune recipe): because it sits AFTER
    adamw in the chain, its per-group update must equal the plain-adamw
    update scaled by decay^(depth+1-layer_id) — blocks along their stacked
    leading axis, embeddings at the lowest rate, heads untouched."""
    import jax
    import jax.numpy as jnp

    from vitx.nn.vit import init_params
    from vitx.train.step import make_optimizer

    decay, depth = 0.7, CFG.depth
    params = init_params(jax.random.PRNGKey(0), CFG)
    # deterministic synthetic grads (independent of any data path)
    grads = jax.tree.map(
        lambda p: jnp.cos(jnp.arange(p.size, dtype=jnp.float32))
        .reshape(p.shape), params)

    def one_update(opt):
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        return updates

    plain = one_update(make_optimizer(lr=1e-3))
    scaled = one_update(make_optimizer(lr=1e-3, llrd=decay, llrd_depth=depth))

    # blocks: leading axis l scaled by decay^(depth - l)
    # rtol 1e-5: exact on CPU; the chip's fp32 rounds the adamw update
    # chain slightly differently between the two optimizer instances
    # (measured ~4e-6 rel, full-suite chip run round 3)
    for key, u in scaled["blocks"].items():
        f = (decay ** (depth - np.arange(depth))).reshape(
            (depth,) + (1,) * (u.ndim - 1))
        np.testing.assert_allclose(np.asarray(u),
                                   np.asarray(plain["blocks"][key]) * f,
                                   rtol=1e-5)
    # heads: unscaled
    for key in scaled["head"]:
        np.testing.assert_allclose(np.asarray(scaled["head"][key]),
                                   np.asarray(plain["head"][key]), rtol=1e-5)
    # embeddings: decay^(depth + 1)
    f0 = decay ** (depth + 1)
    for key in ("cls_token", "pos_embed"):
        np.testing.assert_allclose(np.asarray(scaled[key]),
                                   np.asarray(plain[key]) * f0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(scaled["patch_embed"]["kernel"]),
        np.asarray(plain["patch_embed"]["kernel"]) * f0, rtol=1e-5)


def test_cli_llrd_trains_and_checkpoint_restores(tmp_path, capsys):
    """--llrd runs end-to-end; its optimizer link is stateless so the
    checkpoint restores through the default (non-llrd) eval template."""
    from vitx.cli.eval import main as eval_main
    from vitx.cli.train import main as train_main

    ckpt = str(tmp_path / "ckpt")
    assert train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--lr", "3e-3", "--compute-dtype", "float32",
        "--llrd", "0.7", "--checkpoint-dir", ckpt]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["loss"])
    assert eval_main(["--data", "synthetic", "--checkpoint", ckpt,
                      "--batch-size", "32"]) == 0
    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= ev["accuracy"] <= 1.0


def test_early_stopping(tmp_path, capsys):
    """With patience 2 on a model that saturates val accuracy in the first
    epochs, the run must end long before the epoch budget — and the CLI
    flag must plumb through."""
    from vitx.cli.train import main as train_main

    train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "40",
        "--batch-size", "64", "--lr", "3e-3", "--early-stop", "2",
        "--compute-dtype", "float32",
    ])
    out = capsys.readouterr().out
    assert "early stop at epoch" in out
    # ran at least 3 epochs (1 best + 2 stale) but nowhere near 40
    assert 3 <= sum(1 for ln in out.splitlines()
                    if ln.startswith("epoch ")) < 20


def test_early_stop_keep_checkpoints_preserves_best_epoch(tmp_path, capsys):
    """keep_checkpoints pruning must never delete the best-val-accuracy
    epoch an early-stopped run exists to preserve."""
    from vitx.train.checkpoint import list_checkpoints

    train_loader, eval_loader = _loaders(batch=32)
    tcfg = TrainerConfig(epochs=40, lr=3e-3, eval_every=1,
                         early_stop_patience=2, keep_checkpoints=1,
                         checkpoint_dir=str(tmp_path / "c"))
    trainer = Trainer(CFG, tcfg)
    history = trainer.fit(train_loader, eval_loader)
    assert len(history) < 40
    best = max(history, key=lambda h: h["val_accuracy"])["epoch"]
    kept = list_checkpoints(tmp_path / "c")
    assert best in kept, (best, kept)
    # pruning still ran: only the protected best + the newest remain
    assert len(kept) <= 2


def test_cli_image_size_override(tmp_path, capsys):
    """--image-size retargets the preset's resolution; the checkpoint
    records the overridden geometry so eval restores it."""
    from vitx.cli.train import main as train_main
    from vitx.train.checkpoint import peek_meta

    rc = train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--image-size", "32",
        "--compute-dtype", "float32",
        "--checkpoint-dir", str(tmp_path / "c"),
    ])
    assert rc == 0
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["loss"])
    saved = peek_meta(tmp_path / "c")
    assert saved["config"]["image_size"] == 32


def test_nan_abort_stops_diverged_run(tmp_path):
    """A non-finite train loss aborts the run at the next flush with a
    resumable error instead of burning the remaining epochs on NaNs; the
    epoch-boundary checkpoint from before the divergence survives."""
    import jax.numpy as jnp
    import pytest

    from vitx.train.loop import NonFiniteLossError
    from vitx.train.step import make_train_step, make_optimizer

    opt = make_optimizer(lr=1e-3)
    real_step = make_train_step(CFG, opt)
    calls = {"n": 0}

    def poisoned_step(state, batch, rng):
        state, m = real_step(state, batch, rng)
        calls["n"] += 1
        if calls["n"] > 10:
            m = dict(m, loss=jnp.float32(float("nan")))
        return state, m

    train_loader, eval_loader = _loaders()
    trainer = Trainer(CFG, TrainerConfig(
        epochs=3, lr=1e-3, log_every=4,
        checkpoint_dir=str(tmp_path / "c")), train_step=poisoned_step)
    with pytest.raises(NonFiniteLossError, match="non-finite train loss"):
        trainer.fit(train_loader, eval_loader)
    # nan_abort=False keeps going (fresh trainer, same poisoned step)
    calls["n"] = 0
    trainer2 = Trainer(CFG, TrainerConfig(epochs=1, lr=1e-3, log_every=4,
                                          nan_abort=False),
                       train_step=poisoned_step)
    history = trainer2.fit(train_loader, eval_loader)
    assert len(history) == 1


def test_class_weighted_loss_torch_parity_and_cli(tmp_path, capsys):
    """cross_entropy_loss(class_weights=...) matches torch
    CrossEntropyLoss(weight=..., label_smoothing=...) exactly (weighted
    normalization included), and the CLI wires --class-weights balanced."""
    import jax
    import jax.numpy as jnp
    import torch

    from vitx.train.step import cross_entropy_loss

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((16, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 16)
    weights = np.array([0.5, 2.0, 1.0, 3.0], np.float32)
    for s in (0.0, 0.1):
        ours = float(cross_entropy_loss(
            jnp.asarray(logits), jnp.asarray(labels), None,
            label_smoothing=s, class_weights=weights))
        want = float(torch.nn.CrossEntropyLoss(
            weight=torch.tensor(weights), label_smoothing=s)(
            torch.tensor(logits), torch.tensor(labels)))
        # rtol 1e-5: exact-ish on CPU; chip fp32 log-softmax rounds
        # ~4e-6 rel away from torch (full-suite chip run round 3)
        np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-7)

    # masked rows drop out of both numerator and weighted denominator
    mask = np.ones(16, np.float32)
    mask[10:] = 0.0
    ours_m = float(cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
        class_weights=weights))
    want_m = float(torch.nn.CrossEntropyLoss(weight=torch.tensor(weights))(
        torch.tensor(logits[:10]), torch.tensor(labels[:10])))
    np.testing.assert_allclose(ours_m, want_m, rtol=1e-5, atol=1e-7)

    from vitx.cli.train import main as train_main

    rc = train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "32", "--compute-dtype", "float32",
        "--class-weights", "balanced",
        "--checkpoint-dir", str(tmp_path / "c"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["loss"])
    # wrong count -> clean error
    rc = train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--class-weights", "1.0,2.0",
    ])
    assert rc == 1


def test_training_is_bit_deterministic(tmp_path):
    """Two identically-seeded CLI runs produce BIT-IDENTICAL checkpoints —
    pins the whole chain (threaded loader order, device preprocess rngs,
    dropout/mixup keys, optimizer) as reproducible."""
    import jax

    from vitx.cli.train import main as train_main
    from vitx.train.checkpoint import restore_latest
    from vitx.train.step import make_optimizer

    args = ["--preset", "tiny", "--data", "synthetic", "--epochs", "1",
            "--batch-size", "32", "--compute-dtype", "float32",
            "--randaug", "5", "--mixup-alpha", "0.8", "--seed", "7"]
    train_main(args + ["--checkpoint-dir", str(tmp_path / "a")])
    train_main(args + ["--checkpoint-dir", str(tmp_path / "b")])

    opt = make_optimizer(lr=1e-4)
    from vitx.core.config import PRESETS
    from vitx.train.step import create_train_state

    cfg = PRESETS["tiny"].replace(compute_dtype="float32")
    tmpl = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    sa, _ = restore_latest(tmp_path / "a", tmpl)
    tmpl2 = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    sb, _ = restore_latest(tmp_path / "b", tmpl2)
    for x, y in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
