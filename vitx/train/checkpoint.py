"""Per-epoch checkpoints with resume-from-latest.

Keeps the reference's directory convention — one file per epoch named by the
integer epoch, newest = max integer stem (``src/train.py:52-58,107-113``) —
with a TPU-native payload: the full TrainState pytree (params + optimizer
state + step) serialized as a flat .npz, metadata as embedded JSON. A
reference-format ``.pt`` import/export shim lives in ``vitx.interop``.
"""

from __future__ import annotations

import json
import pathlib
import re

import jax
import numpy as np

_STEM_RE = re.compile(r"^(\d+)$")
SUFFIX = ".ckpt"
ORBAX_SUFFIX = ".orbax"


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _ckpt_path(ckpt_dir, epoch: int):
    """Path of epoch's checkpoint: the orbax directory if present, else .ckpt."""
    ckpt_dir = pathlib.Path(ckpt_dir)
    orbax = ckpt_dir / f"{epoch}{ORBAX_SUFFIX}"
    if orbax.is_dir():
        return orbax
    return ckpt_dir / f"{epoch}{SUFFIX}"


def _save_orbax(path, state, meta):
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    (path / "vitx_meta.json").write_text(json.dumps(meta))


def _restore_orbax(path, template_state):
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    meta = json.loads((path / "vitx_meta.json").read_text())
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        template_state)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, abstract)
    # re-place with the template's shardings (mesh runs)
    restored = jax.tree.map(
        lambda arr, tmpl: (jax.device_put(arr, tmpl.sharding)
                           if hasattr(tmpl, "sharding") else arr),
        restored, template_state)
    return restored, meta


def save_checkpoint(ckpt_dir, state, epoch: int, meta: dict | None = None,
                    keep: int | None = None, backend: str = "npz",
                    protect: int | None = None):
    """Write ``{epoch}.ckpt`` (flat npz) or ``{epoch}.orbax/``.

    ``backend="orbax"`` uses orbax-checkpoint (the multi-host / sharded-save
    path for pod-scale runs); both live behind the same integer-epoch
    discovery convention (train.py:52-58). ``meta`` must be
    JSON-serializable. ``keep``: if set, delete all but the newest `keep`
    checkpoints after saving (the reference kept every epoch; opt-in).
    ``protect``: an epoch pruning must never delete (the Trainer passes its
    best-val-accuracy epoch, so ``keep`` + early stopping can't discard the
    peak the run is stopping FOR).
    """
    ckpt_dir = pathlib.Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    meta = dict(meta or {})
    meta["epoch"] = epoch
    if backend == "orbax":
        path = ckpt_dir / f"{epoch}{ORBAX_SUFFIX}"
        _save_orbax(path, state, meta)
    elif backend == "npz":
        leaves, _ = _flatten(state)
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        payload = {"__meta__": np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)}
        payload.update(arrays)
        path = ckpt_dir / f"{epoch}{SUFFIX}"
        tmp = path.with_suffix(".tmp.npz")
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        tmp.replace(path)      # atomic: no torn checkpoint on preemption
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")

    if keep is not None:
        for old in sorted(list_checkpoints(ckpt_dir))[:-keep]:
            if protect is not None and old == protect:
                continue
            stale = _ckpt_path(ckpt_dir, old)
            if stale.is_dir():
                import shutil

                shutil.rmtree(stale)
            else:
                stale.unlink(missing_ok=True)
    return path


class AsyncCheckpointWriter:
    """Overlap checkpoint serialization with training.

    ``save(...)`` takes a HOST snapshot of the state (the caller passes the
    result of ``jax.device_get`` — the only part that must happen before the
    next train step mutates the donated device buffers) and enqueues the
    npz/orbax write on one background thread. At most ONE save is in flight:
    a second ``save`` blocks until the first lands (bounded host memory —
    two host copies of the state, the snapshot being written and the new
    one). ``wait()`` drains the queue and re-raises any writer-thread
    exception; call it before process exit (the Trainer does, in its
    ``finally``) or a preemption could lose the final epoch.

    The write itself is ``save_checkpoint`` unchanged — atomic tmp+rename,
    keep-pruning, both backends — so readers can't observe a torn file.
    """

    def __init__(self):
        self._thread = None
        self._exc = None

    def save(self, ckpt_dir, state_host, epoch: int, **kw):
        import threading

        self.wait()

        def run():
            try:
                save_checkpoint(ckpt_dir, state_host, epoch, **kw)
            except BaseException as e:  # re-raised on the caller's thread
                self._exc = e

        self._thread = threading.Thread(
            target=run, name=f"ckpt-writer-{epoch}", daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def list_checkpoints(ckpt_dir) -> list[int]:
    ckpt_dir = pathlib.Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return []
    out = set()
    for p in ckpt_dir.glob(f"*{SUFFIX}"):
        m = _STEM_RE.match(p.stem)
        if m:
            out.add(int(m.group(1)))
    for p in ckpt_dir.glob(f"*{ORBAX_SUFFIX}"):
        m = _STEM_RE.match(p.stem)
        if m and p.is_dir():
            out.add(int(m.group(1)))
    return sorted(out)


def find_latest(ckpt_dir) -> int | None:
    """Newest epoch number in the directory (train.py:52-58 semantics)."""
    found = list_checkpoints(ckpt_dir)
    return found[-1] if found else None


_UNREADABLE = None    # populated lazily (zipfile import)


def _unreadable_errors():
    global _UNREADABLE
    if _UNREADABLE is None:
        import zipfile
        _UNREADABLE = (zipfile.BadZipFile, OSError, EOFError, ValueError,
                       json.JSONDecodeError)
    return _UNREADABLE


def _read_meta(path):
    """Meta dict of one checkpoint path (npz file or orbax dir)."""
    path = pathlib.Path(path)
    if path.is_dir():
        meta_file = path / "vitx_meta.json"
        return json.loads(meta_file.read_text()) if meta_file.exists() else {}
    with np.load(path) as z:
        return json.loads(bytes(z["__meta__"]).decode())


def peek_meta(ckpt_dir):
    """Read the newest READABLE checkpoint's meta WITHOUT a template state
    (e.g. to recover the saved model config before building params).
    Unreadable files are skipped with a warning (read-only — no quarantine:
    eval/serve must not mutate a training directory a trainer may own).
    Returns None when the directory has no readable checkpoints. Also
    accepts a direct checkpoint path (npz file or .orbax dir)."""
    import warnings

    direct = pathlib.Path(ckpt_dir)
    if direct.is_file() or direct.suffix.endswith("orbax"):
        try:
            return _read_meta(direct)
        except (KeyError, *_unreadable_errors()):
            return None
    for epoch in reversed(list_checkpoints(ckpt_dir)):
        path = _ckpt_path(ckpt_dir, epoch)
        try:
            return _read_meta(path)
        except (KeyError, *_unreadable_errors()) as e:
            warnings.warn(f"checkpoint {path} is unreadable "
                          f"({type(e).__name__}); skipping")
    return None


def restore_checkpoint(path, template_state):
    """Load a checkpoint into the structure of ``template_state``.

    Returns (state, meta). Leaves are restored with the template's sharding
    (device_put onto each template leaf's sharding when available).
    Accepts both backends (.ckpt npz file or .orbax directory).
    """
    path = pathlib.Path(path)
    if path.is_dir():
        return _restore_orbax(path, template_state)
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        leaves, treedef = _flatten(template_state)
        loaded = []
        for i, tmpl in enumerate(leaves):
            arr = z[f"leaf_{i}"]
            if hasattr(tmpl, "sharding"):
                arr = jax.device_put(arr.astype(tmpl.dtype), tmpl.sharding)
            loaded.append(arr)
    return jax.tree_util.tree_unflatten(treedef, loaded), meta


def restore_latest(ckpt_dir, template_state):
    """Resume from the newest checkpoint, or return (template, None).

    Resilient resume: a checkpoint that cannot be READ (truncated copy, bad
    zip, mangled meta — atomic writes make this rare, but disks and manual
    copies are not atomic) is quarantined as ``<name>.corrupt`` and the
    previous epoch is tried, so a fleet restart never wedges on one bad
    file. A checkpoint that reads fine but does not match
    ``template_state``'s structure still raises — that is a model/optimizer
    mismatch the caller must see, not corruption.
    """
    import warnings

    for epoch in reversed(list_checkpoints(ckpt_dir)):
        path = _ckpt_path(ckpt_dir, epoch)
        try:
            return restore_checkpoint(path, template_state)
        except _unreadable_errors() as e:
            # ValueError covers np.load on garbage bytes; a STRUCTURE
            # mismatch (missing leaf_N) raises KeyError and propagates
            quarantine = path.with_name(path.name + ".corrupt")
            warnings.warn(
                f"checkpoint {path} is unreadable ({type(e).__name__}: {e});"
                f" quarantined to {quarantine.name}, trying epoch {epoch - 1}")
            try:
                path.replace(quarantine)
            except OSError:
                pass
    return template_state, None


def _npz_leaf_count(path) -> int | None:
    path = pathlib.Path(path)
    if path.is_dir():
        return None
    with np.load(path) as z:
        return sum(1 for k in z.files if k.startswith("leaf_"))


def restore_eval_params(path_or_dir, cfg):
    """Restore a checkpoint for EVALUATION / SERVING: returns
    ``(params, meta)`` where ``params`` is the EMA shadow when the run
    trained with ``TrainerConfig.ema_decay``, else the live params.

    The optimizer template is rebuilt to match the checkpoint's recorded
    chain (``meta["ema_decay"]``) so the positional npz restore does not
    silently drop the shadow; for older checkpoints without the meta key,
    an npz leaf-count probe detects the extra EMA leaves.
    """
    import jax as _jax

    from vitx.train.step import (create_train_state, get_ema_params,
                                 make_optimizer)

    path = pathlib.Path(path_or_dir)
    if not path.exists():
        return None, None
    if path.is_dir() and not path.suffix.endswith("orbax"):
        # newest READABLE checkpoint (read-only skip — no quarantine here:
        # eval/serve must not mutate a directory a trainer may own)
        import warnings

        meta = None
        for epoch in reversed(list_checkpoints(path)):
            cand = _ckpt_path(path, epoch)
            try:
                meta = _read_meta(cand)
                path = cand
                break
            except (KeyError, *_unreadable_errors()) as e:
                warnings.warn(f"checkpoint {cand} is unreadable "
                              f"({type(e).__name__}); skipping")
        if meta is None:
            return None, None
    else:
        meta = _read_meta(path)

    ema_decay = meta.get("ema_decay")
    has_schedule = bool(meta.get("schedule"))
    accum = meta.get("accum_steps", 1)
    opt_name = meta.get("optimizer", "adamw")
    # freeze policy (LoRA / head-only runs): a masked optimizer stores NO
    # moment leaves for frozen params — the template must mask identically
    # or the positional npz restore shifts every leaf
    trainable = meta.get("train_filter")
    if not path.is_dir() and (ema_decay is None or not has_schedule):
        # checkpoint whose meta predates (or omits) part of the recorded
        # optimizer recipe: probe by leaf count. The EMA chain link adds one
        # shadow leaf PER PARAM leaf; an lr schedule (optax scale_by_schedule)
        # adds exactly ONE count leaf — disambiguate by extra mod n_params
        # (a cosine-only checkpoint used to false-positive as EMA here and
        # crash the positional restore with a missing-leaf KeyError).
        n_saved = _npz_leaf_count(path)
        plain = create_train_state(
            _jax.random.PRNGKey(0), cfg,
            make_optimizer(accum_steps=accum, optimizer=opt_name,
                           trainable=trainable))
        n_plain = len(_jax.tree_util.tree_leaves(plain))
        n_params = len(_jax.tree_util.tree_leaves(plain.params))
        if n_saved is not None and n_saved > n_plain:
            extra = n_saved - n_plain
            if ema_decay is None and extra >= n_params:
                ema_decay = 0.999    # value is irrelevant for structure
            if extra % n_params == 1:
                has_schedule = True
    template = create_train_state(
        _jax.random.PRNGKey(0), cfg,
        make_optimizer(
            # a constant dummy schedule reproduces the ScaleByScheduleState
            # in the chain; leaf VALUES all come from the checkpoint
            schedule=(lambda _: 0.0) if has_schedule else None,
            ema_decay=ema_decay, accum_steps=accum, optimizer=opt_name,
            trainable=trainable))
    state, meta = restore_checkpoint(path, template)
    ema = get_ema_params(state.opt_state)
    return (ema if ema is not None else state.params), meta


# ---------------------------------------------------------------------------
# Reference .pt format (torch.save dict, train.py:107-113 schema)
# ---------------------------------------------------------------------------

def save_reference_pt(path, params, cfg, *, epoch: int, loss: float = 0.0,
                      step: int = 0, batch_size: int = 1, opt_state=None,
                      lr: float = 1e-4, weight_decay: float = 1e-4):
    """Write a reference-layout ``{epoch}.pt``:
    {'epoch', 'model_state_dict', 'optimizer_state_dict', 'loss', 'step'}.

    ``opt_state`` (a vitx TrainState.opt_state) exports the real AdamW
    moments in torch layout so the reference's resume
    (train.py:73 ``optimizer.load_state_dict``) continues training with
    identical optimizer state. Without it, a structurally valid fresh-AdamW
    state dict is written (param_groups populated, empty state) so the
    resume path still loads cleanly.
    """
    import torch

    from vitx.interop import export_reference_state_dict
    from vitx.interop.torch_ref import (
        export_reference_optimizer_state,
        reference_parameter_order,
    )

    if cfg.lora_rank:
        # the reference layout has no adapter slots — fold them into the
        # dense weights (exact: the merged forward IS the adapted forward).
        # NOTE: opt_state moments (if passed) describe the adapters, not
        # the merged weights — the adapters' base stayed frozen, so a fresh
        # torch AdamW state is the honest export; drop the moments.
        from vitx.nn.lora import merge_lora_params

        params, cfg = merge_lora_params(params, cfg)
        opt_state = None
    sd = export_reference_state_dict(jax.device_get(params), cfg,
                                     batch_size=batch_size)
    if opt_state is not None:
        osd = export_reference_optimizer_state(
            jax.device_get(opt_state), cfg, lr=lr, weight_decay=weight_decay,
            batch_size=batch_size)
    else:
        osd = {"state": {}, "param_groups": [{
            "lr": lr, "betas": (0.9, 0.999), "eps": 1e-8,
            "weight_decay": weight_decay, "amsgrad": False, "maximize": False,
            "foreach": None, "capturable": False, "differentiable": False,
            "fused": None, "decoupled_weight_decay": True,
            "params": list(range(len(reference_parameter_order(cfg)))),
        }]}
    torch.save({
        "epoch": epoch,
        "model_state_dict": {k: torch.from_numpy(v.copy())
                             for k, v in sd.items()},
        "optimizer_state_dict": osd,
        "loss": loss,
        "step": step,
    }, path)


def load_reference_pt(path, cfg):
    """Load a reference ``.pt`` checkpoint -> (params pytree, meta dict)."""
    import torch

    from vitx.interop import import_reference_state_dict

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    params = import_reference_state_dict(sd, cfg)
    meta = {k: ckpt.get(k) for k in ("epoch", "loss", "step")
            if isinstance(ckpt, dict) and k in ckpt}
    return params, meta


# ---------------------------------------------------------------------------
# One artifact surface for every inference CLI (eval / serve / probe)
# ---------------------------------------------------------------------------

def resolve_artifact_config(checkpoint, config_json=None, preset="tiny",
                            tome_r=0):
    """THE config-discovery rule, shared by eval/serve/probe: an explicit
    ``--config-json`` wins; otherwise self-describing artifact meta (a
    checkpoint dir, a direct ``{epoch}.ckpt``/orbax path, or a
    ``.quant.npz`` int8 artifact — reference ``.pt`` files carry no vitx
    config); the preset is the fallback. ``tome_r`` applies last
    (inference-only override, never persisted back into artifacts)."""
    from vitx.core.config import ViTConfig, get_config

    cfg = (ViTConfig.from_json(open(config_json).read())
           if config_json else get_config(preset))
    if checkpoint and not config_json:
        p = pathlib.Path(checkpoint)
        if p.name.endswith(".quant.npz"):
            from vitx.quant import peek_meta as peek_quant_meta

            saved = peek_quant_meta(p)
        elif p.suffix == ".stablehlo":
            from vitx.export import peek_meta as peek_export_meta

            saved = peek_export_meta(p)
        elif p.suffix == ".pt":
            saved = None
        else:
            saved = peek_meta(p)
        if saved and "config" in saved:
            cfg = ViTConfig.from_json(json.dumps(saved["config"]))
            if cfg.tome_r or cfg.tome_train:
                # ToMe merging is parameter-free: a --tome-train checkpoint
                # is full-token-servable (the train CLI's promise), so the
                # persisted train-time tome knobs never leak into
                # eval/serve/probe — merged inference is an explicit
                # --tome-r at the consuming CLI (ADVICE r4).
                cfg = cfg.replace(tome_r=0, tome_train=False)
    if isinstance(tome_r, str):
        # "toN" (e.g. --tome-r to128): resolve against the final geometry
        from vitx.nn.tome import aligned_schedule

        tome_r = aligned_schedule(cfg, target_tokens=int(tome_r[2:]))
    return cfg.replace(tome_r=tome_r) if tome_r else cfg


def load_artifact_params(checkpoint, cfg):
    """THE artifact-loading rule, shared by eval/serve/probe: returns
    ``(params, meta)`` for a vitx checkpoint dir / direct ``{epoch}.ckpt``
    / orbax path (EMA-aware, via :func:`restore_eval_params`), a
    ``.quant.npz`` int8 artifact, or a reference ``.pt``. Raises
    ``FileNotFoundError`` when nothing restorable is found."""
    from vitx.nn.vit import init_params

    p = pathlib.Path(checkpoint)
    if p.suffix == ".stablehlo":
        raise ValueError(
            "a .stablehlo artifact bakes only the logits program — there "
            "are no parameters to load; eval/probe the checkpoint it was "
            "exported from (serving it works: serve --checkpoint "
            "m.stablehlo)")
    if p.name.endswith(".quant.npz"):
        from vitx.quant import load_quantized

        params, user = load_quantized(
            p, init_params(jax.random.PRNGKey(0), cfg))
        return params, {"epoch": user.get("epoch", -1)}
    if p.suffix == ".pt":
        return load_reference_pt(p, cfg)
    if p.suffix == ".npz" and p.is_file() and not p.name.endswith(".quant.npz"):
        # a bare params npz (vitx.cli.pretrain --export-vit): no TrainState
        # or __meta__, just flat "a/b/c" leaves with pos_embed present. The
        # MAE frozen-encoder eval probes these directly (pass the fine-tune
        # config: final_norm=True). Anything else-shaped falls through to
        # the checkpoint restore (which errors clearly).
        with np.load(p) as data:
            bare = "__meta__" not in data.files and "pos_embed" in data.files
        if bare:
            from vitx.cli.pretrain import load_vit_init

            return (load_vit_init(p, cfg, jax.random.PRNGKey(0)),
                    {"epoch": -1})
    params, meta = restore_eval_params(p, cfg)
    if meta is None:
        raise FileNotFoundError(f"no checkpoint under {p}")
    return params, meta


def soup_params(params, cfg, extra_checkpoints):
    """Uniform model soup (Wortsman et al. 2022): average ``params`` with
    the parameters of ``extra_checkpoints`` — any eval-able artifacts
    (checkpoint dirs, ``.ckpt`` files, int8 ``.quant.npz``, reference
    ``.pt``) of the SAME geometry. Accumulates in fp32, preserves each
    leaf's dtype. Souping fine-tunes from one init improves accuracy for
    free at inference; the averaged tree is an ordinary params pytree, so
    every downstream path (eval, exports, serving) works unchanged.
    """
    trees = [params]
    base = {tuple(str(k) for k in kp): leaf.shape
            for kp, leaf in jax.tree_util.tree_leaves_with_path(params)}
    for c in extra_checkpoints:
        extra, _ = load_artifact_params(c, cfg)
        other = {tuple(str(k) for k in kp): leaf.shape
                 for kp, leaf in jax.tree_util.tree_leaves_with_path(extra)}
        if other != base:
            only_b = sorted(set(base) - set(other))[:3]
            only_o = sorted(set(other) - set(base))[:3]
            shapes = sorted(k for k in base
                            if k in other and base[k] != other[k])[:3]
            raise ValueError(
                f"soup ingredient {c} has a different parameter tree "
                f"(missing: {only_b}, extra: {only_o}, shape mismatches: "
                f"{shapes}) — soup models must share one geometry")
        trees.append(extra)
    n = float(len(trees))

    def avg(*xs):
        acc = sum(np.asarray(x, dtype=np.float32) for x in xs) / n
        return acc.astype(np.asarray(xs[0]).dtype)

    return jax.tree_util.tree_map(avg, *trees)


def transfer_params(checkpoint, cfg, rng):
    """Initialize a ``cfg``-shaped params pytree from ANY artifact, for
    TRANSFER fine-tuning (new class head, new resolution, new dataset).

    The source geometry comes from the artifact's own meta (self-describing
    checkpoints; reference ``.pt`` files carry none and are imported at the
    target geometry). Leaves graft by (path, shape); a grid-size-only
    ``pos_embed`` mismatch is bilinearly resized (the higher-resolution
    fine-tune trick); everything else — e.g. a head with a different class
    count — keeps its fresh init, with a warning listing what stayed fresh.
    Bare ``--export-vit`` npz files route through ``load_vit_init``
    (identical semantics, file-backed)."""
    import warnings

    import jax.numpy as jnp

    from vitx.nn.vit import init_params

    p = pathlib.Path(checkpoint)
    if (p.suffix == ".npz" and p.is_file()
            and not p.name.endswith(".quant.npz")):
        from vitx.cli.pretrain import load_vit_init

        return load_vit_init(p, cfg, rng)
    if p.suffix == ".pt":
        # reference .pt carries no vitx config: import at the target
        # geometry (the importer raises on a true geometry mismatch)
        src_cfg = cfg
    else:
        if p.name.endswith(".quant.npz"):
            from vitx.quant import peek_meta as _peek

            saved = _peek(p)
        else:
            saved = peek_meta(p)
        if not saved or "config" not in saved:
            raise ValueError(
                f"transfer from {p}: the artifact records no model config "
                f"(e.g. an MAE pretraining checkpoint dir — export a "
                f"fine-tune init with `pretrain --export-vit` instead), "
                f"so the source geometry cannot be restored safely")
        from vitx.core.config import ViTConfig

        src_cfg = ViTConfig.from_json(json.dumps(saved["config"]))
    src, _ = load_artifact_params(p, src_cfg)
    template = init_params(rng, cfg)
    fresh = []

    def pick(kp, leaf):
        key = "/".join(str(k.key) for k in kp)
        node = src
        for k in kp:
            if isinstance(node, dict) and k.key in node:
                node = node[k.key]
            else:
                node = None
                break
        if key == "pos_embed" and src_cfg.parity != cfg.parity:
            # cross-parity transfer: bug_exact stores [patches..., CLS],
            # corrected stores [CLS, patches...] — same shape, different
            # row order; grafting (or resizing) would scramble the grid
            node = None
        if node is not None:
            arr = np.asarray(node)
            if arr.shape == leaf.shape:
                return jnp.asarray(arr, leaf.dtype)
            if key == "pos_embed":
                from vitx.cli.pretrain import _resize_saved_pos_embed

                resized = _resize_saved_pos_embed(arr, cfg)
                if resized is not None:
                    warnings.warn(
                        f"transfer from {p}: pos_embed resized from "
                        f"{arr.shape[1]} to {cfg.pos_len} positions "
                        f"(grid {cfg.grid_size}x{cfg.grid_size})")
                    return jnp.asarray(resized, leaf.dtype)
            if (key == "patch_embed/kernel"
                    and src_cfg.stem == "patch" and cfg.stem == "patch"
                    and src_cfg.num_channels == cfg.num_channels
                    and arr.ndim == 2 and arr.shape[1] == leaf.shape[1]
                    and arr.shape[0] == (src_cfg.patch_size ** 2
                                         * src_cfg.num_channels)):
                # FlexiViT PI-resize (vitx/nn/flexivit.py): transfer across
                # patch sizes instead of dropping the patchify weights
                from vitx.nn.flexivit import pi_resize_patch_kernel

                warnings.warn(
                    f"transfer from {p}: patchify kernel PI-resized from "
                    f"patch {src_cfg.patch_size} to {cfg.patch_size}")
                return jnp.asarray(
                    pi_resize_patch_kernel(arr, src_cfg.patch_size,
                                           cfg.patch_size,
                                           cfg.num_channels), leaf.dtype)
        fresh.append(key)
        return leaf

    out = jax.tree_util.tree_map_with_path(pick, template)
    if fresh:
        warnings.warn(f"transfer from {p}: fresh init kept for {fresh} "
                      "(missing or shape-mismatched in the source)")
    return out
