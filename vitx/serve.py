"""Batched inference serving for vitx models.

The reference project's only inference surface is a notebook cell; a
production TPU deployment needs a server that (a) keeps ONE compiled
executable hot, (b) batches concurrent requests so the MXU sees large
matmuls, and (c) never triggers a recompile — so the server pads every
batch to a FIXED shape and masks the padding out of the results.

Design (TPU-first):
- One jitted ``forward`` at a fixed ``(batch, H, W, C)`` shape, compiled at
  startup (warmup). Requests queue on the host; a collector thread drains
  up to ``batch_size`` requests (waiting at most ``max_delay_ms`` after the
  first), pads, runs ONE device step, and fans results back out.
- Everything after the forward (softmax/top-k) happens on device in the
  same program; only the k requested floats per sample return to host —
  through a tunnel/PCIe this matters as much as the compute.
- Latency metrics (p50/p99) and throughput are tracked per server.

``vitx.cli.serve`` wraps this in a stdlib HTTP front end; the class is
usable directly for in-process serving.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from vitx.core.config import ViTConfig


class ServerOverloaded(RuntimeError):
    """Raised by ``predict`` when the request queue is at ``max_queue``."""


@dataclass
class ServerStats:
    """Mutation happens under ``lock`` (collector + predict threads); the
    latency window is a bounded deque so a long-lived server's memory is
    flat no matter how many requests it sees."""
    requests: int = 0
    batches: int = 0
    padded_slots: int = 0
    rejected: int = 0
    explains: int = 0
    window: int = 10_000
    recent_window: int = 1_000
    latencies_ms: deque = field(default=None)
    recent_ms: deque = field(default=None)
    lock: threading.Lock = field(default_factory=threading.Lock)

    def __post_init__(self):
        if self.latencies_ms is None:
            self.latencies_ms = deque(maxlen=self.window)
        if self.recent_ms is None:
            self.recent_ms = deque(maxlen=self.recent_window)

    @staticmethod
    def _pct(lat, p):
        return lat[min(len(lat) - 1, int(p * len(lat)))] if lat else 0.0

    def summary(self) -> dict:
        with self.lock:
            lat = sorted(self.latencies_ms)
            recent = sorted(self.recent_ms)
            requests, batches = self.requests, self.batches
            rejected, padded = self.rejected, self.padded_slots
            explains = self.explains
        occupancy = 0.0
        if requests + padded:
            occupancy = requests / (requests + padded)
        p50, p99 = self._pct(lat, 0.50), self._pct(lat, 0.99)
        p50_r, p99_r = self._pct(recent, 0.50), self._pct(recent, 0.99)
        return {"requests": requests, "batches": batches,
                "rejected": rejected, "explains": explains,
                "batch_occupancy": round(occupancy, 3),
                "p50_ms": round(p50, 2), "p90_ms":
                    round(self._pct(lat, 0.90), 2),
                "p99_ms": round(p99, 2),
                # drift: last-1k-request percentiles vs the 10k window —
                # positive values mean the server is getting slower
                # (queue growth, thermal, input drift) and alerting should
                # trigger before the long-window percentile moves
                "p50_recent_ms": round(p50_r, 2),
                "p99_recent_ms": round(p99_r, 2),
                "p50_drift_ms": round(p50_r - p50, 2),
                "p99_drift_ms": round(p99_r - p99, 2)}


class _Pending:
    __slots__ = ("image", "event", "result", "error", "t0")

    def __init__(self, image):
        self.image = image
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.t0 = time.perf_counter()


class InferenceServer:
    """Dynamic-batching inference over a single compiled forward.

    ``predict(image)`` is thread-safe and blocking: it enqueues the sample,
    the collector folds it into the next device batch, and the call returns
    ``{"probs": (k,), "classes": (k,)}`` for the top-``k`` classes.
    """

    def __init__(self, params, cfg: ViTConfig, *, batch_size: int = 32,
                 top_k: int = 5, max_delay_ms: float = 5.0, mesh=None,
                 max_queue: int | None = None,
                 temperature: float | None = None,
                 logits_fn=None):
        """``mesh``: a ``jax.sharding.Mesh`` (vitx.parallel.make_mesh) turns
        this into multi-chip serving — batches shard over the ``data`` axis
        (batch_size must be divisible by its size), params replicate, and
        the same collector feeds the whole slice from one host queue.

        ``max_queue``: backpressure bound — beyond this many queued requests
        ``predict`` raises ``ServerOverloaded`` immediately (the HTTP front
        end maps it to 503) instead of growing an unbounded latency tail.
        Default: 8 device batches worth.
        """
        self.cfg = cfg
        self.batch_size = batch_size
        self.top_k = min(top_k, cfg.num_classes)
        self.max_delay_s = max_delay_ms / 1000.0
        self.max_queue = (max_queue if max_queue is not None
                          else 8 * batch_size)
        self.stats = ServerStats()
        self._queue: queue.Queue[_Pending] = queue.Queue(
            maxsize=self.max_queue)
        self._stop = threading.Event()

        # logits_fn: serve a params-baked callable (images -> fp32 logits)
        # instead of the vitx forward — the StableHLO deployment-artifact
        # path (vitx/export.py; load_server routes *.stablehlo here).
        # Single-device: the baked module carries no sharding annotations.
        if logits_fn is not None:
            if mesh is not None:
                raise ValueError("logits_fn (StableHLO artifact) serving "
                                 "is single-device — re-export from the "
                                 "checkpoint for mesh serving")
            fwd = None
        else:
            # int8 .quant.npz artifacts serve by DEQUANTIZING to float at
            # load (vitx/quant.py): a resident-int8 runtime encoder was
            # chip-measured SLOWER than float at every reachable shape —
            # ViT-B b1/4/8 (round 3) and even ViT-L@384 b1/2/4 (round 4:
            # 6.6 vs 4.0 ms at b1), because the float path's fused
            # MHA/MLP kernels fuse the LN/bias/act seams the int8 path
            # pays separately, and no vitx config is HBM-capacity-bound.
            # The runtime path was deleted round 4; artifacts remain the
            # deployment form (4x smaller checkpoints).
            from vitx.nn.vit import forward as fwd
        self._logits_only = logits_fn is not None

        # temperature scaling (vitx/metrics/calibration.py, eval
        # --calibrate reports the fitted T): returned probs become
        # calibrated confidences; argmax/top-k ordering is unchanged
        self.temperature = temperature
        inv_t = 1.0 / temperature if temperature else 1.0

        def run(params, images):
            logits = (logits_fn(images) if logits_fn is not None
                      else fwd(params, images, cfg))
            probs = jax.nn.softmax(logits.astype(jnp.float32) * inv_t,
                                   axis=-1)
            top = jax.lax.top_k(probs, self.top_k)
            return top  # (values (B,k), indices (B,k))

        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape["data"]
            if batch_size % dp:
                raise ValueError(f"batch_size {batch_size} not divisible by "
                                 f"the mesh's data axis ({dp})")
            rep = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, P("data", None, None,
                                                         None))
            self._params = jax.device_put(params, rep)
            self._run = jax.jit(run, in_shardings=(rep,
                                                   self._batch_sharding))
        else:
            self._params = jax.device_put(params)
            self._run = jax.jit(run)
        # warmup compile at the serving shape — first real request must not
        # eat the compile
        dummy = jnp.zeros((batch_size, cfg.image_size, cfg.image_size,
                           cfg.num_channels), cfg.cdtype())
        jax.block_until_ready(self._run(self._params, dummy))

        self._explain_run = {}          # compiled per explain method
        self._explain_lock = threading.Lock()
        # explain() backpressure: it bypasses the batching queue, so bound
        # its own concurrency — beyond this many in-flight explain requests
        # the call 503s instead of stacking threads on _explain_lock
        self._explain_slots = threading.Semaphore(4)

        self._thread = threading.Thread(target=self._collector, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def explain(self, image: np.ndarray, *, method: str = "rollout",
                class_idx: int | None = None) -> dict:
        """Single-image explainability: top-k classes + a patch-grid heatmap.

        ``method="rollout"``: class-agnostic attention rollout
        (``forward_with_rollout`` — where CLS looked). ``method="gradcam"``:
        class-SPECIFIC Grad-CAM (``vitx/nn/saliency.py``) for ``class_idx``
        (default: the predicted class). Runs OUTSIDE the batching path on
        lazily-compiled batch-1 programs (explainability is a debug/
        inspection surface, not a throughput one — the first call per
        method pays its compile, later calls are serialized by a lock with
        a small concurrency bound). Response: predict's fields plus
        ``heatmap`` ((grid*grid,) patch-raster weights), ``grid`` and
        ``method``. The HTTP front end maps this to ``POST
        /explain[?method=gradcam&class=K]``.
        """
        if self._logits_only:
            raise RuntimeError(
                "explain() needs the vitx forward; a StableHLO artifact "
                "bakes only the logits program — serve the checkpoint "
                "itself to use /explain")
        if method not in ("rollout", "gradcam"):
            raise ValueError(f"unknown explain method {method!r} "
                             "(rollout or gradcam)")
        if class_idx is not None:
            if method != "gradcam":
                raise ValueError("class selection needs method='gradcam' "
                                 "(rollout is class-agnostic)")
            if not 0 <= int(class_idx) < self.cfg.num_classes:
                raise ValueError(f"class_idx {class_idx} out of range "
                                 f"[0, {self.cfg.num_classes})")
        expect = (self.cfg.image_size, self.cfg.image_size,
                  self.cfg.num_channels)
        if tuple(image.shape) != expect:
            raise ValueError(f"expected image shape {expect}, "
                             f"got {tuple(image.shape)}")
        if not self._explain_slots.acquire(blocking=False):
            with self.stats.lock:
                self.stats.rejected += 1
            raise ServerOverloaded("too many in-flight explain requests")
        try:
            inv_t = 1.0 / self.temperature if self.temperature else 1.0
            key = (method, class_idx is not None)
            with self._explain_lock:
                if key not in self._explain_run:
                    self._explain_run[key] = jax.jit(
                        self._make_explain_fn(method, class_idx is not None,
                                              inv_t))
                x = jnp.asarray(np.asarray(image, np.float32)[None],
                                self.cfg.cdtype())
                args = (self._params, x)
                if class_idx is not None:
                    args += (jnp.full((1,), int(class_idx), jnp.int32),)
                values, indices, heat = jax.device_get(
                    self._explain_run[key](*args))
        finally:
            self._explain_slots.release()
        with self.stats.lock:
            self.stats.explains += 1
        return {"probs": values[0].tolist(),
                "classes": indices[0].tolist(),
                "heatmap": heat[0].astype(np.float32).tolist(),
                "method": method,
                "grid": self.cfg.grid_size}

    def _make_explain_fn(self, method: str, with_class: bool, inv_t: float):
        def _topk(logits):
            probs = jax.nn.softmax(logits.astype(jnp.float32) * inv_t,
                                   axis=-1)
            return jax.lax.top_k(probs, self.top_k)

        if method == "rollout":
            from vitx.nn.vit import forward_with_rollout

            def run(params, images):
                logits, roll = forward_with_rollout(params, images, self.cfg)
                values, indices = _topk(logits)
                return values, indices, roll

            return run
        from vitx.nn.saliency import grad_cam

        if with_class:
            def run(params, images, idx):
                cam, logits = grad_cam(params, images, self.cfg,
                                       class_idx=idx)
                values, indices = _topk(logits)
                return values, indices, cam
        else:
            def run(params, images):
                cam, logits = grad_cam(params, images, self.cfg)
                values, indices = _topk(logits)
                return values, indices, cam
        return run

    # ------------------------------------------------------------------
    def predict(self, image: np.ndarray, timeout: float = 30.0) -> dict:
        """image: (H, W, C) float array in model input scale."""
        expect = (self.cfg.image_size, self.cfg.image_size,
                  self.cfg.num_channels)
        if tuple(image.shape) != expect:
            raise ValueError(f"expected image shape {expect}, "
                             f"got {tuple(image.shape)}")
        item = _Pending(np.asarray(image, np.float32))
        try:
            self._queue.put_nowait(item)
        except queue.Full:
            with self.stats.lock:
                self.stats.rejected += 1
            raise ServerOverloaded(
                f"queue full ({self.max_queue} pending)") from None
        if not item.event.wait(timeout):
            raise TimeoutError("inference request timed out")
        if item.error is not None:
            raise RuntimeError(f"inference failed: {item.error}")
        return item.result

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------
    def _collector(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_delay_s
            while len(batch) < self.batch_size:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._run_batch(batch)
            except Exception as e:   # noqa: BLE001 — propagate to waiters
                for item in batch:
                    item.error = e
                    item.event.set()

    def _run_batch(self, batch):
        n = len(batch)
        pad = self.batch_size - n
        images = np.stack([b.image for b in batch])
        if pad:
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], np.float32)])
        device_images = jnp.asarray(images, self.cfg.cdtype())
        if self._batch_sharding is not None:
            device_images = jax.device_put(device_images,
                                           self._batch_sharding)
        values, indices = self._run(self._params, device_images)
        # fetch the FULL (batch, k) outputs and slice on host: a device-side
        # values[:n] is a fresh XLA slice op per distinct n — dynamic batch
        # occupancy would compile one executable per fill level (measured
        # 22 s per compile through the remote-TPU tunnel)
        values = np.asarray(values)[:n]
        indices = np.asarray(indices)[:n]
        now = time.perf_counter()
        with self.stats.lock:
            for item in batch:
                ms = (now - item.t0) * 1000.0
                self.stats.latencies_ms.append(ms)
                self.stats.recent_ms.append(ms)
            self.stats.requests += n
            self.stats.batches += 1
            self.stats.padded_slots += pad
        for i, item in enumerate(batch):
            item.result = {"probs": values[i].tolist(),
                           "classes": indices[i].tolist()}
            item.event.set()


def load_server(checkpoint, cfg: ViTConfig, **kw) -> InferenceServer:
    """Build a server from a checkpoint path: ``{epoch}.ckpt`` / orbax dir
    (vitx format, EMA-aware), a ``.quant.npz`` int8 artifact, a reference
    ``.pt``, a ``.stablehlo`` deployment artifact (params baked in; served
    through its compiled call), or ``None`` for fresh params — one shared
    loading rule with the eval/probe CLIs
    (vitx/train/checkpoint.py::load_artifact_params)."""
    if checkpoint is not None and str(checkpoint).endswith(".stablehlo"):
        from vitx.export import load_exported
        from vitx.export import peek_meta as peek_export_meta

        meta = peek_export_meta(checkpoint) or {}
        if meta.get("with_softmax"):
            raise ValueError(
                "this artifact was exported with_softmax=True (it returns "
                "probabilities); export logits for serving — the server "
                "applies softmax/temperature itself")
        pinned = meta.get("batch_size")
        if pinned is not None and pinned != kw.get("batch_size", 32):
            raise ValueError(
                f"artifact pins batch_size={pinned} (ToMe export); pass "
                f"batch_size={pinned} to serve it")
        exported = load_exported(checkpoint)
        return InferenceServer({}, cfg, logits_fn=exported.call, **kw)
    if checkpoint is None:
        from vitx.nn.vit import init_params

        params = init_params(jax.random.PRNGKey(0), cfg)
    else:
        from vitx.train.checkpoint import load_artifact_params

        params, _ = load_artifact_params(checkpoint, cfg)
    return InferenceServer(params, cfg, **kw)
