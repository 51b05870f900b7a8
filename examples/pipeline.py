"""End-to-end pipeline: MAE pretrain -> fine-tune -> eval -> serve.

Chains the four CLIs exactly as a user would, on synthetic data (no
downloads), and queries the live server at the end. Run from the repo root:

    python examples/pipeline.py [--workdir DIR]

The committed `examples/PIPELINE_RUN.md` holds a recorded run.
"""

from __future__ import annotations

import argparse
import io
import json
import pathlib
import sys
import tempfile
import time
import urllib.request

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run(workdir: str | None = None):
    t_all = time.time()
    wd = pathlib.Path(workdir or tempfile.mkdtemp(prefix="vitx_pipeline_"))
    wd.mkdir(parents=True, exist_ok=True)
    log = []

    def step(name, fn):
        t0 = time.time()
        out = fn()
        log.append((name, time.time() - t0, out))
        print(f"[{name}] done in {time.time() - t0:.1f}s -> {out}")
        return out

    # 1. MAE pretrain + export a fine-tune-ready encoder
    from vitx.cli.pretrain import main as pretrain_main

    init_npz = wd / "vit_init.npz"
    step("pretrain", lambda: pretrain_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "1",
        "--batch-size", "64", "--decoder-dim", "96", "--decoder-depth", "2",
        "--decoder-heads", "3", "--checkpoint-dir", str(wd / "mae"),
        "--export-vit", str(init_npz)]))

    # 2. fine-tune the pretrained encoder (cosine schedule + EMA)
    from vitx.cli.train import main as train_main

    step("finetune", lambda: train_main([
        "--preset", "tiny", "--data", "synthetic", "--epochs", "2",
        "--batch-size", "64", "--lr", "3e-3", "--schedule", "cosine",
        "--warmup-steps", "10", "--ema-decay", "0.99",
        "--init-from", str(init_npz),
        "--checkpoint-dir", str(wd / "ckpt")]))

    # 3. eval with per-example predictions
    from vitx.cli.eval import main as eval_main

    preds = wd / "preds.jsonl"
    step("eval", lambda: eval_main([
        "--preset", "tiny", "--data", "synthetic",
        "--checkpoint", str(wd / "ckpt"), "--predict", str(preds)]))
    n_preds = len(preds.read_text().splitlines())
    print(f"[eval] wrote {n_preds} per-example predictions")

    # 4. serve the checkpoint and query it over HTTP — the checkpoint is
    # self-describing (Trainer stores the exact config in meta)
    from vitx.cli.serve import serve_in_thread
    from vitx.core.config import ViTConfig
    from vitx.serve import load_server
    from vitx.train.checkpoint import peek_meta

    cfg = ViTConfig.from_json(json.dumps(peek_meta(wd / "ckpt")["config"]))
    server = load_server(wd / "ckpt", cfg, batch_size=8, top_k=2)
    httpd, _ = serve_in_thread(server)
    try:
        base = f"http://127.0.0.1:{httpd.server_port}"
        img = np.random.default_rng(0).normal(
            size=(cfg.image_size, cfg.image_size, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(base + "/predict", data=buf.getvalue(),
                                     method="POST")
        answer = json.loads(urllib.request.urlopen(req).read())
        stats = json.loads(urllib.request.urlopen(base + "/stats").read())
        step("serve", lambda: {"predict": answer, "stats": stats})
    finally:
        httpd.shutdown()
        server.close()

    print(f"pipeline complete in {time.time() - t_all:.1f}s "
          f"(workdir: {wd})")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    sys.exit(run(p.parse_args().workdir))
