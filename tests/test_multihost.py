"""TRUE multi-process multi-host input sharding (VERDICT r2 item 8).

Spawns 2 coordinated ``jax.distributed`` processes, each owning 4 virtual
CPU devices, and exercises ``shard_host_batch``'s
``make_array_from_process_local_data`` branch (vitx/parallel/sharded.py)
with per-host DISJOINT data — the code path a real multi-host pod runs,
which the single-process suite can only reduce to ``shard_batch``.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
# the environment's TPU-tunnel plugin overrides JAX_PLATFORMS; the config
# flag wins (same trick as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

import numpy as np
import jax.numpy as jnp
from vitx.parallel import make_mesh
from vitx.parallel.sharded import shard_host_batch

mesh = make_mesh(dp=8, tp=1)

# global batch of 16; host p loads ONLY its disjoint half (the documented
# dataset[process_index::process_count] recipe, here a contiguous split)
full_img = np.arange(16 * 4 * 4 * 3, dtype=np.float32).reshape(16, 4, 4, 3)
full_lab = np.arange(16, dtype=np.int32)
local = {"image": full_img[pid * 8:(pid + 1) * 8],
         "label": full_lab[pid * 8:(pid + 1) * 8]}
batch = shard_host_batch(local, mesh)

# the assembled arrays are GLOBAL: full logical shape, sharded over all 8
# devices across both processes
assert batch["image"].shape == (16, 4, 4, 3), batch["image"].shape
assert len(batch["image"].sharding.device_set) == 8

# an SPMD reduction sees every host's rows exactly once
s_img, s_lab = jax.jit(
    lambda b: (jnp.sum(b["image"]), jnp.sum(b["label"])))(batch)
np.testing.assert_allclose(float(s_img), full_img.sum())
assert int(s_lab) == int(full_lab.sum())

# end-to-end: one SPMD train step over the host-sharded batch — the loss is
# identical on both processes (replicated output) and finite
from vitx import ViTConfig
from vitx.parallel import make_parallel_train_step
from vitx.parallel.sharded import place_state
from vitx.train import create_train_state
from vitx.train.step import make_optimizer

cfg = ViTConfig(image_size=4, patch_size=2, num_classes=4, embed_dim=16,
                depth=1, num_heads=2, compute_dtype="float32")
opt = make_optimizer(lr=1e-3)
state = place_state(create_train_state(jax.random.PRNGKey(0), cfg, opt),
                    cfg, mesh)
step = make_parallel_train_step(cfg, opt, mesh)
state, m = step(state, shard_host_batch(
    {"image": local["image"], "label": local["label"] % 4}, mesh), None)
loss = float(m["loss"])
assert np.isfinite(loss)
print(f"OK pid={pid} loss={loss:.6f}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("VITX_TEST_TPU"),
                    reason="CPU-process simulation; skip on the real chip")
def test_two_process_host_sharded_input(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.getcwd()] + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [subprocess.Popen(
        [sys.executable, str(worker), port, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-4000:]}"
        assert f"OK pid={pid}" in out
    # both processes computed the SAME replicated loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)
