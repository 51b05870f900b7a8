"""Binary param/tensor exchange with the C oracle (``csrc/vitc.c``).

Writes the fixed little-endian layout vitc reads: an 11-int32 header
(magic 'VITC', version, image, patch, channels, classes, embed, depth,
heads, mlp_ratio, act) followed by fp32 params in carve order (see
vitc.c:carve). The wqkv pytree leaf (L, E, 3, H, D) flattens to the
(E, 3*H*D)-per-layer row-major matmul layout vitc expects, i.e. its natural
C order — no transpose needed.
"""

from __future__ import annotations

import struct
import subprocess

import numpy as np

from vitx.core.config import ViTConfig

MAGIC = 0x43544956
_ACT = {"gelu": 0, "relu": 1}


def write_model_bin(path, params, cfg: ViTConfig):
    if cfg.head_type != "reference":
        raise ValueError("vitc implements the reference head only")
    if cfg.qkv_bias:
        raise ValueError("vitc has no qkv bias")
    if cfg.final_norm:
        raise ValueError("vitc has no final norm")
    if cfg.mlp_ratio != 4:
        raise ValueError("vitc head assumes scratch >= 8E; keep mlp_ratio=4")
    if not cfg.proj_bias:
        raise ValueError("vitc's attention always adds a projection bias")
    if cfg.num_registers:
        raise ValueError("vitc has no register tokens")
    if cfg.qk_norm:
        raise ValueError("vitc has no QK-Norm")
    if cfg.pos_embed != "learned":
        raise ValueError("vitc expects a learned positional table; "
                         "sincos2d/rope models have no pos_embed leaf")
    if cfg.mlp_act not in _ACT:
        raise ValueError(f"vitc implements {sorted(_ACT)} MLPs only, "
                         f"not {cfg.mlp_act!r}")

    def f32(x):
        return np.ascontiguousarray(np.asarray(x), dtype="<f4")

    b = params["blocks"]
    order = [
        params["patch_embed"]["kernel"], params["patch_embed"]["bias"],
        params["cls_token"].reshape(-1), params["pos_embed"].reshape(
            cfg.seq_len, cfg.embed_dim),
        b["ln1_scale"], b["ln1_bias"],
        b["wqkv"], b["wo"], b["bo"],
        b["ln2_scale"], b["ln2_bias"],
        b["w1"], b["b1"], b["w2"], b["b2"],
        params["head"]["w1"], params["head"]["b1"],
        params["head"]["ln_scale"], params["head"]["ln_bias"],
        params["head"]["w2"], params["head"]["b2"],
    ]
    with open(path, "wb") as f:
        f.write(struct.pack(
            "<11i", MAGIC, 1, cfg.image_size, cfg.patch_size,
            cfg.num_channels, cfg.num_classes, cfg.embed_dim, cfg.depth,
            cfg.num_heads, cfg.mlp_ratio, _ACT[cfg.mlp_act]))
        for t in order:
            f.write(f32(t).tobytes())


def write_input_bin(path, images):
    """images: (B, H, W, C) float array, already preprocessed."""
    images = np.ascontiguousarray(np.asarray(images), dtype="<f4")
    with open(path, "wb") as f:
        f.write(struct.pack("<i", images.shape[0]))
        f.write(images.tobytes())


def read_output_bin(path, batch, classes):
    return np.fromfile(path, dtype="<f4").reshape(batch, classes)


def write_train_bin(path, images, labels):
    """Training batch for trainc: int32 B, int32 labels, fp32 images NHWC."""
    images = np.ascontiguousarray(np.asarray(images), dtype="<f4")
    labels = np.ascontiguousarray(np.asarray(labels), dtype="<i4")
    with open(path, "wb") as f:
        f.write(struct.pack("<i", images.shape[0]))
        f.write(labels.tobytes())
        f.write(images.tobytes())


def read_model_bin(path, cfg: ViTConfig):
    """model.bin -> flat fp32 param vector (after the 11-int header)."""
    raw = np.fromfile(path, dtype="<f4")
    return raw[11:]   # header is 11 int32 == 11 float32 slots


def build_vitc(src, out, *, openmp: bool = False):
    """Compile the C oracle. Returns the binary path."""
    cmd = ["gcc", "-O2", "-std=c99", "-o", str(out), str(src), "-lm"]
    if openmp:
        cmd[1:1] = ["-fopenmp", "-DOMP"]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def run_vitc(binary, model_bin, input_bin, output_bin):
    return subprocess.run([str(binary), str(model_bin), str(input_bin),
                           str(output_bin)], check=True, capture_output=True,
                          text=True).stdout
