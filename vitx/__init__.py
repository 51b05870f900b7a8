"""vitx — a TPU-native Vision Transformer framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design (NOT a port) of the capabilities of the reference
``SiddhantSKarki/Vision-Transformer`` project:

- ViT classifier: patch embedding, learned CLS + positional embeddings,
  pre-LN multi-head self-attention encoder, MLP classification head
  (reference: ``src/VisionTransformer/{vit.py,transformer.py}``).
- Per-head attention-weight extraction and attention rollout as a public API
  (reference: ``src/VisionTransformer/transformer.py:39,48``, ``src/vit.ipynb``).
- Folder-structured (brain-tumor style) and CIFAR-10 data pipelines with
  TPU-resident preprocessing (reference: ``src/BrainTumorDataset.py``).
- Epoch train/eval loop, AdamW, per-epoch checkpoints with resume-from-latest,
  TensorBoard scalar logging, sklearn-parity metrics (reference: ``src/train.py``).
- A native kernel layer: Pallas flash attention, fused patch-embed
  (standing in for the reference's hand-written C kernels, ``csrc/vit.c``).
- Data-parallel (and head-sharded tensor-parallel) scaling over a
  ``jax.sharding.Mesh`` — the TPU-native answer to the reference's single-GPU loop.
"""

from vitx.core.config import ViTConfig, PRESETS, get_config
from vitx.nn.vit import (init_params, forward, forward_features,
                         forward_heads, forward_with_attn,
                         forward_with_rollout)
from vitx.nn.rollout import attention_rollout
from vitx.nn.saliency import grad_cam
from vitx.nn.mae import (MAEConfig, init_mae_params, mae_forward,
                         mae_to_vit_params)

__version__ = "0.1.0"

__all__ = [
    "ViTConfig",
    "PRESETS",
    "get_config",
    "init_params",
    "forward",
    "forward_features",
    "forward_heads",
    "forward_with_attn",
    "forward_with_rollout",
    "attention_rollout",
    "grad_cam",
    "MAEConfig",
    "init_mae_params",
    "mae_forward",
    "mae_to_vit_params",
    "__version__",
]
