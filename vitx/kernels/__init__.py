"""Pallas TPU kernels — the native kernel layer.

Stands in for the reference's hand-written C implementation
(``csrc/vit.c``): where the reference hand-schedules patch-embed and
multi-head attention with OpenMP loops, this package provides MXU-tiled
Pallas kernels (flash attention, fused patch-embed) with jnp fallbacks for
CPU/interpret execution.
"""
