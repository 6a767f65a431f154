"""octic_vits_tpu — TPU-native octic (D8-equivariant) Vision Transformers.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
reference `davnords/octic-vits` codebase (arXiv:2505.15441): D8-equivariant
ViT layers, hybrid/invariant model families, DeiT III supervised and DINOv2
self-supervised training recipes, and the associated evaluation suites —
built for TPU meshes (SPMD via jax.sharding / shard_map) rather than
CUDA/NCCL.
"""

__version__ = "0.1.0"
