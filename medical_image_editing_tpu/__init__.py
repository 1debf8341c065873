"""medical_image_editing_tpu — TPU-native (JAX/XLA/Pallas) framework for
self-supervised segmentation-based medical image editing.

A ground-up rebuild of the capabilities of the MICCAI'23 system
"Towards AI-driven radiology education" (reference: Kaz-K/medical-image-editing),
designed TPU-first:

- NHWC layouts, bfloat16-friendly compute, static shapes under `jax.jit`.
- Data parallelism via `jax.sharding.Mesh` + `shard_map`; codebook EMA statistics
  and sync-batch-norm stats reduced with `jax.lax.psum` over the `data` axis.
- Vector-quantization nearest-neighbour assignment as an MXU matmul (XLA path)
  plus a fused Pallas kernel (assign + EMA statistics in one pass).
- Orbax checkpointing; JSON-config + `run_vqwnet`/`run_recon` CLI surface
  compatible with the reference.

Subpackages:
  ops       pure functional numerics (windowing, VQ, warps, losses, metrics, ...)
  models    Flax modules (UNetEncoder/UNetDecoder, discriminators, VQGAN, ...)
  parallel  mesh construction and collective helpers
  data      datasets, host loader with device prefetch, preprocessing
  train     train states + jitted step functions (trainers)
  utils     config, logging, checkpointing, imaging, NIfTI I/O
  cli       run_vqwnet / run_recon entry points
"""

__version__ = "0.1.0"
