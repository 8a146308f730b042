"""stylemc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-guided StyleGAN2
editing framework with the capability surface of thepowerfuldeez/stylemc.

Layers (mirroring SURVEY.md §1, redesigned TPU-first):
  ops/       resampling + activation primitives (XLA formulations + Pallas kernels)
  models/    StyleGAN2-ADA generator w/ S-space entry points, CLIP, ArcFace,
             MobileNet landmarks, MTCNN, DeepLab, e4e inversion stack
  losses/    CLIP (StyleMC + NADA), ID, landmarks, L2 — pure functions
  train/     find_direction + latent-mapper optimizers (jit + shard_map DP)
  parallel/  mesh/sharding helpers, distributed stat collection
  io/        safe NVIDIA .pkl ingestion (no exec), npz/pth interop
  metrics/   FID / KID / IS / PPL / P&R
  cli/       the reference's CLI surface (generate_w, w_s_converter,
             find_direction, generate_fromS, train_latent_mapper, ...)
"""

__version__ = "0.1.0"
