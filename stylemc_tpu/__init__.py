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


def _enable_persistent_compilation_cache():
    """Remote-TPU compiles are expensive (minutes per new graph over the
    tunnel); cache compiled executables on disk by default. Opt out with
    STYLEMC_NO_COMPILE_CACHE=1 or by pre-setting JAX_COMPILATION_CACHE_DIR."""
    import os

    if os.environ.get("STYLEMC_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(os.path.expanduser("~"), ".cache",
                             "stylemc_tpu", "jax_cache"))
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_persistent_compilation_cache()
