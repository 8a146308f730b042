"""Warm find_direction wall-clock vs steps_per_dispatch (129 seeds, 256px).

With per-call retracing gone the warm loop is dispatch-latency bound;
this sweeps the lax.scan chunk size K to find the knee. Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python .bench/k_dispatch_sweep.py
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses
import numpy as np
import jax.numpy as jnp

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)
from stylemc_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from stylemc_tpu.models.arcface import init_backbone_params
from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
from stylemc_tpu.train.find_direction import FindDirectionConfig, find_direction

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]

with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    clip_models = {
        n: (CLIP_CONFIGS[n],
            init_clip_params(jax.random.PRNGKey(i + 10), CLIP_CONFIGS[n]))
        for i, n in enumerate(("ViT-B/32", "ViT-B/16"))
    }
    arcface = init_backbone_params(jax.random.PRNGKey(20))
    z = jax.random.normal(jax.random.PRNGKey(2), (129, cfg.z_dim))
    styles = w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7))

to_dev = lambda t: jax.device_put(jax.tree_util.tree_map(np.asarray, t), dev)  # noqa: E731
params, arcface = to_dev(params), to_dev(arcface)
clip_models = {k: (c, to_dev(p)) for k, (c, p) in clip_models.items()}
styles_np = np.asarray(styles)
tok = FallbackTokenizer()

# 132 total steps (129 seeds / batch 4 → 33 per epoch × 4 epochs)
for k in (1, 10, 33, 66, 132):
    fdc = FindDirectionConfig(resolution=256, batch_size=4, n_epochs=4,
                              clip_type="double", steps_per_dispatch=k)

    def run():
        t0 = time.perf_counter()
        d, info = find_direction(params, cfg, styles_np, clip_models,
                                 arcface, fdc, tokenizer=tok)
        jax.block_until_ready(d)
        return time.perf_counter() - t0, info

    run()                       # compile / cache warm
    best = None
    for _ in range(2):          # two warm passes; keep the faster
        total, info = run()
        if best is None or info["time"] < best[0]:
            best = (info["time"], total, info["iterations"])
    t, total, steps = best
    print(f"K={k:3d}: loop {t:6.2f} s ({1e3 * t / steps:5.1f} ms/step), "
          f"total {total:6.2f} s, dispatches {steps // k}")
