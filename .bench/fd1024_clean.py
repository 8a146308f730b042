"""Probe-bracketed 1024px find_direction steady-state number (VERDICT r3
item 6: the round-3 1024 validation recorded only contended wall-clock).

Workload: the reference configuration at 1024px — batch 4, 4 epochs over
a reduced 16-seed set (until_k=8 synthesis; per-step cost is
seed-count-independent, and 129 seeds only lengthen the identical steps),
`--bf16 --perception_bf16 --remat`, steps_per_dispatch=8.

Probes: the same chained batch-64 FFHQ-256 synthesis probe bench.py uses
(8 iterations; clean band ≤66 ms), run before and after the measured
pass. Discard the run if either probe is dirty.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, inference_cfg, mapping, w_to_s,
    synthesis)
from stylemc_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from stylemc_tpu.models.arcface import init_backbone_params
from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
from stylemc_tpu.train.find_direction import (FindDirectionConfig,
                                              find_direction)

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]

with jax.default_device(cpu):
    # probe network: FFHQ-256 (matches bench.py's probe graph family)
    p_cfg = inference_cfg(GeneratorConfig(
        img_resolution=256, low_precision_dtype="bfloat16"))
    p_params = init_generator_params(jax.random.PRNGKey(0), p_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (64, p_cfg.z_dim))
    p_styles = w_to_s(p_params, p_cfg, mapping(p_params, p_cfg, z,
                                               truncation_psi=0.7))

to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
p_params = to_dev(p_params)
p_styles = to_dev(p_styles)
probe_fn = jax.jit(lambda s: synthesis(p_params, p_cfg, s,
                                       noise_mode="const"))


def probe_ms(iters=8):
    x = p_styles
    # re-warm + discard one chained pass first: the first probe dispatch
    # after a large foreign workload pays a one-time executable-reload /
    # HBM-churn cost that is NOT contention (observed: 232-238 ms "pre"
    # probes bracketing a visibly clean 2.58 s loop, twice)
    y = x + 0 * jnp.mean(probe_fn(x))
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = x + 0 * jnp.mean(probe_fn(x))
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    with jax.default_device(cpu):
        cfg = GeneratorConfig(img_resolution=1024, remat=True,
                              low_precision_dtype="bfloat16")
        params = init_generator_params(jax.random.PRNGKey(0), cfg)
        clip_models = {
            name: (CLIP_CONFIGS[name],
                   init_clip_params(jax.random.PRNGKey(i + 10),
                                    CLIP_CONFIGS[name]))
            for i, name in enumerate(("ViT-B/32", "ViT-B/16"))
        }
        arcface = init_backbone_params(jax.random.PRNGKey(20))
        z = jax.random.normal(jax.random.PRNGKey(2), (16, cfg.z_dim))
        styles = w_to_s(params, cfg, mapping(params, cfg, z,
                                             truncation_psi=0.7))
    params = to_dev(params)
    arcface = to_dev(arcface)
    clip_models = {k: (c, to_dev(p)) for k, (c, p) in clip_models.items()}
    styles = np.asarray(styles)

    fdc = FindDirectionConfig(resolution=1024, batch_size=4, n_epochs=4,
                              clip_type="double", steps_per_dispatch=8,
                              perception_dtype="bfloat16")

    def run(st):
        t0 = time.perf_counter()
        d, info = find_direction(params, cfg, st, clip_models, arcface,
                                 fdc, tokenizer=FallbackTokenizer())
        float(jnp.sum(d))              # REAL drain (block_until_ready is
        return time.perf_counter() - t0, info  # launch-bound on axon)

    # two workload lengths (16 vs 48 seeds → 16 vs 48 steps, same graphs):
    # the slope cancels the per-call constant (trace-cache hit, executable
    # load, feature precompute) that a single short run folds into ms/step
    styles48 = np.concatenate([styles, styles, styles], axis=0)
    wall, info = run(styles)           # cold: compile
    print(f"cold: {wall:.1f}s, steps {info['iterations']}", flush=True)
    run(styles48)                      # warm both shapes' precompute
    pre = probe_ms()
    wall16, info16 = run(styles)
    wall48, info48 = run(styles48)
    post = probe_ms()
    s16, s48 = info16["iterations"], info48["iterations"]
    slope = 1e3 * (info48["time"] - info16["time"]) / (s48 - s16)
    print(f"probe before/after: {pre:.1f} / {post:.1f} ms "
          f"(clean band <=66)", flush=True)
    print(f"1024px warm: loop16 {info16['time']:.2f}s/{s16} steps "
          f"({1e3 * info16['time'] / s16:.0f} ms/step incl. call const), "
          f"loop48 {info48['time']:.2f}s/{s48} steps "
          f"({1e3 * info48['time'] / s48:.0f} ms/step)", flush=True)
    print(f"steady (slope, call-const cancelled): {slope:.1f} ms/step",
          flush=True)
    print(f"clean: {bool(pre <= 66 and post <= 66)}")


if __name__ == "__main__":
    main()
