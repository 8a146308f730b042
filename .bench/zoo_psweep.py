"""Direction-zoo P-sweep: on-chip wall-clock of optimize_batch at
P = 1/2/4/8 prompts (VERDICT r4 item 4).

Substantiates docs/performance.md's "a direction zoo trains in ~the
wall-clock of one direction until the chip saturates": the reference
workload (129 seeds, batch 4, 256px, 4 epochs — README.md:24-26) is
occupancy-bound at batch 4, so the prompt axis is the claimed way to fill
the chip. Each P's measured pass is probe-bracketed (same chained
batch-64 synthesis probe as bench.py; clean band <=66 ms).
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
from stylemc_tpu.train.find_direction import (DirectionEngine,
                                              FindDirectionConfig)

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]

PROMPTS = ["a photo of a face of a feminine woman with no makeup",
           "a face with a big smile",
           "an old face with wrinkles",
           "a face with curly hair",
           "a face with blue eyes",
           "a photo of a serious face",
           "a face with a beard",
           "a young face with freckles"]

with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    clip_models = {
        name: (CLIP_CONFIGS[name],
               init_clip_params(jax.random.PRNGKey(i + 10),
                                CLIP_CONFIGS[name]))
        for i, name in enumerate(("ViT-B/32", "ViT-B/16"))
    }
    arcface = init_backbone_params(jax.random.PRNGKey(20))
    z = jax.random.normal(jax.random.PRNGKey(2), (129, cfg.z_dim))
    styles = w_to_s(params, cfg, mapping(params, cfg, z,
                                         truncation_psi=0.7))
    # probe graph (bench.py's): bf16 batch-64 FFHQ-256 synthesis
    p_cfg = inference_cfg(GeneratorConfig(img_resolution=256,
                                          low_precision_dtype="bfloat16"))
    p_params = init_generator_params(jax.random.PRNGKey(0), p_cfg)
    pz = jax.random.normal(jax.random.PRNGKey(1), (64, p_cfg.z_dim))
    p_styles = w_to_s(p_params, p_cfg, mapping(p_params, p_cfg, pz,
                                               truncation_psi=0.7))

to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
params, arcface = to_dev(params), to_dev(arcface)
clip_models = {k: (c, to_dev(p)) for k, (c, p) in clip_models.items()}
p_params, p_styles = to_dev(p_params), to_dev(p_styles)
probe_fn = jax.jit(lambda s: synthesis(p_params, p_cfg, s,
                                       noise_mode="const"))
np.asarray(probe_fn(p_styles))


def probe_ms(iters=8):
    x = p_styles
    t0 = time.perf_counter()
    for _ in range(iters):
        x = x + 0 * jnp.mean(probe_fn(x))
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters * 1e3


fdc = FindDirectionConfig(resolution=256, batch_size=4, n_epochs=4,
                          clip_type="double")
eng = DirectionEngine(params, cfg, np.asarray(styles), clip_models,
                      arcface, fdc, tokenizer=FallbackTokenizer())

results = {}
for P in (1, 2, 4, 8):
    prompts = PROMPTS[:P]
    t0 = time.perf_counter()
    eng.optimize_batch(prompts)          # compile for this P
    print(f"P={P}: cold {time.perf_counter() - t0:.1f}s", flush=True)
    pre = probe_ms()
    t0 = time.perf_counter()
    dirs, info = eng.optimize_batch(prompts)
    wall = time.perf_counter() - t0
    post = probe_ms()
    results[P] = (wall, info.get("steady_ms_per_step"), pre, post)
    print(f"P={P}: warm loop {info['time']:.2f}s wall {wall:.2f}s "
          f"steady {info.get('steady_ms_per_step', float('nan')):.1f} "
          f"ms/step  probes {pre:.1f}/{post:.1f} ms "
          f"(clean={pre <= 66 and post <= 66})", flush=True)

print("\nP  wall_s  steady_ms/step  per-direction_s  probes")
for P, (wall, steady, pre, post) in results.items():
    print(f"{P}  {wall:6.2f}  {steady:8.1f}  {wall / P:8.2f}  "
          f"{pre:.0f}/{post:.0f}")
