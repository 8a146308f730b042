"""Forward-only synthesis A/B: pad_dilate vs polyphase up-conv.

The polyphase form wins the BACKWARD (transpose stays at low resolution;
.bench/up_conv_ab.py) but its output interleave (stack/transpose at full
output size) is suspected to cost on the pure forward — the path serving
and the synthesis-throughput bench run. Times batch-64 and batch-4
FFHQ-256 synthesis forward under both impls, probe-bracketed.
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
import time

import numpy as np
import jax.numpy as jnp

import stylemc_tpu.ops.conv2d_resample  # noqa: F401
cr = sys.modules["stylemc_tpu.ops.conv2d_resample"]
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]

with jax.default_device(cpu):
    import dataclasses
    cfg = GeneratorConfig(img_resolution=256)
    cfg_bf16 = dataclasses.replace(cfg, low_precision_dtype="bfloat16")
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (64, cfg.z_dim))
    styles = w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7))
to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
params, styles = to_dev(params), to_dev(styles)


def chained_ms(fn, s, iters=20):
    x = s
    # warm
    for _ in range(3):
        x = x + 0 * jnp.mean(fn(x))
    float(jnp.sum(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = x + 0 * jnp.mean(fn(x))
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters * 1e3


results = {}
for impl in ("pad_dilate", "polyphase", "pad_dilate", "polyphase"):
    cr.UP_CONV_IMPL = impl
    fn64 = jax.jit(lambda s: synthesis(params, cfg_bf16, s,
                                       noise_mode="const"))
    fn4 = jax.jit(lambda s: synthesis(params, cfg, s, noise_mode="const"))
    ms64 = chained_ms(fn64, styles)
    ms4 = chained_ms(fn4, styles[:4], iters=30)
    print(f"{impl:12s} batch64 bf16 fwd {ms64:7.2f} ms  "
          f"batch4 fp32 fwd {ms4:6.2f} ms", flush=True)
    results.setdefault(impl, []).append((ms64, ms4))

for impl, rs in results.items():
    b64 = min(r[0] for r in rs)
    b4 = min(r[1] for r in rs)
    print(f"BEST {impl:12s} batch64 {b64:7.2f} ms ({64e3/b64:.0f} imgs/s)  "
          f"batch4 {b4:6.2f} ms")
cr.UP_CONV_IMPL = "polyphase"
