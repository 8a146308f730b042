"""Wait for an uncontended chip window (chained-synthesis probe), then run
the find_direction bench. See docs/performance.md for the sync rationale."""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses, time
import numpy as np, jax.numpy as jnp
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)

cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
    cfg = dataclasses.replace(GeneratorConfig(img_resolution=256),
                              low_precision_dtype="bfloat16")
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.z_dim))
    s = np.asarray(w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7)))
dev = jax.devices()[0]
dparams = jax.device_put(jax.tree_util.tree_map(np.asarray, params), dev)
ds = jax.device_put(s, dev)
fn = jax.jit(lambda ss: synthesis(dparams, cfg, ss, noise_mode="const"))
float(jnp.sum(fn(ds)))

def probe():
    x = ds
    t0 = time.perf_counter()
    for _ in range(5):
        x = x + 0 * jnp.mean(fn(x))
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / 5 * 1e3

deadline = time.time() + 1800
while time.time() < deadline:
    ms = probe()
    print(f"probe: {ms:.1f} ms/batch64", flush=True)
    if ms < 150:
        print("clean window — benching", flush=True)
        break
    time.sleep(60)
else:
    print("no clean window in 30 min; benching anyway", flush=True)

import bench
cfg2, params2, tag = bench._get_network()
bench.bench_find_direction(cfg2, params2, tag)
