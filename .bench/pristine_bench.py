"""Retry find_direction full runs until one is bracketed by clean probes."""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses, time
import numpy as np, jax.numpy as jnp
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    cfg = dataclasses.replace(GeneratorConfig(img_resolution=256),
                              low_precision_dtype="bfloat16")
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.z_dim))
    s = np.asarray(w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7)))
dparams = jax.device_put(jax.tree_util.tree_map(np.asarray, params), dev)
ds = jax.device_put(s, dev)
fn = jax.jit(lambda ss: synthesis(dparams, cfg, ss, noise_mode="const"))
float(jnp.sum(fn(ds)))
def probe():
    x = ds; t0 = time.perf_counter()
    for _ in range(5): x = x + 0 * jnp.mean(fn(x))
    float(jnp.sum(x)); return (time.perf_counter()-t0)/5*1e3

import bench
cfg2, params2, tag = bench._get_network()

deadline = time.time() + 2400
attempt = 0
while time.time() < deadline:
    p0 = probe()
    if p0 > 150:
        print(f"probe {p0:.0f} — waiting", flush=True)
        time.sleep(60)
        continue
    attempt += 1
    print(f"attempt {attempt}: probe {p0:.0f} — running", flush=True)
    bench.bench_find_direction(cfg2, params2, tag)
    p1 = probe()
    print(f"attempt {attempt}: probe after {p1:.0f}", flush=True)
    if p1 < 150:
        print("PRISTINE (both probes clean)", flush=True)
        break
