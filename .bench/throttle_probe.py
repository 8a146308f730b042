"""Sustained-load probe: does per-chunk time degrade over a long run
(throttling) or stay flat (pure foreign-load contention)?"""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
import dataclasses, time
import numpy as np, jax.numpy as jnp
from stylemc_tpu.models.stylegan2.generator import GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis
cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
    cfg = dataclasses.replace(GeneratorConfig(img_resolution=256), low_precision_dtype="bfloat16")
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.z_dim))
    s = np.asarray(w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7)))
dev = jax.devices()[0]
dparams = jax.device_put(jax.tree_util.tree_map(np.asarray, params), dev)
ds = jax.device_put(s, dev)
fn = jax.jit(lambda ss: synthesis(dparams, cfg, ss, noise_mode="const"))
float(jnp.sum(fn(ds)))
# 40 chunks of 5 chained calls = ~3+ min sustained load
x = ds
for chunk in range(40):
    t0 = time.perf_counter()
    for _ in range(5):
        x = x + 0 * jnp.mean(fn(x))
    float(jnp.sum(x))
    print(f"chunk {chunk:2d}: {(time.perf_counter()-t0)/5*1e3:7.1f} ms/call", flush=True)
