import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
import time, dataclasses
import numpy as np, jax.numpy as jnp
from stylemc_tpu.models.stylegan2.generator import GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis
cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
    cfg = dataclasses.replace(GeneratorConfig(img_resolution=256), low_precision_dtype="bfloat16")
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.z_dim))
    s = np.asarray(w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7)))
dev = jax.devices()[0]
params = jax.device_put(jax.tree_util.tree_map(np.asarray, params), dev)
s = jax.device_put(s, dev)
fn = jax.jit(lambda ss: synthesis(params, cfg, ss, noise_mode="const"))
np.asarray(fn(s))
for trial in range(3):
    x = s; N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        img = fn(x)
        x = x + 0 * jnp.mean(img)
    float(jnp.sum(x))
    dtc = (time.perf_counter() - t0) / N
    t0 = time.perf_counter()
    outs = [fn(s) for _ in range(N)]
    jax.block_until_ready(outs)
    dtl = (time.perf_counter() - t0) / N
    print(f"trial {trial}: chained {dtc*1e3:7.1f} ms ({64/dtc:5.0f} i/s) | list+block {dtl*1e3:7.1f} ms ({64/dtl:5.0f} i/s)", flush=True)
