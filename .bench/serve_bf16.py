"""Clean-window serve latency: fp32 vs bf16 rendering, probe-bracketed."""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses, time
import numpy as np, jax.numpy as jnp
from stylemc_tpu.models.stylegan2.generator import GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis
from stylemc_tpu.serve import BatchEditor

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.z_dim))
    s_probe = np.asarray(w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7)))
    direction = (np.random.RandomState(0).randn(1, 26, 512) * 0.5).astype(np.float32)
dparams = jax.device_put(jax.tree_util.tree_map(np.asarray, params), dev)
pcfg = dataclasses.replace(cfg, low_precision_dtype="bfloat16")
pf = jax.jit(lambda ss: synthesis(dparams, pcfg, ss, noise_mode="const"))
dsp = jax.device_put(s_probe, dev)
float(jnp.sum(pf(dsp)))
def probe():
    x = dsp; t0 = time.perf_counter()
    for _ in range(5): x = x + 0 * jnp.mean(pf(x))
    float(jnp.sum(x)); return (time.perf_counter()-t0)/5*1e3

deadline = time.time() + 1500
while time.time() < deadline:
    ms = probe()
    print(f"probe: {ms:.1f}", flush=True)
    if ms < 150: break
    time.sleep(60)

for precision in ("fp32", "bf16"):
    ed = BatchEditor(cfg, dparams, direction=direction, max_batch=64,
                     precision=precision)
    ed.warmup()
    out = {}
    for b in (1, 8, 64):
        styles = np.asarray(ed.styles_from_seeds(range(b)))
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            ed.edit_styles(styles, change_power=2.0)
            lat.append(1e3 * (time.perf_counter() - t0))
        lat = np.asarray(lat[5:])
        out[b] = (float(np.percentile(lat, 50)), float(np.percentile(lat, 99)))
    pm = probe()
    print(f"{precision}: " + " | ".join(
        f"b{b}: p50 {p50:.1f} p99 {p99:.1f}" for b, (p50, p99) in out.items())
        + f"  (probe after: {pm:.1f})", flush=True)
