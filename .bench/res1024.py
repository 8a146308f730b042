"""FFHQ-1024 synthesis throughput (the reference's real headline model).

Random-init weights via the standard init path (magnitude-realistic layers,
same graph as loader-path weights); bf16 upper blocks per the NVIDIA pkl
policy; chained-sync timing in a probe-bracketed clean window (see
docs/performance.md for why both disciplines are required on this chip).
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses, time
import numpy as np, jax.numpy as jnp
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)

BATCH = 16

cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
    cfg = dataclasses.replace(GeneratorConfig(img_resolution=1024),
                              low_precision_dtype="bfloat16")
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, cfg.z_dim))
    s = np.asarray(w_to_s(params, cfg,
                          mapping(params, cfg, z, truncation_psi=0.7)))
dev = jax.devices()[0]
dparams = jax.device_put(jax.tree_util.tree_map(np.asarray, params), dev)
ds = jax.device_put(s, dev)
fn = jax.jit(lambda ss: synthesis(dparams, cfg, ss, noise_mode="const"))

print("compiling 1024px graph...", flush=True)
t0 = time.perf_counter()
out = fn(ds)
float(jnp.sum(out))
print(f"compile+first: {time.perf_counter()-t0:.1f} s, out {out.shape} "
      f"{out.dtype}", flush=True)

ca = fn.lower(ds).compile().cost_analysis()
flops = (ca or {}).get("flops", 0.0)
print(f"XLA cost analysis: {flops/1e9/BATCH:.1f} GFLOPs/img", flush=True)


def chained(n):
    x = ds
    t0 = time.perf_counter()
    for _ in range(n):
        x = x + 0 * jnp.mean(fn(x))
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / n * 1e3


chained(3)  # warm queue
deadline = time.time() + 1800
best = None
while time.time() < deadline:
    a = chained(5)
    b = chained(5)
    agree = abs(a - b) / max(a, b) < 0.15
    print(f"round: {a:.1f} / {b:.1f} ms/batch{BATCH} "
          f"({'agree' if agree else 'DISAGREE — contended'})", flush=True)
    if agree:
        best = min(a, b)
        break
    time.sleep(45)

if best is not None:
    imgs = BATCH / best * 1e3
    print(f"CLEAN: {best:.1f} ms/batch{BATCH} = {imgs:.0f} imgs/s/chip"
          + (f", {flops/(best/1e3)/1e12:.0f} TF/s sustained" if flops else ""),
          flush=True)
else:
    print("no agreeing round in 30 min — record nothing", flush=True)
