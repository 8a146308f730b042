"""Attribute the find_direction synthesis fwd+bwd cost per block.

The per-op A/B (.bench/layout_ab.py) showed isolated graphs are dominated
by a ~4 ms dispatch floor on this link, so attribution must happen INSIDE
one dispatched graph: time synthesis fwd+bwd at until_k = 2..6 (each one
jit graph, chained) and difference consecutive readings to get per-block
cost of the real training pipeline. Also A/Bs the fp32 step against a
full-bf16 variant (all blocks bf16, fp32 styles grads — the "bf16
gradients with fp32 master delta" candidate from the r2 verdict).
"""
import dataclasses
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)

B = 4
cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]

with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.z_dim))
    styles = w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7))

to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
params, styles = to_dev(params), to_dev(styles)


def timeit(name, fn, *args, iters=10):
    leaves, treedef = jax.tree_util.tree_flatten(args)

    @jax.jit
    def chained(carry, *lvs):
        lvs = (lvs[0] + carry.astype(lvs[0].dtype),) + tuple(lvs[1:])
        out = fn(*jax.tree_util.tree_unflatten(treedef, lvs))
        first = jax.tree_util.tree_leaves(out)[0]
        return first.ravel()[0].astype(jnp.float32) * 1e-20

    carry = jnp.float32(0.0)
    t0 = time.perf_counter()
    carry = chained(carry, *leaves)
    jax.block_until_ready(carry)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = chained(carry, *leaves)
        float(carry)
        times.append((time.perf_counter() - t0) / iters)
    print(f"{name:46s} {times[0]*1e3:7.2f} / {times[1]*1e3:7.2f} ms"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return min(times)


def fwd_bwd(c):
    return jax.jit(lambda gp, s, k: jax.grad(lambda ss: jnp.sum(jnp.square(
        synthesis(gp, c, ss, until_k=k, noise_mode="const"))))(s),
        static_argnums=2)


if __name__ == "__main__":
    f = fwd_bwd(cfg)
    prev = 0.0
    print("== until_k sweep, fp32 (cumulative / delta) ==")
    for k in range(2, 7):
        t = timeit(f"fp32 fwd+bwd until_k={k}", lambda gp, s, k=k:
                   f(gp, s, k), params, styles)
        print(f"    block delta @k={k}: {(t - prev)*1e3:7.2f} ms")
        prev = t

    print("== full-bf16 variant (all blocks bf16) ==")
    cfg_bf16_all = dataclasses.replace(cfg, low_precision_dtype="bfloat16",
                                       num_fp16_res=len(cfg.block_resolutions)
                                       if hasattr(cfg, "num_fp16_res")
                                       else 9)
    try:
        fb = fwd_bwd(cfg_bf16_all)
        timeit("all-bf16 fwd+bwd until_k=6", lambda gp, s: fb(gp, s, 6),
               params, styles)
    except Exception as e:
        print(f"all-bf16 variant unavailable: {type(e).__name__}: {e}")

    cfg_bf16 = dataclasses.replace(cfg, low_precision_dtype="bfloat16")
    fu = fwd_bwd(cfg_bf16)
    timeit("upper-bf16 fwd+bwd until_k=6 (policy)",
           lambda gp, s: fu(gp, s, 6), params, styles)
