"""A/B the fused up-conv implementations on the TPU.

Hypothesis (docs/performance.md): the pad_dilate form's BACKWARD is a
full-resolution transposed conv + strided slice (the transpose of an
interior-dilated lax.pad), ~up² the necessary work — suspected cause of
the 8x bwd/fwd asymmetry in the synthesis step (36.5 ms fwd+bwd vs ~4 ms
fwd at batch 4). The polyphase form's transpose stays at low resolution.

Times fwd and fwd+bwd for both implementations at the find_direction
256px block shapes, then the full synthesis fwd+bwd both ways.
Chained in-graph timing; every arm is probe-bracketed (docs/performance.md:
probe → measure → probe, discard arms whose probes disagree). The probe is
jitted ONCE before any flag flip, so its executable is impl-independent
(UP_CONV_IMPL is read at trace time).
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
from stylemc_tpu.ops.upfirdn2d import setup_filter
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
B = 4


def timeit(name, fn, *args, iters=20):
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
    print(f"{name:52s} {times[0]*1e3:8.2f} / {times[1]*1e3:8.2f} ms"
          f"   (compile {compile_s:.0f}s)", flush=True)
    return min(times)


f = jax.device_put(np.asarray(setup_filter([1, 3, 3, 1])), dev)

# Generator params/styles for both the contention probe and the synthesis A/B.
with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (16, cfg.z_dim))
    styles = w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7))
to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
params, styles = to_dev(params), to_dev(styles)
styles_b = styles[:B]

# Contention probe: batch-16 synthesis fwd, jitted HERE (before any
# UP_CONV_IMPL flip) so its executable is fixed across arms.
_probe_fn = jax.jit(lambda s: synthesis(params, cfg, s, noise_mode="const"))
float(jnp.sum(_probe_fn(styles)))  # compile


def probe():
    x = styles
    t0 = time.perf_counter()
    for _ in range(5):
        x = x + 0 * jnp.mean(_probe_fn(x))
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / 5 * 1e3


def bracketed(label, body):
    """probe → body() → probe; flag the arm if the probes disagree >20%."""
    p0 = probe()
    print(f"-- probe before {label}: {p0:.1f} ms", flush=True)
    body()
    p1 = probe()
    rel = abs(p1 - p0) / max(p0, p1)
    tag = "OK" if rel < 0.20 else "CONTENTION — DISCARD THIS ARM"
    print(f"-- probe after  {label}: {p1:.1f} ms  [{tag}]", flush=True)


# find_direction 256px up-conv block shapes (N, I, O, H->2H)
SHAPES = [(B, 512, 512, 16), (B, 512, 512, 32), (B, 512, 256, 64),
          (B, 256, 128, 128)]

for impl in ("pad_dilate", "polyphase"):
    cr.UP_CONV_IMPL = impl

    def arm():
        for (n, i, o, h) in SHAPES:
            rng = np.random.RandomState(0)
            x = jax.device_put(rng.randn(n, i, h, h).astype(np.float32), dev)
            w = jax.device_put(
                rng.randn(o, i, 3, 3).astype(np.float32) * 0.05, dev)

            def fwd(x_, w_):
                return cr.conv2d_resample(x_, w_, f=f, up=2, padding=1,
                                          flip_weight=False)

            timeit(f"upconv {i}->{o} @{h}  fwd", fwd, x, w)
            timeit(f"upconv {i}->{o} @{h}  fwd+bwd(x)",
                   lambda x_, w_: jax.grad(
                       lambda xx: jnp.sum(jnp.square(fwd(xx, w_))))(x_), x, w)

    print(f"== {impl} ==")
    bracketed(impl, arm)

# full synthesis fwd+bwd wrt styles, both impls
for impl in ("pad_dilate", "polyphase"):
    cr.UP_CONV_IMPL = impl

    def arm():
        timeit(f"synthesis fwd        ({impl})",
               lambda gp, s: synthesis(gp, cfg, s, noise_mode="const"),
               params, styles_b)
        timeit(f"synthesis fwd+bwd(s) ({impl})",
               lambda gp, s: jax.grad(lambda ss: jnp.sum(jnp.square(
                   synthesis(gp, cfg, ss, noise_mode="const"))))(s),
               params, styles_b)

    bracketed(f"synthesis/{impl}", arm)
cr.UP_CONV_IMPL = "polyphase"
