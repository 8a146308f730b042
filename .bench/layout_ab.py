"""NCHW vs NHWC conv layout A/B on the find_direction hot shapes (VERDICT
r3 item 4: one profile-driven attack on the 33.4 ms synthesis fwd+bwd).

The synthesis step is occupancy-bound at batch 4; the question is whether
XLA's TPU conv emission pays real transpose/layout cost for the logical
NCHW dimension numbers the generator uses, and whether channels-last
would recover it. Times fwd+bwd (wrt input AND weights, like training)
for each up-conv / plain-conv block shape of the 256px pipeline under
both layouts, chained timing, two passes.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

B = 4

# (cin, cout, spatial_in, up) — the conv0/conv1 shapes of the FFHQ-256
# until_k=6 synthesis pipeline (b8..b256), heaviest last
SHAPES = [
    (512, 512, 16, 2),
    (512, 512, 32, 1),
    (512, 512, 32, 2),
    (512, 512, 64, 1),
    (512, 256, 64, 2),
    (256, 256, 128, 1),
    (256, 128, 128, 2),
    (128, 128, 256, 1),
]


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
    print(f"{name:44s} {times[0]*1e3:7.2f} / {times[1]*1e3:7.2f} ms"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return min(times)


def conv_fwd(x, w, dn, up):
    if up == 1:
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    # polyphase-style: conv at low res with up^2*O channels then
    # depth-to-space — approximated here as the dominant conv itself
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)


def run(layout):
    key = jax.random.PRNGKey(0)
    total = 0.0
    for cin, cout, s, up in SHAPES:
        o = cout * (up * up)
        if layout == "nchw":
            x = jax.random.normal(key, (B, cin, s, s), jnp.float32)
            w = jax.random.normal(key, (o, cin, 3, 3), jnp.float32) * 0.05
            dn = ("NCHW", "OIHW", "NCHW")
        else:
            x = jax.random.normal(key, (B, s, s, cin), jnp.float32)
            w = jax.random.normal(key, (3, 3, cin, o), jnp.float32) * 0.05
            dn = ("NHWC", "HWIO", "NHWC")

        def loss(x, w):
            y = conv_fwd(x, w, dn, up)
            return jnp.sum(jnp.square(y))

        g = jax.jit(lambda x, w: jax.grad(loss, argnums=(0, 1))(x, w))
        total += timeit(f"{layout} {cin}->{o}@{s}px", g, x, w)
    print(f"TOTAL {layout}: {total*1e3:.2f} ms", flush=True)
    return total


def probe():
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 256, 128, 128))
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 256, 3, 3)) * 0.05
    f = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW")))
    c = x
    t0 = time.perf_counter()
    for _ in range(3):
        c = c + 0 * jnp.mean(f(c))
    float(jnp.sum(c))
    return (time.perf_counter() - t0) / 3 * 1e3


if __name__ == "__main__":
    print(f"probe {probe():.1f} ms")
    t_nchw = run("nchw")
    t_nhwc = run("nhwc")
    print(f"probe {probe():.1f} ms")
    print(f"NHWC/NCHW ratio: {t_nhwc / t_nchw:.3f}")
