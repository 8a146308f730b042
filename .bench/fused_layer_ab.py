"""A/B on TPU: fused Pallas modulated layer vs unfused XLA path (up=1).

Targets (block_breakdown.py, same harness): conv1@128 full layer fwd+bwd
1.999 ms fp32 / 1.63 bf16; conv1@256 3.919 / 2.73.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stylemc_tpu.ops import bias_act
from stylemc_tpu.ops.modulated_conv import modulated_conv2d
from stylemc_tpu.ops.pallas.modconv_pallas import fused_modulated_layer

K = 8
GAIN = float(np.sqrt(2))


def timeit(name, fn, *args, iters=12):
    leaves, treedef = jax.tree_util.tree_flatten(args)

    @jax.jit
    def chained(carry, *lvs):
        c = carry
        for _ in range(K):
            lvs2 = ((lvs[0] + c.astype(lvs[0].dtype),) + tuple(lvs[1:]))
            out = fn(*jax.tree_util.tree_unflatten(treedef, lvs2))
            first = jax.tree_util.tree_leaves(out)[0]
            c = first.ravel()[0].astype(jnp.float32) * 1e-20
        return c

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
        times.append((time.perf_counter() - t0) / iters / K)
    print(f"{name:42s} {times[0]*1e3:7.3f} / {times[1]*1e3:7.3f} ms"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return min(times)


def main():
    rs = np.random.RandomState(0)
    B = 4
    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"--- dtype {dtype.__name__}")
        for name, ci, co, res in (("conv1@128", 256, 256, 128),
                                  ("conv1@256", 128, 128, 256)):
            x = jnp.asarray(rs.randn(B, ci, res, res), dtype)
            w = jnp.asarray(rs.randn(co, ci, 3, 3) * 0.05, jnp.float32)
            s = jnp.asarray(rs.randn(B, ci), jnp.float32)
            noise = jnp.asarray(rs.randn(res, res) * 0.1, jnp.float32)
            b = jnp.asarray(rs.randn(co) * 0.1, jnp.float32)

            def unfused(x, s):
                y = modulated_conv2d(x, w, s, noise=noise[None, None],
                                     up=1, padding=1, flip_weight=True)
                return bias_act(y, b, act="lrelu", gain=GAIN, clamp=256.0)

            def fused(x, s):
                return fused_modulated_layer(x, w, s, noise, b, gain=GAIN,
                                             clamp=256.0)

            if dtype == jnp.float32:
                a = np.asarray(jax.jit(unfused)(x, s))
                g = np.asarray(jax.jit(fused)(x, s))
                rel = np.max(np.abs(a - g)) / np.max(np.abs(a))
                print(f"  {name} fwd rel err: {rel:.2e}")

            def g_unf(x, s):
                return jax.grad(lambda a, b_: jnp.sum(jnp.square(
                    unfused(a, b_)).astype(jnp.float32)),
                    argnums=(0, 1))(x, s)

            def g_fus(x, s):
                return jax.grad(lambda a, b_: jnp.sum(jnp.square(
                    fused(a, b_)).astype(jnp.float32)),
                    argnums=(0, 1))(x, s)

            timeit(f"{name} unfused fwd", unfused, x, s)
            timeit(f"{name} fused   fwd", fused, x, s)
            timeit(f"{name} unfused fwd+bwd(x,s)", g_unf, x, s)
            timeit(f"{name} fused   fwd+bwd(x,s)", g_fus, x, s)

            # with weight grads too (the coach train_decoder regime)
            def gw_unf(x, s, w_):
                return jax.grad(lambda a, b_, c_: jnp.sum(jnp.square(
                    modulated_conv2d(a, c_, b_, noise=noise[None, None],
                                     up=1, padding=1, flip_weight=True)
                ).astype(jnp.float32)), argnums=(0, 1, 2))(x, s, w_)

            def gw_fus(x, s, w_):
                return jax.grad(lambda a, b_, c_: jnp.sum(jnp.square(
                    fused_modulated_layer(a, c_, b_, noise, b, gain=GAIN,
                                          clamp=256.0)
                ).astype(jnp.float32)), argnums=(0, 1, 2))(x, s, w_)

            timeit(f"{name} unfused fwd+bwd(+w)", gw_unf, x, s, w)
            timeit(f"{name} fused   fwd+bwd(+w)", gw_fus, x, s, w)


if __name__ == "__main__":
    main()
