"""A/B: XLA conv vs 9-tap-matmul formulation for the hot synthesis convs.

docs/performance.md "synthesis fwd+bwd ceiling": the 128px+256px blocks are
71% of the training-step synthesis fwd+bwd at ~10-13% of bf16 peak, with a
~3.4 ms raw-HBM floor against 24 ms measured. Hypothesis: XLA's conv
emission over channel-thin large-plane shapes (batch 4, 128-512 channels,
64²-256² planes) under-fills the MXU, while the SAME contraction expressed
as 9 shifted [N·H·W, CI] @ [CI, CO] matmuls (NHWC layout) rides the MXU's
native matmul path at near-peak. If this wins, it becomes the block-conv
implementation (plain + polyphase-up forms), with matching custom VJPs;
if not, it is the measured rejection for a Pallas kernel at these shapes.

Arms (each fwd-only and fwd+bwd, bf16 and fp32):
  xla   — lax.conv_general_dilated NCHW (the current path)
  mm    — 9 shifted-slice matmuls on NHWC, fp32 accumulation
Shapes: the find_direction-256 workload's four hot convs (batch 4):
  conv1@256  x[4,128,256,256]  W[128,128,3,3]
  conv0@256p x[4,128→? see below] — polyphase up-conv as 4·O-channel conv
  conv1@128  x[4,256,128,128]  W[256,256,3,3]
  conv0@128p x[4,512,64,64]    W[1024,512,3,3] (4·256 poly channels)
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]


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
    print(f"{name:46s} {times[0]*1e3:8.2f} / {times[1]*1e3:8.2f} ms"
          f"   (compile {compile_s:.0f}s)", flush=True)
    return min(times)


def conv_xla(x_nchw, w):
    return lax.conv_general_dilated(
        x_nchw, w.astype(x_nchw.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def conv_mm(x_nhwc, w):
    """9 shifted matmuls, fp32 accumulation; returns NHWC."""
    n, h, w_sp, ci = x_nhwc.shape
    o = w.shape[0]
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((n * h * w_sp, o), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xs = xp[:, di:di + h, dj:dj + w_sp, :].reshape(n * h * w_sp, ci)
            wt = w[:, :, di, dj].T.astype(xs.dtype)
            acc += jnp.dot(xs, wt, preferred_element_type=jnp.float32)
    return acc.reshape(n, h, w_sp, o)


def main():
    shapes = [
        ("conv1@256", 4, 128, 128, 256),
        ("conv0@256poly", 4, 256, 512, 128),   # 4·128 poly out-channels
        ("conv1@128", 4, 256, 256, 128),
        ("conv0@128poly", 4, 512, 1024, 64),   # 4·256 poly out-channels
    ]
    for dtype in (jnp.bfloat16, jnp.float32):
        print(f"--- dtype {dtype.__name__}")
        for name, n, ci, co, res in shapes:
            kx = np.random.RandomState(0)
            x = jnp.asarray(kx.randn(n, ci, res, res), dtype)
            xh = jnp.transpose(x, (0, 2, 3, 1))
            w = jnp.asarray(kx.randn(co, ci, 3, 3) * 0.05, dtype)

            timeit(f"{name} xla fwd", conv_xla, x, w)
            timeit(f"{name} mm  fwd", conv_mm, xh, w)

            def g_xla(x, w):
                return jax.grad(lambda a, b: jnp.sum(
                    jnp.square(conv_xla(a, b)).astype(jnp.float32)),
                    argnums=(0, 1))(x, w)

            def g_mm(x, w):
                return jax.grad(lambda a, b: jnp.sum(
                    jnp.square(conv_mm(a, b)).astype(jnp.float32)),
                    argnums=(0, 1))(x, w)

            timeit(f"{name} xla fwd+bwd", g_xla, x, w)
            timeit(f"{name} mm  fwd+bwd", g_mm, xh, w)


if __name__ == "__main__":
    main()
