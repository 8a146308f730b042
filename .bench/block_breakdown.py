"""Fine-grained fwd+bwd breakdown of the two hot synthesis blocks.

conv_mm_ab.py showed the raw XLA convs of the 128px+256px blocks sum to
~10 ms fwd+bwd while the in-graph until_k bisect charges the blocks 24 ms
— so the conv cores are NOT the bottleneck. This bench times each layer of
the block pipeline with K in-graph repetitions per dispatch (amortizing
the per-dispatch link overhead to <0.5 ms), to find where the other
~14 ms live: polyphase interleave + transpose, modulation/demodulation,
bias_act lrelu+clamp, torgb, RGB-skip upsample.

Each arm: chained carry, K=8 repetitions of fn inside ONE jit, grad wrt
inputs, per-repetition ms printed. Probe-bracketed pairs of passes.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stylemc_tpu.ops import setup_filter_np
from stylemc_tpu.ops.conv2d_resample import (_compose_kernel_with_fir,
                                             _polyphase_up_conv)
from stylemc_tpu.ops.modulated_conv import modulated_conv2d
from stylemc_tpu.ops import bias_act
from stylemc_tpu.models.stylegan2.generator import (GeneratorConfig,
                                                    init_generator_params)

cpu = jax.local_devices(backend="cpu")[0]
B = 4
K = 8  # in-graph repetitions per dispatch


def timeit(name, fn, *args, iters=12):
    """fn is repeated K times IN-GRAPH via a chained carry; per-rep ms."""
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
    print(f"{name:48s} {times[0]*1e3:7.3f} / {times[1]*1e3:7.3f} ms"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return min(times)


def grad_of(fn, argnums=(0,)):
    def g(*args):
        return jax.grad(lambda *a: jnp.sum(
            jnp.square(fn(*a)).astype(jnp.float32)), argnums=argnums)(*args)
    return g


def main():
    filt = setup_filter_np((1, 3, 3, 1))
    rs = np.random.RandomState(0)
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)

    for res in (128, 256):
        ci = cfg.channels(res // 2)      # conv0 in
        co = cfg.channels(res)           # block out
        half = res // 2
        print(f"--- block b{res}: conv0 {ci}->{co} up2 @{half}->{res}, "
              f"conv1 {co}->{co} @{res}")
        bp = params["synthesis"][f"b{res}"]
        x_in = jnp.asarray(rs.randn(B, ci, half, half), jnp.float32)
        x_mid = jnp.asarray(rs.randn(B, co, res, res), jnp.float32)
        img_in = jnp.asarray(rs.randn(B, 3, half, half), jnp.float32)
        s0 = jnp.asarray(rs.randn(B, ci), jnp.float32)
        s1 = jnp.asarray(rs.randn(B, co), jnp.float32)
        st = jnp.asarray(rs.randn(B, co), jnp.float32)
        w0 = bp["conv0"]["weight"]
        w1 = bp["conv1"]["weight"]
        f = jnp.asarray(filt, jnp.float32)

        # 1. raw conv cores (no modulation/elementwise) — the exact
        # conv2d_resample calls the modulated layers make
        from stylemc_tpu.ops.conv2d_resample import conv2d_resample

        def conv0_core(x, w):
            return conv2d_resample(x, w, f=f, up=2, padding=1,
                                   flip_weight=False)

        def conv1_plain(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        timeit("conv0 core (poly+interleave) fwd+bwd",
               grad_of(conv0_core, (0, 1)), x_in, w0)
        timeit("conv1 core fwd+bwd", grad_of(conv1_plain, (0, 1)),
               x_mid, w1)

        # 2. modulated_conv2d (adds style scale + dcoefs + noise)
        noise0 = (bp["conv0"]["noise_const"] *
                  bp["conv0"]["noise_strength"])[None, None]
        noise1 = (bp["conv1"]["noise_const"] *
                  bp["conv1"]["noise_strength"])[None, None]

        def mod0(x, w, s):
            return modulated_conv2d(x, w, s, noise=noise0, up=2, padding=1,
                                    resample_filter=f, flip_weight=False)

        def mod1(x, w, s):
            return modulated_conv2d(x, w, s, noise=noise1, up=1, padding=1,
                                    resample_filter=f, flip_weight=True)

        timeit("conv0 modulated fwd+bwd", grad_of(mod0, (0, 2)),
               x_in, w0, s0)
        timeit("conv1 modulated fwd+bwd", grad_of(mod1, (0, 2)),
               x_mid, w1, s1)

        # 3. + bias_act (lrelu, gain sqrt2, clamp 256)
        def layer0(x, w, s):
            y = mod0(x, w, s)
            return bias_act(y, bp["conv0"]["bias"], act="lrelu",
                            gain=float(np.sqrt(2)), clamp=256.0)

        timeit("conv0 full layer fwd+bwd", grad_of(layer0, (0, 2)),
               x_in, w0, s0)

        def layer1(x, w, s):
            y = mod1(x, w, s)
            return bias_act(y, bp["conv1"]["bias"], act="lrelu",
                            gain=float(np.sqrt(2)), clamp=256.0)

        timeit("conv1 full layer fwd+bwd", grad_of(layer1, (0, 2)),
               x_mid, w1, s1)

        # 4. torgb 1x1 (demodulate=False + bias + clamp)
        wg = 1.0 / np.sqrt(co)

        def torgb(x, s):
            y = modulated_conv2d(x, bp["torgb"]["weight"], s * wg,
                                 demodulate=False)
            return bias_act(y, bp["torgb"]["bias"], act="linear", clamp=256.0)

        timeit("torgb fwd+bwd", grad_of(torgb, (0, 1)), x_mid, st)

        # 5. RGB-skip upsample (pallas polyphase)
        from stylemc_tpu.ops.pallas.upfirdn2d_pallas import upsample2d_pallas

        timeit("img upsample (pallas) fwd+bwd",
               grad_of(lambda i: upsample2d_pallas(i, filt)), img_in)

        # 6. the whole block (conv0+conv1+skip+torgb), matching upper_block
        def block(x, img, s0_, s1_, st_):
            y = layer0(x, w0, s0_)
            y = layer1(y, w1, s1_)
            im = upsample2d_pallas(img, filt)
            im = im + torgb(y, st_)
            return im

        timeit("FULL block fwd+bwd", grad_of(block, (0, 1, 2, 3, 4)),
               x_in, img_in, s0, s1, st)


if __name__ == "__main__":
    main()
