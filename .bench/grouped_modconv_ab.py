"""A/B: unfused modulated conv (current) vs per-sample-weight GROUPED conv.

block_breakdown.py showed the modulation wrapper (x·styles input pass,
dcoefs output pass + their backwards) costs ~2-3.7 ms/block on top of the
raw convs — pure HBM traffic XLA cannot fuse into the conv. The grouped
formulation folds styles AND dcoefs into a per-sample weight
[N·CO, CI, kh, kw] (a few MB, negligible) and runs ONE grouped conv on
x reshaped to [1, N·CI, H, W] — the reference's fused_modconv path, which
ops/modulated_conv.py's docstring dismissed for the MXU without measuring
batch-4 group sizes of 128-512 channels. If this wins, modulated_conv2d
gets a fused_groups mode and the dismissal is corrected.

Arms per shape (fp32 and bf16, fwd+bwd wrt x and styles):
  unfused — modulated_conv2d + bias_act (the shipping path)
  grouped — per-sample-weight grouped conv + noise/bias_act
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax

from stylemc_tpu.ops import bias_act, setup_filter_np
from stylemc_tpu.ops.modulated_conv import modulated_conv2d
from stylemc_tpu.ops.conv2d_resample import _compose_kernel_with_fir

K = 8


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
    print(f"{name:44s} {times[0]*1e3:7.3f} / {times[1]*1e3:7.3f} ms"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return min(times)


def grad_of(fn, argnums):
    def g(*args):
        return jax.grad(lambda *a: jnp.sum(
            jnp.square(fn(*a)).astype(jnp.float32)), argnums=argnums)(*args)
    return g


def dcoefs_of(w, s):
    w2 = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=(2, 3))
    return lax.rsqrt(jnp.square(s.astype(jnp.float32)) @ w2.T + 1e-8)


def main():
    filt = setup_filter_np((1, 3, 3, 1))
    f = jnp.asarray(filt, jnp.float32)
    rs = np.random.RandomState(0)
    B = 4

    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"--- dtype {dtype.__name__}")
        # (name, ci, co, res, up)
        for name, ci, co, res, up in (
                ("conv1@128", 256, 256, 128, 1),
                ("conv1@256", 128, 128, 256, 1),
                ("conv0@128", 512, 256, 64, 2),
                ("conv0@256", 256, 128, 128, 2)):
            x = jnp.asarray(rs.randn(B, ci, res, res), dtype)
            w = jnp.asarray(rs.randn(co, ci, 3, 3) * 0.05, jnp.float32)
            s = jnp.asarray(rs.randn(B, ci), jnp.float32)
            noise = jnp.asarray(rs.randn(1, 1, res * up, res * up),
                                jnp.float32)
            bias = jnp.asarray(rs.randn(co), jnp.float32)

            def unfused(x, s, w=w, noise=noise, bias=bias, up=up):
                y = modulated_conv2d(x, w, s, noise=noise, up=up, padding=1,
                                     resample_filter=f,
                                     flip_weight=(up == 1))
                return bias_act(y, bias, act="lrelu",
                                gain=float(np.sqrt(2)), clamp=256.0)

            def grouped(x, s, w=w, noise=noise, bias=bias, up=up):
                n = x.shape[0]
                d = dcoefs_of(w, s)
                wm = w[None] * s[:, None, :, None, None] \
                    * d[:, :, None, None, None]            # [N,CO,CI,3,3]
                if up == 1:
                    wk = jnp.flip(wm, axis=(3, 4)) if False else wm
                    y = lax.conv_general_dilated(
                        x.reshape(1, n * ci, res, res),
                        wk.reshape(n * co, ci, 3, 3).astype(x.dtype),
                        (1, 1), [(1, 1), (1, 1)],
                        dimension_numbers=("NCHW", "OIHW", "NCHW"),
                        feature_group_count=n)
                else:
                    # polyphase grouped up-conv: compose FIR, split phases
                    wkc = _compose_kernel_with_fir(
                        jnp.flip(wm.reshape(n * co, ci, 3, 3), axis=(2, 3)),
                        f, gain=4.0, flip_filter=False)      # [N·CO, CI,6,6]
                    px0 = px1 = py0 = py1 = None
                    # pads from conv2d_resample: padding=1, fw=4, up=2
                    py0 = px0 = 1 + (4 + 1) // 2             # 3
                    py1 = px1 = 1 + (4 - 2) // 2             # 2
                    from stylemc_tpu.ops.conv2d_resample import \
                        _polyphase_up_conv
                    # _polyphase_up_conv has no groups arg — emulate with
                    # the same math: conv [1, N·CI] with N groups
                    o6 = wkc.shape[0]
                    # reuse the function per-sample would defeat the test;
                    # inline the grouped low-res conv + interleave:
                    up2 = 2
                    kh = kw = 6
                    th = tw = 3
                    ho = up2 * res + py0 + py1 - kh + 1
                    wo = up2 * res + px0 + px1 - kw + 1
                    c_r = [(py0 - a) % up2 for a in range(up2)]
                    s_r = [(py0 - a - c_r[a]) // up2 for a in range(up2)]
                    c_c = [(px0 - b) % up2 for b in range(up2)]
                    s_c = [(px0 - b - c_c[b]) // up2 for b in range(up2)]
                    big_sr, big_sc = max(s_r), max(s_c)
                    mr, mc = -(-ho // up2), -(-wo // up2)
                    rr = mr + big_sr - min(s_r)
                    cc = mc + big_sc - min(s_c)
                    lo_r, hi_r = big_sr, (rr + th - 1) - big_sr - res
                    lo_c, hi_c = big_sc, (cc + tw - 1) - big_sc - res
                    xp = lax.pad(x, jnp.zeros((), x.dtype),
                                 ((0, 0, 0), (0, 0, 0),
                                  (lo_r, hi_r, 0), (lo_c, hi_c, 0)))
                    wk_pad = wkc
                    wkr = wk_pad.reshape(n * co, ci, th, up2, tw, up2)
                    ph = jnp.stack([wkr[:, :, :, c_r[a]] for a in range(up2)],
                                   axis=0)
                    ph = jnp.stack([ph[..., c_c[b]] for b in range(up2)],
                                   axis=1)
                    # [a, b, N, CO, ci, th, tw] → group-major [N, a·b·CO]
                    ph = ph.reshape(up2, up2, n, co, ci, th, tw)
                    ph = jnp.transpose(ph, (2, 0, 1, 3, 4, 5, 6))
                    wk_poly = ph.reshape(n * up2 * up2 * co, ci, th, tw)
                    out = lax.conv_general_dilated(
                        xp.reshape(1, n * ci, xp.shape[2], xp.shape[3]),
                        wk_poly.astype(x.dtype), (1, 1), "VALID",
                        dimension_numbers=("NCHW", "OIHW", "NCHW"),
                        feature_group_count=n)
                    out = out.reshape(n, up2, up2, co, rr, cc)
                    rows = []
                    for a in range(up2):
                        r0 = big_sr - s_r[a]
                        cols = []
                        for b in range(up2):
                            c0 = big_sc - s_c[b]
                            cols.append(lax.slice(
                                out[:, a, b], (0, 0, r0, c0),
                                (n, co, r0 + mr, c0 + mc)))
                        rows.append(jnp.stack(cols, axis=-1))
                    y = jnp.stack(rows, axis=3).reshape(
                        n, co, up2 * mr, up2 * mc)[:, :, :ho, :wo]
                y = y.reshape(n, co, res * up, res * up)
                y = y + noise.astype(y.dtype)
                return bias_act(y, bias, act="lrelu",
                                gain=float(np.sqrt(2)), clamp=256.0)

            # numerics parity first (fp32 only — bf16 paths prenormalize)
            if dtype == jnp.float32:
                a = np.asarray(unfused(x, s))
                b = np.asarray(grouped(x, s))
                err = np.max(np.abs(a - b)) / max(1e-8, np.max(np.abs(a)))
                print(f"  {name}: rel err unfused vs grouped = {err:.2e}")

            timeit(f"{name} unfused fwd+bwd", grad_of(unfused, (0, 1)), x, s)
            timeit(f"{name} grouped fwd+bwd", grad_of(grouped, (0, 1)), x, s)


if __name__ == "__main__":
    main()
