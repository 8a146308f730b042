"""Per-phase attribution of the e4e Coach training step (VERDICT r3 item
2): chained fwd+bwd timing of each constituent tower at the real shapes
(FFHQ-1024 decoder, 256px inputs, batch 4), so the 608 ms/step full-stack
number decomposes into encoder / decoder / LPIPS / ID / W-D and the bf16
variants' wins are attributable.

Pass 'bf16' as argv[1] to time the perception towers with bf16 inputs
(the --perception_bf16 path) and the decoder with bf16 upper blocks.
"""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params)
from stylemc_tpu.models.e4e.encoders import init_encoder_params
from stylemc_tpu.models.e4e.psp import PSP, PSPConfig
from stylemc_tpu.models.arcface import init_backbone_params
from stylemc_tpu.losses.lpips import init_lpips_params, lpips_loss
from stylemc_tpu.losses.moco import e4e_id_loss
from stylemc_tpu.models.e4e.discriminator import (discriminator_apply,
                                                  init_discriminator_params)

SIZE = 1024
B = 4
cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
BF16 = len(sys.argv) > 1 and sys.argv[1] == "bf16"

with jax.default_device(cpu):
    gen_cfg = GeneratorConfig(img_resolution=SIZE, remat=True)
    if BF16:
        import dataclasses
        gen_cfg = dataclasses.replace(gen_cfg, low_precision_dtype="bfloat16")
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1),
                                     stylegan_size=SIZE)
    lpips = init_lpips_params(jax.random.PRNGKey(2), "alex")
    arcface = init_backbone_params(jax.random.PRNGKey(3))
    disc = init_discriminator_params(jax.random.PRNGKey(4))
    n_ws = 2 * int(np.log2(SIZE)) - 2

to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
enc_params, gen_params = to_dev(enc_params), to_dev(gen_params)
lpips, arcface, disc = to_dev(lpips), to_dev(arcface), to_dev(disc)
psp = PSP(cfg=PSPConfig(stylegan_size=SIZE), encoder_params=enc_params,
          decoder_cfg=gen_cfg, decoder_params=gen_params,
          latent_avg=jnp.zeros((n_ws, 512)))

rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(B, 3, 256, 256).astype(np.float32) * 0.3)
codes = jnp.asarray(rs.randn(B, n_ws, 512).astype(np.float32) * 0.1)
y_hat = jnp.asarray(rs.randn(B, 3, 256, 256).astype(np.float32) * 0.5)
P = jnp.bfloat16 if BF16 else jnp.float32


def timeit(name, fn, *args, iters=8):
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
    print(f"{name:44s} {times[0]*1e3:7.1f} / {times[1]*1e3:7.1f} ms"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return min(times)


def main():
    tag = "bf16" if BF16 else "fp32"
    print(f"--- coach phase breakdown ({tag}), batch {B}, 1024px decoder")

    def enc_fb(ep, xx):
        import dataclasses
        p2 = dataclasses.replace(psp, encoder_params=ep)
        return jax.grad(lambda e: jnp.sum(jnp.square(dataclasses.replace(
            psp, encoder_params=e).encode(xx)).astype(jnp.float32)))(ep)

    timeit("encoder (IR-SE-50 e4e) fwd+bwd wrt params", enc_fb,
           enc_params, x)

    def dec_fb(c):
        return jax.grad(lambda cc: jnp.sum(jnp.square(
            psp.decode(cc, resize=True, noise_mode="const")
        ).astype(jnp.float32)))(c)

    timeit("decoder (1024px synth + pool to 256) fwd+bwd", dec_fb, codes)

    def lpips_fb(yh):
        return jax.grad(lambda a: lpips_loss(
            lpips, a.astype(P), x.astype(P), "alex").astype(jnp.float32))(yh)

    timeit(f"LPIPS(alex) fwd+bwd [{tag} towers]", lpips_fb, y_hat)

    def id_fb(yh):
        return jax.grad(lambda a: e4e_id_loss(
            arcface, a.astype(P), x.astype(P), x.astype(P))[0]
            .astype(jnp.float32))(yh)

    timeit(f"ID (ArcFace IR-SE-50) fwd+bwd [{tag} towers]", id_fb, y_hat)

    def wd_fb(dp):
        w = codes[:, 0, :]
        return jax.grad(lambda d: jnp.sum(jax.nn.softplus(
            -discriminator_apply(d, w))).astype(jnp.float32))(dp)

    timeit("W-discriminator fwd+bwd", wd_fb, disc)


if __name__ == "__main__":
    main()
