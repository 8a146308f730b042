"""e4e Coach step-time variants on the TPU (VERDICT r3 item 2 matrix).

Measures ms/step and imgs/s for the FFHQ-1024 coach at batch 4:
  (a) full stack (L2 + LPIPS + ID + W-discriminator)   [same as coach_step]
  (b) no W-discriminator
  (c) --train_decoder (decoder params join the Ranger state)
and prints the XLA memory analysis for batch 8 (expected over the 16 GB
HBM even with donated buffers — recorded rather than crashed).
"""
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
from stylemc_tpu.losses.lpips import init_lpips_params
from stylemc_tpu.train.coach import Coach, CoachOptions

SIZE = 1024
cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]

with jax.default_device(cpu):
    gen_cfg = GeneratorConfig(img_resolution=SIZE, remat=True)
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1),
                                     stylegan_size=SIZE)
    perception = {"lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
                  "arcface": init_backbone_params(jax.random.PRNGKey(3))}
    n_ws = 2 * int(np.log2(SIZE)) - 2

to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
enc_dev = to_dev(enc_params)
dec_dev = to_dev(gen_params)
perc_dev = to_dev(perception)


def make_coach(batch, **opt_kw):
    psp = PSP(cfg=PSPConfig(stylegan_size=SIZE),
              encoder_params=enc_dev, decoder_cfg=gen_cfg,
              decoder_params=dec_dev, latent_avg=jnp.zeros((n_ws, 512)))
    rng = np.random.RandomState(0)

    def train_iter():
        x = rng.randn(batch, 3, 256, 256).astype(np.float32) * 0.3
        return x, x.copy()

    kw = dict(batch_size=batch, stylegan_size=SIZE, l2_lambda=1.0,
              lpips_lambda=0.8, id_lambda=0.1, w_discriminator_lambda=0.1)
    kw.update(opt_kw)
    opts = CoachOptions(**kw)
    return Coach(opts, psp, perc_dev, train_iter, test_iter=None), train_iter


def measure(tag, batch, **opt_kw):
    coach, train_iter = make_coach(batch, **opt_kw)
    # pre-generate the data stream: host randn in the timed loop would
    # serialize ~10 ms/step of numpy into the measurement
    batches = [train_iter() for _ in range(10)]
    t0 = time.perf_counter()
    coach.train_step(*batches[0])
    print(f"{tag}: first step {time.perf_counter() - t0:.1f}s", flush=True)
    for p in range(3):
        t0 = time.perf_counter()
        for b in batches:
            coach.train_step(*b)
        dt = (time.perf_counter() - t0) / 10
        print(f"{tag} pass{p + 1}: {dt * 1e3:.1f} ms/step "
              f"({batch / dt:.1f} imgs/s)", flush=True)
    for p in range(2):
        # pipelined: no per-step loss fetch — steps chain on donated params,
        # drained by one final device_get (a production loop's cadence)
        t0 = time.perf_counter()
        for b in batches:
            last = coach.train_step(*b, fetch=False)
        jax.device_get(last)
        dt = (time.perf_counter() - t0) / 10
        print(f"{tag} pipelined pass{p + 1}: {dt * 1e3:.1f} ms/step "
              f"({batch / dt:.1f} imgs/s)", flush=True)


def mem_analysis_batch8():
    import optax
    coach, train_iter = make_coach(8)
    stage = coach.progressive_stage()

    def _step_fn(tr, opt_state, x, y, disc_params, fz):
        (loss, (ld, y_hat, lat)), grads = jax.value_and_grad(
            coach._calc_loss, has_aux=True)(tr, x, y, stage, disc_params, fz)
        updates, opt_state = coach.optimizer.update(grads, opt_state, tr)
        return optax.apply_updates(tr, updates), opt_state, ld

    frozen = {"decoder": coach.psp.decoder_params,
              "perception": coach.perception}
    x, y = train_iter()
    c = jax.jit(_step_fn, donate_argnums=(0, 1)).lower(
        coach._trainable(), coach.opt_state, jnp.asarray(x),
        jnp.asarray(y), coach.discriminator_params, frozen).compile()
    ma = c.memory_analysis()
    print(f"batch-8 memory analysis: peak "
          f"{ma.peak_memory_in_bytes / 2**30:.2f} GiB "
          f"(args {ma.argument_size_in_bytes / 2**30:.2f}, temps "
          f"{ma.temp_size_in_bytes / 2**30:.2f}, aliased "
          f"{ma.alias_size_in_bytes / 2**30:.2f})", flush=True)


if __name__ == "__main__":
    # one variant per process (pass its name as argv[1]): consecutive
    # variants in one process leave the previous coach's HBM buffers
    # lingering past GC and the next eager allocation dies with an opaque
    # INVALID_ARGUMENT on the axon runtime
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "noWD"
    if which == "noWD":
        measure("b4-noWD", 4, w_discriminator_lambda=0.0)
    elif which == "fp32":
        measure("b4-fp32-fused", 4)          # r5 default: fused W-D step
    elif which == "fp32-nofuse":
        measure("b4-fp32-UNfused", 4, fuse_d_step=False)  # r4 basis
    elif which == "fullbf16-selremat256":
        measure("b4-fullbf16+selremat256", 4, bf16_full=True,
                perception_bf16=True, remat_min_res=256)
    elif which == "fullbf16-selremat512":
        measure("b4-fullbf16+selremat512", 4, bf16_full=True,
                perception_bf16=True, remat_min_res=512)
    elif which == "bf16":
        measure("b4-bf16", 4, bf16=True)
    elif which == "pbf16":
        measure("b4-perception-bf16", 4, perception_bf16=True)
    elif which == "allbf16":
        measure("b4-decoder+perception-bf16", 4, bf16=True,
                perception_bf16=True)
    elif which == "fullbf16":
        measure("b4-fullbf16-decoder+perception", 4, bf16_full=True,
                perception_bf16=True)
    elif which == "fullbf16-noremat":
        import dataclasses
        globals()["gen_cfg"] = dataclasses.replace(gen_cfg, remat=False)
        measure("b4-fullbf16+perception-NO-remat", 4, bf16_full=True,
                perception_bf16=True)
    elif which == "encbf16":
        measure("b4-encoder-bf16", 4, encoder_bf16=True)
    elif which == "maxbf16":
        measure("b4-enc+dec+perception-bf16", 4, bf16=True,
                perception_bf16=True, encoder_bf16=True)
    elif which == "train_decoder":
        # batch 4 + decoder optimizer state misses the 15.75 GiB HBM by
        # 257 MiB (XLA compile-time OOM, measured 2026-08-20) — batch 2
        # is the 1024px --train_decoder ceiling on one v5e
        measure("b2-train_decoder", 2, train_decoder=True)
    elif which == "mem8":
        mem_analysis_batch8()
    else:
        raise SystemExit(f"unknown variant {which}")
