"""Benchmark: FFHQ-256 synthesis throughput (imgs/sec/chip).

The reference publishes no numbers (BASELINE.md); the baseline constant below
is a documented single-V100 estimate for StyleGAN2-ADA 256px generation with
the stock CUDA kernels (~60 imgs/s, fp16-upper-blocks inference, batch 16) —
used only to populate vs_baseline until a measured reference number exists.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis,
)

V100_REFERENCE_IMGS_PER_SEC = 60.0  # documented estimate, see module docstring

BATCH = 64
WARMUP = 3
ITERS = 20


def main():
    # FFHQ-256 full-size generator; bfloat16 on the top num_fp16_res blocks —
    # the TPU-native analogue of the fp16 policy NVIDIA's released pkls use.
    cfg = GeneratorConfig(img_resolution=256, low_precision_dtype="bfloat16")
    params = init_generator_params(jax.random.PRNGKey(0), cfg)

    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, cfg.z_dim))
    ws = mapping(params, cfg, z, truncation_psi=0.7)
    styles = w_to_s(params, cfg, ws)

    fn = jax.jit(lambda s: synthesis(params, cfg, s, noise_mode="const"))
    for _ in range(WARMUP):
        fn(styles).block_until_ready()

    # block on every output: async dispatch over tunneled devices can
    # otherwise mis-time the stream
    outs = []
    t0 = time.perf_counter()
    for _ in range(ITERS):
        outs.append(fn(styles))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    n_chips = max(1, len([d for d in jax.devices()]))
    value = imgs_per_sec / n_chips
    print(json.dumps({
        "metric": "ffhq256_synthesis_imgs_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(value / V100_REFERENCE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
