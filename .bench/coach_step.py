"""e4e Coach training-step time on the TPU (FFHQ-1024 decoder, 256px input).

Reference workload: encoder4editing ffhq_encode training — IR-SE-50
Encoder4Editing + rosinality 1024 decoder, L2 + LPIPS(alex) + ArcFace ID
losses + W-discriminator with R1, Ranger optimizer (reference coach.py
:105-149, :232-278). `Coach.train_step` extracts python floats per step,
so wall-clock timing over steps is completion-bound (no chained carry
needed, unlike pure-jit probes — docs/performance.md).
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

BATCH = 4
SIZE = 1024

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    gen_cfg = GeneratorConfig(img_resolution=SIZE, remat=True)
    gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    enc_params = init_encoder_params(jax.random.PRNGKey(1), stylegan_size=SIZE)
    perception = {"lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
                  "arcface": init_backbone_params(jax.random.PRNGKey(3))}
    n_ws = 2 * int(np.log2(SIZE)) - 2

to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
psp = PSP(cfg=PSPConfig(stylegan_size=SIZE),
          encoder_params=to_dev(enc_params),
          decoder_cfg=gen_cfg, decoder_params=to_dev(gen_params),
          latent_avg=jnp.zeros((n_ws, 512)))
perception = to_dev(perception)

rng = np.random.RandomState(0)


def train_iter():
    x = rng.randn(BATCH, 3, 256, 256).astype(np.float32) * 0.3
    return x, x.copy()


# reference ffhq_encode config: L2 1.0, LPIPS 0.8, ID 0.1, W-D 0.1
opts = CoachOptions(batch_size=BATCH, stylegan_size=SIZE,
                    l2_lambda=1.0, lpips_lambda=0.8, id_lambda=0.1,
                    w_discriminator_lambda=0.1)
coach = Coach(opts, psp, perception, train_iter, test_iter=train_iter)

x, y = train_iter()
t0 = time.perf_counter()
coach.train_step(x, y)
print(f"first step (trace+compile): {time.perf_counter() - t0:.1f} s",
      flush=True)

for tag, iters in (("pass1", 10), ("pass2", 10), ("pass3", 10)):
    t0 = time.perf_counter()
    for _ in range(iters):
        x, y = train_iter()
        coach.train_step(x, y)
    dt = (time.perf_counter() - t0) / iters
    print(f"coach train_step {tag}: {dt * 1e3:.1f} ms/step "
          f"({BATCH / dt:.1f} imgs/s)", flush=True)
