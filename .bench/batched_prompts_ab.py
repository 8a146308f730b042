"""A/B on the TPU: serial DirectionEngine prompt sweep vs optimize_batch.

Workload: the BASELINE find_direction config (129 seeds, batch 4, 256px,
ViT-B/32+B/16 + ArcFace), P=4 prompts. The serial sweep runs P full
optimizations through one traced step; optimize_batch runs ONE vmapped
graph with a P-fold effective batch per dispatch. Expectation: the batched
run approaches the wall-clock of a single-prompt run until the chip
saturates (batch 4 under-fills the MXU).

Probe-bracketed per docs/performance.md. Short runs (n_epochs=1) keep the
A/B inside one contention window; steady ms/step is the figure of merit.
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time

import numpy as np
import jax.numpy as jnp

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)
from stylemc_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
from stylemc_tpu.models.arcface import init_backbone_params
from stylemc_tpu.train.find_direction import (FindDirectionConfig,
                                              DirectionEngine)

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
B, NSEEDS, P_EPOCHS = 4, 129, 1
PROMPTS = ["a face with a big smile", "an old face",
           "a face with glasses", "a surprised face"]

with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    clip_models = {n: (CLIP_CONFIGS[n],
                       init_clip_params(jax.random.PRNGKey(i + 10),
                                        CLIP_CONFIGS[n]))
                   for i, n in enumerate(("ViT-B/32", "ViT-B/16"))}
    arcface = init_backbone_params(jax.random.PRNGKey(20))
    z = jax.random.normal(jax.random.PRNGKey(2), (NSEEDS, cfg.z_dim))
    styles = w_to_s(params, cfg, mapping(params, cfg, z,
                                         truncation_psi=0.7))
to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
params, arcface, styles = to_dev(params), to_dev(arcface), to_dev(styles)
clip_models = {k: (c, to_dev(p)) for k, (c, p) in clip_models.items()}

fdc = FindDirectionConfig(resolution=256, batch_size=B, n_epochs=P_EPOCHS,
                          clip_type="double")
eng = DirectionEngine(params, cfg, np.asarray(jax.device_get(styles)),
                      clip_models, arcface, fdc,
                      tokenizer=FallbackTokenizer())

# contention probe: batch-64 synthesis fwd (fixed executable)
ps = jax.device_put(np.asarray(jax.device_get(styles))[:64], dev)
_probe = jax.jit(lambda s: synthesis(params, cfg, s, noise_mode="const"))
float(jnp.sum(_probe(ps)))


def probe():
    x = ps
    t0 = time.perf_counter()
    for _ in range(5):
        x = x + 0 * jnp.mean(_probe(x))
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / 5 * 1e3


def show(label, fn):
    p0 = probe()
    t0 = time.perf_counter()
    out = fn()
    wall = time.perf_counter() - t0
    p1 = probe()
    rel = abs(p1 - p0) / max(p0, p1)
    tag = "OK" if rel < 0.20 else "CONTENTION — DISCARD"
    print(f"{label}: wall {wall:.1f} s, probes {p0:.1f}/{p1:.1f} ms [{tag}]",
          flush=True)
    return out


# serial sweep (steps already traced after the first prompt)
infos = []
def serial():
    for p in PROMPTS:
        _, info = eng.optimize(p)
        infos.append(info)
show("serial 4-prompt sweep", serial)
for p, info in zip(PROMPTS, infos):
    print(f"  {p!r}: {info['time']:.1f} s"
          f" ({info.get('steady_ms_per_step', float('nan')):.0f} ms/step)")

def batched():
    return eng.optimize_batch(PROMPTS)
_, binfo = show("optimize_batch (P=4, one vmapped graph)", batched)
print(f"  batched: {binfo['time']:.1f} s"
      f" ({binfo.get('steady_ms_per_step', float('nan')):.0f} ms/step"
      f" for ALL 4 prompts)")
