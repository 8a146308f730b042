"""Cross-seed direction-agreement A/B harness (VERDICT r4 item 3).

Reproduces bench.py's repeatability measurement under controlled,
version-portable conditions: fabricated FFHQ-256-class weights (the exact
PRNG streams bench.py uses), two find_direction runs differing ONLY in
fdc.seed (the batch-sampling stream), per-channel cosine between the two
directions.

The point: PARITY r2 recorded cross-seed cosine 0.986-1.0 (commit
040cab6, ad hoc — no script survived); r3/r4 bench reads 0.57-0.66. The
LR-schedule explanation was tested and refuted in r4. This harness runs
IDENTICALLY against any revision in the 040cab6..HEAD span (the API
subset here is stable across it), so the figure can be bisected — or the
old figure shown to be a different workload.

RESOLVED (r5, 2026-08-21). Measured on-TPU with this harness:
  040cab6 (round-2 code): mean 0.9917 min 0.9902, direction norms ~28
  HEAD                  : mean 0.5689 min 0.3936, direction norms ~13
Bisection over the span (same harness per worktree) flips at **cbdef49**
("Fix mapping init: store fc weights as randn/lr_multiplier"): before
the fix the fabricated network collapsed EVERY z to one w — measured
styles cross-seed std exactly 0.0 — so the r2 "different batch streams"
trained on identical data (loss flat at ~1.672 for every batch) and
agreed trivially. The honest post-fix band on random-CLIP weights is
0.57-0.66; bench.py gates it on mean>=0.45 AND min>=0.30 alongside the
golden-direction tripwire.

Pitfall that cost an hour: run comparison snippets as a FILE from /tmp,
not `python -` heredocs — for stdin scripts sys.path[0] is the CWD, so
a /root/repo CWD shadows the worktree's PYTHONPATH and both arms
silently import HEAD.

Usage:
  PYTHONPATH=<rev_worktree>:/root/.axon_site python xseed_ab.py [n_seeds]
"""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s)
from stylemc_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from stylemc_tpu.models.arcface import init_backbone_params
from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
from stylemc_tpu.train.find_direction import (FindDirectionConfig,
                                              find_direction)

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 129

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]

with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    clip_models = {
        name: (CLIP_CONFIGS[name],
               init_clip_params(jax.random.PRNGKey(i + 10),
                                CLIP_CONFIGS[name]))
        for i, name in enumerate(("ViT-B/32", "ViT-B/16"))
    }
    arcface = init_backbone_params(jax.random.PRNGKey(20))
    z = jax.random.normal(jax.random.PRNGKey(2), (N_SEEDS, cfg.z_dim))
    styles = w_to_s(params, cfg, mapping(params, cfg, z,
                                         truncation_psi=0.7))

to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
params = to_dev(params)
arcface = to_dev(arcface)
clip_models = {k: (c, to_dev(p)) for k, (c, p) in clip_models.items()}
styles_np = np.asarray(styles)
tok = FallbackTokenizer()


def run(seed):
    fdc = FindDirectionConfig(resolution=256, batch_size=4, n_epochs=4,
                              clip_type="double", seed=seed)
    t0 = time.perf_counter()
    d, info = find_direction(params, cfg, styles_np, clip_models, arcface,
                             fdc, tokenizer=tok)
    jax.block_until_ready(d)
    print(f"seed {seed}: {time.perf_counter() - t0:.1f}s "
          f"({info['iterations']} steps)", flush=True)
    return np.asarray(d)


def cosines(a, b):
    a, b = a.reshape(26, 512), b.reshape(26, 512)
    cs = []
    for i in range(26):
        na, nb = np.linalg.norm(a[i]), np.linalg.norm(b[i])
        if na > 1e-8 and nb > 1e-8:
            cs.append(float(a[i] @ b[i] / (na * nb)))
    return cs


d0, d1 = run(0), run(1)
cs = cosines(d0, d1)
print(f"norms: {np.linalg.norm(d0):.4f} / {np.linalg.norm(d1):.4f}")
print(f"cross-seed cosine mean {np.mean(cs):.4f} min {min(cs):.4f} "
      f"per-ch {[round(c, 3) for c in cs]}", flush=True)
