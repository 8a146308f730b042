"""Does a fresh host->device transfer per step explain the loop overhead?"""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses, time
import numpy as np, jax.numpy as jnp
import optax
from stylemc_tpu.models.stylegan2.generator import GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis
from stylemc_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from stylemc_tpu.models.arcface import init_backbone_params
from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
from stylemc_tpu.train.find_direction import (FindDirectionConfig, TRAINABLE,
    make_clip_bundles, make_loss_fn, precompute_original_features)

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
B, NSEEDS = 4, 129
with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    clip_models = {n: (CLIP_CONFIGS[n], init_clip_params(jax.random.PRNGKey(i+10), CLIP_CONFIGS[n]))
                   for i, n in enumerate(("ViT-B/32", "ViT-B/16"))}
    arcface = init_backbone_params(jax.random.PRNGKey(20))
    z = jax.random.normal(jax.random.PRNGKey(2), (NSEEDS, cfg.z_dim))
    styles_all = w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7))
to_dev = lambda t: jax.device_put(jax.tree_util.tree_map(np.asarray, t), dev)
params, arcface, styles_all = to_dev(params), to_dev(arcface), to_dev(styles_all)
clip_models = {k: (c, to_dev(p)) for k, (c, p) in clip_models.items()}
fdc = FindDirectionConfig(resolution=256, batch_size=B, clip_type="double")
bundles = make_clip_bundles(fdc, clip_models, tokenizer=FallbackTokenizer())
id_all, clip_all = precompute_original_features(params, cfg, styles_all, bundles, arcface, fdc)
loss_fn = make_loss_fn(params, cfg, bundles, arcface, fdc)
opt = optax.inject_hyperparams(optax.sgd)(learning_rate=1.5)
delta0 = jnp.zeros((1, len(TRAINABLE), 512), jnp.float32)
mp = {"gen": params, "arc": arcface, "clip": [b.params for b in bundles]}

pcfg = dataclasses.replace(cfg, low_precision_dtype="bfloat16")
pf = jax.jit(lambda s: synthesis(params, pcfg, s, noise_mode="const"))
ps = jax.device_put(np.asarray(styles_all[:64]), dev)
float(jnp.sum(pf(ps)))
def probe():
    x = ps; t0 = time.perf_counter()
    for _ in range(5): x = x + 0 * jnp.mean(pf(x))
    float(jnp.sum(x)); return (time.perf_counter()-t0)/5*1e3

@jax.jit
def step_fused(d, o, idx, lr, all_s, all_id, all_clip, m):
    o = o._replace(hyperparams=dict(o.hyperparams, learning_rate=lr))
    s = jnp.take(all_s, idx, axis=0)
    i_f = jnp.take(all_id, idx, axis=0)
    c_f = tuple(jnp.take(c, idx, axis=0) for c in all_clip)
    (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(d, s, i_f, c_f, m)
    u, o = opt.update(g, o, d)
    return optax.apply_updates(d, u), o, l

rng = np.random.RandomState(0)
idx_fixed = jnp.asarray(rng.randint(0, NSEEDS, size=B), jnp.int32)
lr_fixed = jnp.float32(1.0)

def run(mode, n=20):
    d, o = delta0, opt.init(delta0)
    d, o, l = step_fused(d, o, idx_fixed, lr_fixed, styles_all, id_all, clip_all, mp); float(l)
    t0 = time.perf_counter()
    for i in range(n):
        if mode == "fixed":
            idx, lr = idx_fixed, lr_fixed
        elif mode == "vary_idx":
            idx, lr = jnp.asarray(rng.randint(0, NSEEDS, size=B), jnp.int32), lr_fixed
        elif mode == "vary_lr":
            idx, lr = idx_fixed, jnp.float32(1.0 - i * 1e-3)
        else:
            idx, lr = jnp.asarray(rng.randint(0, NSEEDS, size=B), jnp.int32), jnp.float32(1.0 - i * 1e-3)
        d, o, l = step_fused(d, o, idx, lr, styles_all, id_all, clip_all, mp)
    float(l)
    return (time.perf_counter()-t0)/n*1e3

for rd in range(2):
    for mode in ("fixed", "vary_idx", "vary_lr", "vary_both"):
        p0 = probe(); ms = run(mode); p1 = probe()
        print(f"{mode:10s}: {ms:7.1f} ms/step  (probes {p0:.0f}/{p1:.0f})", flush=True)
