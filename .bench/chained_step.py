import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses, time
import numpy as np, jax.numpy as jnp
import optax
from stylemc_tpu.models.stylegan2.generator import GeneratorConfig, init_generator_params, mapping, w_to_s
from stylemc_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from stylemc_tpu.models.arcface import init_backbone_params
from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
from stylemc_tpu.train.find_direction import (FindDirectionConfig, TRAINABLE,
    make_clip_bundles, make_loss_fn, precompute_original_features)

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
B = 4
with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    clip_models = {n: (CLIP_CONFIGS[n], init_clip_params(jax.random.PRNGKey(i+10), CLIP_CONFIGS[n]))
                   for i, n in enumerate(("ViT-B/32", "ViT-B/16"))}
    arcface = init_backbone_params(jax.random.PRNGKey(20))
    z = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.z_dim))
    styles = w_to_s(params, cfg, mapping(params, cfg, z, truncation_psi=0.7))
to_dev = lambda t: jax.device_put(jax.tree_util.tree_map(np.asarray, t), dev)
params, arcface, styles = to_dev(params), to_dev(arcface), to_dev(styles)
clip_models = {k: (c, to_dev(p)) for k, (c, p) in clip_models.items()}
fdc = FindDirectionConfig(resolution=256, batch_size=B, clip_type="double")
bundles = make_clip_bundles(fdc, clip_models, tokenizer=FallbackTokenizer())
id_f, clip_f = precompute_original_features(params, cfg, styles, bundles, arcface, fdc)
loss_fn = make_loss_fn(params, cfg, bundles, arcface, fdc)
opt = optax.inject_hyperparams(optax.sgd)(learning_rate=1.5)
delta = jnp.zeros((1, len(TRAINABLE), 512), jnp.float32)
os_ = opt.init(delta)
mp = {"gen": params, "arc": arcface, "clip": [b.params for b in bundles]}

@jax.jit
def step(d, o, s, i_f, c_f, m):
    (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(d, s, i_f, c_f, m)
    u, o = opt.update(g, o, d)
    return optax.apply_updates(d, u), o, l

d, o, l = step(delta, os_, styles, id_f, clip_f, mp)
float(l)  # warm + drain

N = 30
t0 = time.perf_counter()
for _ in range(N):
    d, o, l = step(d, o, styles, id_f, clip_f, mp)
float(l)
print(f"chained full step, no host work: {(time.perf_counter()-t0)/N*1e3:.1f} ms/step", flush=True)

styles_np = np.asarray(styles); idf_np = id_f; clipf_np = clip_f
rng = np.random.RandomState(0)
t0 = time.perf_counter()
for _ in range(N):
    o.hyperparams["learning_rate"] = jnp.asarray(1.0, jnp.float32)
    idx = rng.randint(0, B, size=B)
    s = styles_np[idx]; i2 = idf_np[idx]; c2 = tuple(c[idx] for c in clipf_np)
    d, o, l = step(d, o, s, i2, c2, mp)
float(l)
print(f"chained + loop host work:        {(time.perf_counter()-t0)/N*1e3:.1f} ms/step", flush=True)
