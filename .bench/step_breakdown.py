"""find_direction step-time decomposition on the TPU (batch 4, 256px)."""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses, functools, time
import numpy as np
import jax.numpy as jnp
import optax

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)
from stylemc_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from stylemc_tpu.models.arcface import init_backbone_params
from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
from stylemc_tpu.train.find_direction import (
    FindDirectionConfig, TRAINABLE, make_clip_bundles, make_loss_fn,
    precompute_original_features, until_k_for_resolution,
    _clip_image_features)
from stylemc_tpu.losses.id_loss import extract_feats

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
tok = FallbackTokenizer()
bundles = make_clip_bundles(fdc, clip_models, tokenizer=tok)
until_k = until_k_for_resolution(256)

def timeit(name, fn, *args, iters=20):
    """Chained timing: each call consumes a scalar derived from the previous
    call's output INSIDE the jitted graph, so device execution serializes
    without per-iteration eager ops (block_until_ready is launch-bound on
    the axon runtime — docs/performance.md). Two passes are printed; if they
    disagree the window was contended and the smaller one is closer to truth."""
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
        float(carry)  # scalar drain
        times.append((time.perf_counter() - t0) / iters)
    print(f"{name:42s} {times[0]*1e3:8.2f} / {times[1]*1e3:8.2f} ms"
          f"   (compile {compile_s:.0f}s)", flush=True)
    return min(times)

img = jax.jit(lambda gp, s: synthesis(gp, cfg, s, until_k=until_k, noise_mode="const"))(params, styles)
jax.block_until_ready(img)

# 1. synthesis forward only
timeit("synthesis fwd (b4, until_k=6, fp32)",
       jax.jit(lambda gp, s: synthesis(gp, cfg, s, until_k=until_k, noise_mode="const")), params, styles)

# 2. synthesis fwd+bwd wrt styles
timeit("synthesis fwd+bwd (fp32)",
       jax.jit(lambda gp, s: jax.grad(lambda ss: jnp.sum(jnp.square(
           synthesis(gp, cfg, ss, until_k=until_k, noise_mode="const"))))(s)), params, styles)

# 3/4. CLIP fwd+bwd wrt image
for name in ("ViT-B/32", "ViT-B/16"):
    b = [x for x in bundles if x.cfg is clip_models[name][0]][0]
    timeit(f"CLIP {name} fwd+bwd wrt img",
           jax.jit(lambda cp, im, b=b: jax.grad(lambda i: jnp.sum(
               _clip_image_features(b, i, "default", clip_params=cp)))(im)),
           clip_models[name][1], img)

# 5. arcface fwd+bwd
timeit("ArcFace fwd+bwd wrt img",
       jax.jit(lambda ap, im: jax.grad(lambda i: jnp.sum(
           extract_feats(ap, i)))(im)), arcface, img)

# 6. full step fp32 (bench graph, should be cached)
def build_step(c):
    id_f, clip_f = precompute_original_features(params, c, styles, bundles, arcface, fdc)
    loss_fn = make_loss_fn(params, c, bundles, arcface, fdc)
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=1.5)
    delta = jnp.zeros((1, len(TRAINABLE), 512), jnp.float32)
    os_ = opt.init(delta)
    mp = {"gen": params, "arc": arcface, "clip": [b.params for b in bundles]}
    def step(d, o, s, i_f, c_f, m):
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(d, s, i_f, c_f, m)
        u, o = opt.update(g, o, d)
        return optax.apply_updates(d, u), o, l
    return jax.jit(step), (delta, os_, styles, id_f, clip_f, mp)

step, args = build_step(cfg)
timeit("FULL STEP fp32 (bench graph)", step, *args)

cfg_bf16 = dataclasses.replace(cfg, low_precision_dtype="bfloat16")
step, args = build_step(cfg_bf16)
timeit("FULL STEP bf16-upper synthesis", step, *args)

fdc = dataclasses.replace(fdc, perception_dtype="bfloat16")
bundles = make_clip_bundles(fdc, clip_models, tokenizer=tok)
step, args = build_step(cfg_bf16)
timeit("FULL STEP bf16 synthesis+perception", step, *args)
