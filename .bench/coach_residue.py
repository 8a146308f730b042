"""Attribution of the coach step's NON-tower residue (VERDICT r4 item 1).

The r5 fused+pipelined coach step measures 338 ms fp32 / 262 ms bf16_full
on-device; the isolated towers sum to ~265 ms fp32 (r4 attribution) and
the no-W-D pipelined step reads 329 ms (W-D phase ≈ 9 ms end-to-end).
This harness times the residue candidates with TRUE loop-carried
chaining inside one scan (slope between two chain lengths cancels the
dispatch constant):

  1. the Ranger update alone over the real encoder-sized state — the
     params and optimizer state are the scan carry, so every iteration's
     update depends on the previous one and nothing hoists;
  2. the W-D phase (decoder mapping + encoder fwd + D update) — the
     discriminator state is carried and the image/z inputs are perturbed
     by the carried loss, so the encoder forward is loop-variant;
  3. the encoder forward alone (the duplicate fwd the D phase pays).

METHODOLOGY NOTE: the first version of this harness perturbed only the
first leaf of the first argument pytree; XLA hoisted everything not
downstream of that leaf out of the scan, producing a 1.26 ms "Ranger
update" (closed-over opt state = loop-invariant) and a negative encoder
slope. Chain through the REAL state or perturb the REAL data input.

MEASURED (2026-08-21): ranger update = 14.5 ms (two runs agree: 14.53 /
14.54). The W-D-phase and encoder-fwd sections hit the shared compile
service's broken-pipe failure mode on both attempts (docs/performance.md
"compile time is a first-class cost") — their end-to-end cost is pinned
instead by the noWD step A/B: full stack 338.1 vs no-W-D 329.1 ms/step
pipelined ⇒ the whole D phase (mapping + duplicate encoder fwd + D
update + lazy R1) costs ~9 ms/step on-device.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .bench/coach_residue.py
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax

from stylemc_tpu.models.e4e.encoders import (init_encoder_params,
                                             encoder4editing)
from stylemc_tpu.models.e4e.discriminator import (discriminator_apply,
                                                  init_discriminator_params)
from stylemc_tpu.models.stylegan2.generator import (GeneratorConfig,
                                                    init_generator_params,
                                                    mapping)
from stylemc_tpu.train.ranger import ranger

SIZE = 1024
cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]

with jax.default_device(cpu):
    enc = init_encoder_params(jax.random.PRNGKey(1), stylegan_size=SIZE)
    gen_cfg = GeneratorConfig(img_resolution=SIZE)
    gen = init_generator_params(jax.random.PRNGKey(0), gen_cfg)

to_dev = lambda t: jax.device_put(  # noqa: E731
    jax.tree_util.tree_map(np.asarray, t), dev)
enc = to_dev(enc)
gen_map = to_dev({"mapping": gen["mapping"]})
del gen
disc = to_dev(init_discriminator_params(jax.random.PRNGKey(2)))

n_bytes = sum(np.size(l) * 4 for l in jax.tree_util.tree_leaves(enc))
print(f"encoder params: {n_bytes / 2**30:.2f} GiB fp32")

opt = ranger(1e-4)
opt_state = jax.device_put(opt.init(enc), dev)
d_opt = optax.adam(2e-5)
d_opt_state = jax.device_put(d_opt.init(disc), dev)
x = jax.device_put(np.random.RandomState(0)
                   .randn(4, 3, 256, 256).astype(np.float32) * 0.3, dev)
z = jax.device_put(np.random.RandomState(1)
                   .randn(4, 512).astype(np.float32), dev)


def dispatch_slope(name, body_fn, init_carry, k_lo=4, k_hi=24, iters=3):
    """Cross-dispatch chaining: body_fn(carry) -> carry is ONE jit whose
    outputs feed the next dispatch's inputs (true data dependence, like
    the coach's donated-params step chain), drained once by a scalar
    fetch. Slope between two chain lengths cancels the drain constant;
    pipelined dispatches overlap the link latency. (A lax.scan over the
    same body at this state size built a graph the remote compile
    service drops with a broken pipe — cross-dispatch avoids the giant
    graph AND the loop-invariant-hoisting hazard.)"""
    # donate the carry: without it every in-flight dispatch holds a fresh
    # multi-GiB output while its input is still alive — k pipelined
    # dispatches of the 4 GiB Ranger carry RESOURCE_EXHAUSTED the chip
    jitted = jax.jit(body_fn, donate_argnums=(0,))
    per = {}
    t0 = time.perf_counter()
    # donation invalidates every input buffer: thread ONE live carry
    # through warmup and all measurement loops (reusing an old carry after
    # it was donated aborts with an opaque INVALID_ARGUMENT on axon)
    c = jitted(init_carry)
    jax.block_until_ready(jax.tree_util.tree_leaves(c)[0])
    compile_s = time.perf_counter() - t0
    for k in (k_lo, k_hi):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            for _ in range(k):
                c = jitted(c)
            float(jax.tree_util.tree_leaves(c)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        per[k] = best
    ms = 1e3 * (per[k_hi] - per[k_lo]) / (k_hi - k_lo)
    print(f"{name:46s} {ms:8.2f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return ms


# 1. Ranger update: carry (params, opt_state); grads := params (same
# shapes/traffic as real grads; values irrelevant to cost). The chain
# donates its carry, so it runs on a PRIVATE copy of enc — the W-D and
# encoder sections below still need the original buffers alive.
def ranger_body(carry):
    p, os_ = carry
    upd, os2 = opt.update(p, os_, p)
    return optax.apply_updates(p, upd), os2


enc_r = jax.tree_util.tree_map(jnp.array, enc)
dispatch_slope("ranger update (1 GiB e4e encoder state)", ranger_body,
               (enc_r, opt_state), k_lo=2, k_hi=10)
del enc_r


# 2. W-D phase: carry (disc, d_opt_state, tag); x/z perturbed by the
# carried tag so mapping+encoder forwards are loop-variant
def wd_body(carry):
    dp, dos, tag = carry
    real_w = mapping(gen_map, gen_cfg, z + tag)[:, 0, :]
    codes = encoder4editing(enc, x + tag, SIZE, 18)
    fake_w = jax.lax.stop_gradient(codes[:, 0, :])
    real_w = jax.lax.stop_gradient(real_w)

    def d_loss(d):
        rp = discriminator_apply(d, real_w)
        fp = discriminator_apply(d, fake_w)
        return (jnp.mean(jax.nn.softplus(-rp))
                + jnp.mean(jax.nn.softplus(fp)))

    loss, g = jax.value_and_grad(d_loss)(dp)
    upd, dos2 = d_opt.update(g, dos, dp)
    return optax.apply_updates(dp, upd), dos2, loss * 1e-20


dispatch_slope("W-D phase (map + enc fwd + D update)", wd_body,
               (disc, d_opt_state, jnp.float32(0.0)))


# 3. encoder forward alone: output-derived tag feeds the next input
def enc_body(tag):
    codes = encoder4editing(enc, x + tag, SIZE, 18)
    return codes.ravel()[0] * 1e-20


dispatch_slope("encoder fwd alone (the duplicate fwd)", enc_body,
               jnp.float32(0.0))
