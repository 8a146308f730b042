"""Benchmarks.

Line 1 (primary): FFHQ-256 synthesis throughput (imgs/sec/chip).
Line 2 (north star, BASELINE.md): find_direction wall-clock — 129 seeds,
batch 4, 256px, 4 epochs (the README.md:24-26 reference workload), warm,
with an MFU estimate from the compiled step's XLA cost analysis.

The reference publishes no numbers (BASELINE.md); baseline constants below
are documented estimates used only to populate vs_baseline until a measured
reference number exists.

Weights: set STYLEMC_NETWORK to a real .pkl/.npz to bench it; otherwise a
full-size FFHQ-256 checkpoint is fabricated once into /tmp in the NVIDIA
pickle format and loaded through io.pickle_loader — so the bench exercises
the real import path and realistic init-scale magnitudes (conv_clamp=256,
bf16 upper blocks). Each JSON line notes which weights were used.

Prints one JSON line per metric:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import os
import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis,
)

# Documented single-V100 estimates (no published reference numbers exist):
# ~60 imgs/s StyleGAN2-ADA 256px generation (fp16 upper blocks, batch 16);
# ~60 s for the 129-seed/4-epoch find_direction run (fork README workload,
# ViT-B/32+B/16 + ArcFace at 256px ≈ 450 ms/step × 132 steps).
V100_REFERENCE_IMGS_PER_SEC = 60.0
V100_REFERENCE_FIND_DIRECTION_SEC = 60.0

BATCH = 64
WARMUP = 3
ITERS = 20

# bf16 peak FLOPs/s per chip for the MFU estimate, by device kind prefix.
# MFU accounting note: every on-chip matmul/conv in this bench executes as
# bf16 MXU passes — the "fp32" runs use JAX's default matmul precision
# (bf16 multiplies, fp32 accumulation — docs/performance.md "Matmul
# precision policy"), so bf16 peak is the MATCHED denominator for both the
# fp32-param and bf16-param steps; the numerator is XLA's cost-analysis
# FLOPs for that same compiled graph.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 394e12, "TPU v5e": 394e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12, "TPU v6 lite": 918e12,
}


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for prefix, peak in _PEAK_FLOPS.items():
        if kind.startswith(prefix):
            return peak
    return 394e12  # default: v5e


def _compiled_flops(compiled) -> float:
    """XLA cost-analysis FLOPs of a compiled jit (0.0 if unavailable)."""
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost.get("flops", 0.0))
    except Exception as e:
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)
        return 0.0


# Set by main() when the TPU backend is unreachable (the axon tunnel hangs
# *any* device query, even backend="cpu", during plugin discovery — so the
# probe must run in a subprocess with a timeout BEFORE this process touches
# jax devices). In fallback mode the bench runs a reduced CPU workload and
# every JSON line is annotated; numbers are then NOT comparable to TPU runs.
_CPU_FALLBACK_NOTE = None


def _tpu_reachable(timeout_s: float) -> bool:
    """Probe default-backend initialization in a throwaway subprocess.

    Requires a non-CPU device: if the accelerator plugin import-fails (jax
    silently falls back to CPU) the probe must fail too, or the full-scale
    workload would run on CPU with numbers reported as TPU-comparable.
    A success marker under /tmp skips re-probing (and the duplicate slow
    backend init it costs) for 10 minutes.
    """
    import subprocess

    marker = "/tmp/stylemc_tpu_probe_ok"
    try:
        if time.time() - os.path.getmtime(marker) < 600:
            return True
    except OSError:
        pass
    code = ("import jax; d = jax.devices(); "
            "assert any(x.platform != 'cpu' for x in d), d")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(f"# tpu probe rc={r.returncode}: {r.stderr.strip()[-200:]}",
                  file=sys.stderr)
            return False
        with open(marker, "w") as f:
            f.write(str(time.time()))
        return True
    except subprocess.TimeoutExpired:
        print(f"# tpu probe timed out after {timeout_s:.0f}s", file=sys.stderr)
        return False


def _cpu():
    return jax.local_devices(backend="cpu")[0]


def _get_network():
    """(cfg, params, tag): STYLEMC_NETWORK if set, else a fabricated
    full-size FFHQ-256 NVIDIA-format pickle loaded through the real import
    path (cached in /tmp). Everything runs on the host CPU — eager op
    dispatch over a tunneled TPU is pathological; the hot loops device_put
    or jit onto the accelerator afterwards."""
    from stylemc_tpu.io import load_generator

    with jax.default_device(_cpu()):
        env = os.environ.get("STYLEMC_NETWORK")
        if env and os.path.exists(env):
            cfg, params = load_generator(env)
            return cfg, params, os.path.basename(env)

        cache = "/tmp/stylemc_bench_ffhq256.pkl"
        if not os.path.exists(cache):
            sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                            "tests"))
            from test_pickle_loader import fabricate_pkl

            cfg0 = GeneratorConfig(img_resolution=256)
            params0 = init_generator_params(jax.random.PRNGKey(0), cfg0)
            fabricate_pkl("/tmp", cfg0, params0)
            os.replace("/tmp/fake_network.pkl", cache)
        cfg, params = load_generator(cache)
    return cfg, params, "fabricated-ffhq256.pkl (random init via loader)"


# The chip is shared; contention is bursty (minutes-scale). Each benchmark
# waits (bounded by this shared budget) for a clean probe so recorded
# numbers reflect the framework, not foreign load. docs/performance.md.
_PROBE_BUDGET_S = [420.0]
_PROBE = {}
# Probe verdict bands: _wait_clean first blocks past gross contention
# (>150 ms), then — budget permitting — keeps retrying down into the
# documented clean band (probe reads ~65-66 ms clean;
# docs/performance.md) before a measurement starts. probe_clean on each
# JSON line applies the same strict band, so a mildly-contended window is
# recorded as such rather than stamped clean (BENCH_r02's 68.3 ms and
# r03's 68.0 ms headline probes motivated this — VERDICT r3 weak #1).
_CLEAN_PROBE_MS = 66.0
_PROBE_ITERS = 8


def _probe_ms() -> float:
    """Chained batch-64 synthesis probe; ~62-64 ms clean, 300+ contended.

    8 chained iterations: the old 3-iteration probe carried ~7 ms/call of
    fixed dispatch+drain overhead and read 68-69 ms in windows where the
    20-iteration measurement loop read the documented-clean 61 ms/call
    (observed 2026-08-20), so it could never certify the 61-66 ms band.
    More iterations amortize the same overhead to ~1-2 ms/call, putting
    the clean probe back inside the band it is checked against."""
    fn, styles = _PROBE["fn"], _PROBE["styles"]
    x = styles
    t0 = time.perf_counter()
    for _ in range(_PROBE_ITERS):
        x = x + 0 * jnp.mean(fn(x))
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / _PROBE_ITERS * 1e3


def _wait_clean(threshold_ms: float = 150.0) -> float:
    """Burn shared budget until the probe is clean; returns last reading.

    Two stages: long sleeps while grossly contended (>threshold_ms), then
    shorter sleeps chasing the strict _CLEAN_PROBE_MS band so headline
    lines are stamped probe_clean=True only for genuinely clean windows.
    If the budget runs dry first, the caller records the dirty probe and
    probe_clean=False — honest, not hidden."""
    ms = _probe_ms()
    while ms > threshold_ms and _PROBE_BUDGET_S[0] > 0:
        print(f"# contention probe {ms:.0f} ms — waiting", file=sys.stderr)
        wait = min(45.0, _PROBE_BUDGET_S[0])
        time.sleep(wait)
        _PROBE_BUDGET_S[0] -= wait
        ms = _probe_ms()
    while ms > _CLEAN_PROBE_MS and _PROBE_BUDGET_S[0] > 0:
        print(f"# probe {ms:.0f} ms above clean band "
              f"({_CLEAN_PROBE_MS:.0f} ms) — waiting", file=sys.stderr)
        wait = min(20.0, _PROBE_BUDGET_S[0])
        time.sleep(wait)
        _PROBE_BUDGET_S[0] -= wait
        ms = _probe_ms()
    return ms


def bench_synthesis(cfg, params, weights_tag):
    import dataclasses

    from stylemc_tpu.models.stylegan2.generator import inference_cfg

    # bfloat16 on the top num_fp16_res blocks — the TPU-native analogue of
    # the fp16 policy NVIDIA's released pkls use; pad_dilate up-convs (the
    # fastest pure-forward impl — inference_cfg docstring)
    cfg = inference_cfg(
        dataclasses.replace(cfg, low_precision_dtype="bfloat16"))
    with jax.default_device(_cpu()):
        z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, cfg.z_dim))
        ws = mapping(params, cfg, z, truncation_psi=0.7)
        styles = w_to_s(params, cfg, ws)
    styles = jax.device_put(np.asarray(styles), jax.devices()[0])
    params = jax.device_put(jax.tree_util.tree_map(np.asarray, params),
                            jax.devices()[0])

    fn = jax.jit(lambda s: synthesis(params, cfg, s, noise_mode="const"))
    for _ in range(WARMUP):
        np.asarray(fn(styles))  # data fetch: full warm + queue drain
    _PROBE.update(fn=fn, styles=styles)
    probe = _wait_clean() if _CPU_FALLBACK_NOTE is None else None

    # CHAINED timing: each call's input depends on the previous output, and
    # the loop is drained by a scalar fetch. On the axon runtime
    # block_until_ready() is launch-bound, not completion-bound — timing a
    # list of independent calls under-waits and overstates throughput ~1.7x
    # (measured: 60.7 ms/call list-blocked vs 118.9 ms/call chained vs
    # 101.6 ms/call scalar-fetched, batch 64). The chain serializes real
    # device execution; the 0·mean(img) add is negligible.
    s = styles
    t0 = time.perf_counter()
    for _ in range(ITERS):
        img = fn(s)
        s = s + 0 * jnp.mean(img)
    float(jnp.sum(s))  # scalar drain
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    n_chips = max(1, len(jax.devices()))
    value = imgs_per_sec / n_chips
    line = {
        "metric": "ffhq256_synthesis_imgs_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(value / V100_REFERENCE_IMGS_PER_SEC, 3),
        "weights": weights_tag,
    }
    # synthesis MFU: bf16 graph over bf16 peak (matched bases)
    flops = _compiled_flops(fn.lower(styles).compile())
    if flops > 0 and _CPU_FALLBACK_NOTE is None:
        line["mfu_bf16_vs_bf16_peak"] = round(
            flops * (ITERS / dt) / _peak_flops(), 4)
    if probe is not None:
        line["contention_probe_ms"] = round(probe, 1)
        line["probe_iters"] = _PROBE_ITERS  # r4: 3 → 8 (overhead amortized)
        line["probe_clean"] = bool(probe <= _CLEAN_PROBE_MS)
    if _CPU_FALLBACK_NOTE is not None:
        line["device"] = _CPU_FALLBACK_NOTE
        line["comparable_to_tpu_rounds"] = False
    print(json.dumps(line))


def bench_find_direction(cfg, params, weights_tag):
    import optax

    from stylemc_tpu.models.clip import CLIP_CONFIGS, init_clip_params
    from stylemc_tpu.models.arcface import init_backbone_params
    from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
    from stylemc_tpu.train.find_direction import (
        FindDirectionConfig, TRAINABLE, find_direction, make_clip_bundles,
        make_loss_fn, precompute_original_features,
    )

    # steps_per_dispatch=33: lax.scan batches one epoch of steps per
    # dispatch — numerics identical to the unrolled loop
    # (test_find_direction_steps_per_dispatch_matches_unrolled); with the
    # step retrace gone the per-step link latency dominates the warm loop.
    # On-chip sweep (.bench/k_dispatch_sweep.py): K=1 8.74 s, K=10 5.65,
    # K=33 5.35 (40.5 ms/step, the knee), K=66/132 flat at 5.35-5.37.
    fdc = FindDirectionConfig(resolution=256, batch_size=4, n_epochs=4,
                              clip_type="double", steps_per_dispatch=33)
    # init on host CPU; jit/device_put moves everything onto the chip
    with jax.default_device(_cpu()):
        clip_models = {
            name: (CLIP_CONFIGS[name],
                   init_clip_params(jax.random.PRNGKey(i + 10),
                                    CLIP_CONFIGS[name]))
            for i, name in enumerate(("ViT-B/32", "ViT-B/16"))
        }
        arcface = init_backbone_params(jax.random.PRNGKey(20))
        # the README.md:24-26 reference workload: 129 seeds
        n_seeds = 129
        z = jax.random.normal(jax.random.PRNGKey(2), (n_seeds, cfg.z_dim))
        styles = w_to_s(params, cfg,
                        mapping(params, cfg, z, truncation_psi=0.7))
    tokenizer = FallbackTokenizer()

    dev = jax.devices()[0]
    to_dev = lambda t: jax.device_put(  # noqa: E731
        jax.tree_util.tree_map(np.asarray, t), dev)
    params = to_dev(params)
    arcface = to_dev(arcface)
    clip_models = {k: (c, to_dev(p)) for k, (c, p) in clip_models.items()}
    styles = to_dev(styles)

    def run(st=None):
        t0 = time.perf_counter()
        direction, info = find_direction(params, cfg,
                                         np.asarray(st if st is not None
                                                    else styles),
                                         clip_models, arcface, fdc,
                                         tokenizer=tokenizer)
        jax.block_until_ready(direction)
        return time.perf_counter() - t0, info, direction

    run()                      # cold: compile + feature-cache warm-up
    probe = _wait_clean() if _PROBE else None
    total, info, direction = run()   # warm: the measured number
    # a probe only protects the start; if a contention burst arrived
    # mid-run (post-probe reads dirty), retry once within the budget and
    # keep the faster attempt — contention only ever ADDS time
    if _PROBE and _PROBE_BUDGET_S[0] > 0 and _probe_ms() > 150:
        probe = _wait_clean()
        total2, info2, direction2 = run()
        if info2["time"] < info["time"]:
            total, info, direction = total2, info2, direction2
    # the comparable number is the optimization loop, matching the
    # reference's `time passed` instrumentation (find_direction.py:291,353
    # brackets the loop, not model loading / feature extraction)
    elapsed = info["time"]
    steps = info["iterations"]
    ms_per_step = 1e3 * elapsed / max(steps, 1)

    # MFU from the compiled step's XLA FLOPs (the same value_and_grad + SGD
    # graph find_direction jits; compile hits the persistent cache). The
    # fp32-param step executes its matmuls/convs as bf16 MXU passes under
    # JAX's default matmul precision, so bf16 peak is the matched
    # denominator (see _PEAK_FLOPS note); step_flops is reused below for
    # the bf16 variant's own MFU.
    mfu = None
    step_flops = 0.0
    try:
        bundles = make_clip_bundles(fdc, clip_models, tokenizer=tokenizer)
        id_f, clip_f = precompute_original_features(
            params, cfg, styles[:fdc.batch_size], bundles, arcface, fdc)
        loss_fn = make_loss_fn(params, cfg, bundles, arcface, fdc)
        optimizer = optax.inject_hyperparams(optax.sgd)(learning_rate=1.5)
        delta = jnp.zeros((1, len(TRAINABLE), 512), jnp.float32)
        opt_state = optimizer.init(delta)
        mp = {"gen": params, "arc": arcface, "clip": [b.params for b in bundles]}

        def step(d, os_, s, i_f, c_f, m):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                d, s, i_f, c_f, m)
            upd, os_ = optimizer.update(grads, os_, d)
            return optax.apply_updates(d, upd), os_, loss

        compiled = jax.jit(step).lower(
            delta, opt_state, styles[:fdc.batch_size], id_f, clip_f,
            mp).compile()
        step_flops = _compiled_flops(compiled)
        if step_flops > 0:
            mfu = step_flops * (steps / elapsed) / _peak_flops()
    except Exception as e:  # cost analysis is best-effort
        print(f"# mfu estimate unavailable: {e}", file=sys.stderr)

    out = {
        "metric": "find_direction_129seed_wall_clock",
        "value": round(elapsed, 2),
        "unit": "seconds (warm, 129 seeds, batch 4, 256px, 4 epochs)",
        "vs_baseline": round(V100_REFERENCE_FIND_DIRECTION_SEC / elapsed, 3),
        "ms_per_step": round(ms_per_step, 1),
        "steps": steps,
        "total_incl_precompute_sec": round(total, 2),
        "weights": weights_tag,
        "steps_per_dispatch": fdc.steps_per_dispatch,
    }
    # steady-state step time excludes the one-time per-call cost (tracing +
    # compile-cache load of the step graph) folded into the wall-clock;
    # 45.2 ms/step is the chained-timing clean-window reference value
    # (.bench/step_breakdown.py; docs/performance.md)
    if "steady_ms_per_step" in info:
        out["steady_ms_per_step"] = round(info["steady_ms_per_step"], 1)
        out["first_step_s"] = round(info["first_step_time"], 2)
    if probe is not None:
        out["contention_probe_ms"] = round(probe, 1)
        out["probe_iters"] = _PROBE_ITERS
        out["probe_clean"] = bool(probe <= _CLEAN_PROBE_MS)
    if mfu is not None:
        # fp32 params, default matmul precision → bf16 MXU passes: bf16
        # peak is the matched basis (was misnamed mfu_vs_bf16_peak in r2)
        out["mfu_default_precision_vs_bf16_peak"] = round(mfu, 4)
        out["matmul_precision"] = ("default (fp32 params; bf16 multiplies, "
                                   "fp32 accumulation on the MXU)")

    # reference-precision variant: the NVIDIA FFHQ pkls bake in
    # num_fp16_res=4 (top synthesis blocks run fp16 in the reference's
    # find_direction) and clip.load casts CLIP to half on CUDA — so bf16
    # upper blocks + bf16 perception is the faithful precision analogue
    # (--bf16 --perception_bf16; direction cosine 0.998 vs fp32, PARITY.md)
    # and the fp32 headline above is strictly MORE conservative than the
    # reference's own numerics.
    try:
        import dataclasses as _dc
        fdc_bf16 = _dc.replace(fdc, perception_dtype="bfloat16")
        cfg_bf16 = _dc.replace(cfg, low_precision_dtype="bfloat16")

        def run_bf16():
            t0 = time.perf_counter()
            d, i = find_direction(params, cfg_bf16, np.asarray(styles),
                                  clip_models, arcface, fdc_bf16,
                                  tokenizer=tokenizer)
            jax.block_until_ready(d)
            return time.perf_counter() - t0, i

        run_bf16()                                 # compile
        if _PROBE:
            _wait_clean()
        _, info_bf16 = run_bf16()
        out["reference_precision_bf16_sec"] = round(info_bf16["time"], 2)
        out["reference_precision_bf16_ms_per_step"] = round(
            1e3 * info_bf16["time"] / max(info_bf16["iterations"], 1), 1)
        if step_flops > 0:
            # bf16 step over bf16 peak — matched bases. Numerator: cost
            # analysis of the fp32-param step graph; the bf16 graph runs
            # the identical op sequence (dtype aside), so logical FLOPs
            # are the same.
            out["mfu_bf16_vs_bf16_peak"] = round(
                step_flops * (info_bf16["iterations"] / info_bf16["time"])
                / _peak_flops(), 4)
    except Exception as e:  # the fp32 headline stands on its own
        print(f"# bf16 reference-precision variant unavailable: {e}",
              file=sys.stderr)

    # direction-zoo P=4 batched-prompt config (VERDICT r4 item 4): the
    # prompt axis is the documented way to fill the chip past the
    # reference's batch-4 occupancy floor; the on-chip sweep
    # (.bench/zoo_psweep.py, 2026-08-21, clean probes) reads per-direction
    # wall 9.14 s (P=1) → 5.65 (P=4) → 5.61 (P=8): ~1.6× throughput at
    # P=4, chip saturated beyond. Gated: STYLEMC_BENCH_ZOO=0 skips.
    if os.environ.get("STYLEMC_BENCH_ZOO", "1") != "0":
        try:
            from stylemc_tpu.train.find_direction import DirectionEngine

            eng = DirectionEngine(params, cfg, np.asarray(styles),
                                  clip_models, arcface, fdc,
                                  tokenizer=tokenizer)
            prompts = [fdc.text_prompt, "a face with a big smile",
                       "an old face with wrinkles",
                       "a face with curly hair"]
            eng.optimize_batch(prompts)            # compile
            if _PROBE:
                _wait_clean()
            t0 = time.perf_counter()
            _, zinfo = eng.optimize_batch(prompts)
            zwall = time.perf_counter() - t0
            out["zoo_p4_wall_sec"] = round(zwall, 2)
            out["zoo_p4_per_direction_sec"] = round(zwall / 4, 2)
            out["zoo_p4_steady_ms_per_step"] = round(
                zinfo["steady_ms_per_step"], 1)
        except Exception as e:
            print(f"# zoo P=4 variant unavailable: {e}", file=sys.stderr)

    # Direction quality, not just speed (VERDICT r2 item 6): re-run the
    # fp32 optimization with a different batch-sampling seed and report
    # the per-channel cosine between the two directions (PARITY's
    # "Direction robustness" measurement, threshold ≥0.98 mean at 4
    # epochs) — a numerics regression that leaves wall-clock unchanged
    # shows up here.
    def _dir_cosines(a, b):
        a = np.asarray(a).reshape(26, 512)
        b = np.asarray(b).reshape(26, 512)
        cs = []
        for i in range(26):
            na, nb = np.linalg.norm(a[i]), np.linalg.norm(b[i])
            if na > 1e-8 and nb > 1e-8:
                cs.append(float(a[i] @ b[i] / (na * nb)))
        return cs

    try:
        import dataclasses as _dc
        fdc_seed1 = _dc.replace(fdc, seed=1)
        d1, _ = find_direction(params, cfg, np.asarray(styles),
                               clip_models, arcface, fdc_seed1,
                               tokenizer=tokenizer)
        cosines = _dir_cosines(direction, d1)
        if cosines:
            # Measured band on these fabricated weights: mean 0.57-0.66
            # (deterministically 0.5689/min 0.3936 for this seed pair,
            # r3-r5). ROOT-CAUSED in r5 (.bench/xseed_ab.py bisection):
            # PARITY r2's old 0.986-1.0 figure was an artifact of the
            # pre-cbdef49 mapping-init bug — the fabricated network
            # collapsed every z to ONE w (styles cross-seed std exactly
            # 0.0), so "different batch streams" trained on identical
            # data and agreed trivially. cbdef49 (the r3 fix) made seeds
            # genuinely diverge; on random-CLIP weights different batch
            # subsets then honestly descend toward moderately different
            # directions. (r4's LR-schedule hypothesis was tested and
            # refuted: constant-LR reads the same 0.57 band.) The
            # tracked contract: a numerics regression (NaN, sign flip,
            # broken loss, single-channel-family collapse) trips the
            # mean or the min alert below.
            out["direction_repeatability_cosine_mean"] = round(
                float(np.mean(cosines)), 4)
            out["direction_repeatability_cosine_min"] = round(
                min(cosines), 4)
            out["direction_repeatability_alert_below"] = 0.45
            out["direction_repeatability_min_alert_below"] = 0.30
            out["direction_repeatability_pass"] = bool(
                np.mean(cosines) >= 0.45 and min(cosines) >= 0.30)
    except Exception as e:
        print(f"# repeatability check unavailable: {e}", file=sys.stderr)

    # Tight numerics tripwires (VERDICT r3 item 4) next to the loose
    # catastrophic alert above — graded so a ~10% numerics drift trips at
    # least one even when wall-clock and the faithful-LR cosine look fine:
    # (a) same-seed determinism: an identical fp32 re-run must reproduce
    #     the direction exactly (bitwise on this stack; threshold cosine
    #     >=0.9999) — catches nondeterminism and precision drift;
    # (b) constant-LR cross-seed repeatability: under lr_schedule=
    #     'constant' the direction is a late-step average and seed-stable
    #     (the regime PARITY.md measured at 0.986-1.0); threshold >=0.98.
    try:
        _, _, d_same = run()
        same = _dir_cosines(direction, d_same)
        out["direction_same_seed_cosine_min"] = round(min(same), 6)
        out["direction_same_seed_bitwise"] = bool(np.array_equal(
            np.asarray(direction), np.asarray(d_same)))
        out["direction_same_seed_pass"] = bool(min(same) >= 0.9999)
    except Exception as e:
        print(f"# same-seed determinism check unavailable: {e}",
              file=sys.stderr)
    # (b) golden-direction check: the whole workload is deterministic
    #     (fabricated weights from fixed PRNG keys, seed-0 batch stream),
    #     so the fp32 direction is a reproducible constant of the codebase
    #     — compare against the committed golden at >=0.98. Any numerics
    #     change (coefficient drift, precision change, broken loss) moves
    #     this even when wall-clock and the loose cross-seed cosine look
    #     normal; an intentional numerics change re-blesses the golden via
    #     STYLEMC_BENCH_WRITE_GOLDEN=1.
    #     NOTE a constant-LR cross-seed run was measured as the alternative
    #     tripwire and REFUTED: cosine mean 0.5654 (seeds 0/1, 2026-08-20)
    #     — the same band as the faithful cosine-LR schedule's 0.5689.
    #     The r5 bisection then found the actual cause of the old 0.986
    #     figure (see the repeatability comment above): the pre-cbdef49
    #     mapping-collapse bug made every seed identical, so the old
    #     measurement compared runs over the same data.
    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench", "golden_direction_fp32.npz")
    try:
        if os.environ.get("STYLEMC_BENCH_WRITE_GOLDEN") == "1":
            np.savez(golden_path, s=np.asarray(direction),
                     note="seed-0 fp32 find_direction on the fabricated "
                          "FFHQ-256 bench network (bench.py golden)")
            print(f"# wrote golden direction to {golden_path}",
                  file=sys.stderr)
        if os.path.exists(golden_path) and weights_tag.startswith(
                "fabricated"):
            golden = np.load(golden_path)["s"]
            gcs = _dir_cosines(direction, golden)
            out["direction_vs_golden_cosine_mean"] = round(
                float(np.mean(gcs)), 4)
            out["direction_vs_golden_alert_below"] = 0.98
            out["direction_vs_golden_pass"] = bool(np.mean(gcs) >= 0.98)
    except Exception as e:
        print(f"# golden direction check unavailable: {e}", file=sys.stderr)

    # Per-phase step decomposition (VERDICT r2 item 3): chained-timed
    # fwd+bwd of each constituent graph, so a future regression in
    # BENCH_r*.json is attributable to a phase without re-deriving
    # .bench/step_breakdown.py. Gated (STYLEMC_BENCH_BREAKDOWN=0 skips);
    # the graphs match step_breakdown.py's, so the persistent compile
    # cache usually makes this seconds, not minutes.
    if os.environ.get("STYLEMC_BENCH_BREAKDOWN", "1") != "0":
        try:
            from stylemc_tpu.losses.id_loss import extract_feats
            from stylemc_tpu.train.find_direction import (
                _clip_image_features, until_k_for_resolution,
            )

            until_k = until_k_for_resolution(fdc.resolution)
            bs = styles[:fdc.batch_size]
            img = jax.jit(lambda gp, s: synthesis(
                gp, cfg, s, until_k=until_k, noise_mode="const"))(params, bs)
            jax.block_until_ready(img)

            def chained_ms(fn, vary, *consts, k_lo=2, k_hi=12, iters=6):
                """IN-GRAPH per-iteration time: fn(vary, *consts) is
                chained k times under lax.scan inside ONE jit; the slope
                between a short and a long chain cancels the per-dispatch
                link/drain constant. The r≤4 basis (8 separate
                dispatches/phase) carried that constant in full — ArcFace
                read ~40 ms where its in-graph cost is 2-4 ms (VERDICT r4
                weak #5); these figures are directly comparable to the
                .bench/step_breakdown.py / docs/performance.md numbers.

                `vary` MUST be the input that feeds the whole graph (the
                styles/image batch): every one of its leaves gets the
                loop carry added, which defeats XLA loop-invariant
                hoisting. (Perturbing only the first leaf of a params
                pytree let XLA hoist the entire body out of the scan —
                a synthesis slope read ~0 and an encoder slope read
                NEGATIVE in the first version of this harness.)"""
                vleaves, vdef = jax.tree_util.tree_flatten(vary)
                cleaves, cdef = jax.tree_util.tree_flatten(consts)

                def make(k):
                    @jax.jit
                    def chained(carry, vls, cls):
                        def body(c, _):
                            v2 = [l + c.astype(l.dtype) for l in vls]
                            o = fn(jax.tree_util.tree_unflatten(vdef, v2),
                                   *jax.tree_util.tree_unflatten(cdef,
                                                                 cls))
                            first = jax.tree_util.tree_leaves(o)[0]
                            return (first.ravel()[0].astype(jnp.float32)
                                    * 1e-20), None
                        c, _ = jax.lax.scan(body, carry, None, length=k)
                        return c
                    return chained

                # each rep is ONE timed dispatch (scalar-drained) and the
                # per-k figure is the MIN over reps: a contention burst
                # hitting one chain length otherwise corrupts the slope
                # by burst/(k_hi-k_lo) — the first version of this code
                # timed 4 consecutive calls in one window and a burst
                # produced a NEGATIVE ViT-B/16 figure
                per_call = {}
                for k in (k_lo, k_hi):
                    ch = make(k)
                    carry = jnp.float32(0.0)
                    warm = ch(carry, vleaves, cleaves)   # compile
                    jax.block_until_ready(warm)
                    best = float("inf")
                    for _ in range(iters):
                        t0 = time.perf_counter()
                        out = ch(carry, vleaves, cleaves)
                        float(out)
                        best = min(best, time.perf_counter() - t0)
                    per_call[k] = best
                return (1e3 * (per_call[k_hi] - per_call[k_lo])
                        / (k_hi - k_lo))

            def run_phases():
                phases = {}
                phases["synthesis_fwd_bwd_ingraph_ms"] = chained_ms(
                    lambda s, gp: jax.grad(lambda ss: jnp.sum(jnp.square(
                        synthesis(gp, cfg, ss, until_k=until_k,
                                  noise_mode="const"))))(s), bs, params)
                for name, key in (("ViT-B/32", "clip_b32_fwd_bwd_ingraph_ms"),
                                  ("ViT-B/16", "clip_b16_fwd_bwd_ingraph_ms")):
                    b = [x for x in bundles
                         if x.cfg is clip_models[name][0]][0]
                    phases[key] = chained_ms(
                        lambda im, cp, b=b: jax.grad(lambda i: jnp.sum(
                            _clip_image_features(b, i, "default",
                                                 clip_params=cp)))(im),
                        img, clip_models[name][1])
                phases["arcface_fwd_bwd_ingraph_ms"] = chained_ms(
                    lambda im, ap: jax.grad(lambda i: jnp.sum(
                        extract_feats(ap, i)))(im), img, arcface)
                return phases

            # the breakdown is only meaningful in a clean window: bracket
            # with probes, retry once if either side is dirty (BENCH_r03's
            # dry run recorded a 249 ms "ArcFace" during a 520 ms burst)
            clean = True
            if _PROBE:
                _wait_clean()
            phases = run_phases()
            if _PROBE:
                post = _probe_ms()
                if post > _CLEAN_PROBE_MS and _PROBE_BUDGET_S[0] > 0:
                    _wait_clean()
                    phases2 = run_phases()
                    post2 = _probe_ms()
                    if post2 <= post:
                        phases = {k: min(phases[k], phases2[k])
                                  for k in phases}
                        post = post2
                clean = post <= _CLEAN_PROBE_MS
            # sub-ms phases (ArcFace ≈ 24 GFLOP at batch 4) sit below the
            # slope's ±1 ms noise and can read slightly negative — floor
            # at 0 rather than publish a negative time
            out["phase_breakdown"] = {k: round(max(v, 0.0), 1)
                                      for k, v in phases.items()}
            out["phase_breakdown_clean"] = bool(clean)
            out["phase_breakdown_note"] = (
                "in-graph scan-slope basis (r5), min-of-reps per chain "
                "length: NO dispatch constant at all. Reads ~2-3 ms BELOW "
                "the .bench/step_breakdown.py figures (those amortize a "
                "per-dispatch link constant over their loop); sub-ms "
                "phases are 0.0 within noise. The r<=4 *_ms keys carried "
                "the full 8-dispatch overhead and are NOT comparable.")
        except Exception as e:
            print(f"# phase breakdown unavailable: {e}", file=sys.stderr)
    print(json.dumps(out))


V100_REFERENCE_COACH_IMGS_PER_SEC = 6.7


def _setup_probe():
    """Build the chained batch-64 synthesis probe standalone (subprocess
    variants that skip bench_synthesis still bracket with probes)."""
    import dataclasses

    from stylemc_tpu.models.stylegan2.generator import inference_cfg

    cfg, params, _ = _get_network()
    cfg = inference_cfg(
        dataclasses.replace(cfg, low_precision_dtype="bfloat16"))
    with jax.default_device(_cpu()):
        z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, cfg.z_dim))
        styles = w_to_s(params, cfg,
                        mapping(params, cfg, z, truncation_psi=0.7))
    styles = jax.device_put(np.asarray(styles), jax.devices()[0])
    params = jax.device_put(jax.tree_util.tree_map(np.asarray, params),
                            jax.devices()[0])
    fn = jax.jit(lambda s: synthesis(params, cfg, s, noise_mode="const"))
    np.asarray(fn(styles))  # warm
    _PROBE.update(fn=fn, styles=styles)


def _coach_run(opt_kw, iters=10):
    """Build the reference ffhq_encode Coach workload (batch 4, 1024px,
    full loss stack) with `opt_kw` CoachOptions overrides and measure:
    sync ms/step (train_step with per-step loss fetch, two passes, keep
    the faster) and pipelined ms/step (fetch=False; steps chain on the
    donated params so the device serializes them, drained by one final
    fetch — what a production loop with board_interval logging pays)."""
    from stylemc_tpu.models.e4e.encoders import init_encoder_params
    from stylemc_tpu.models.e4e.psp import PSP, PSPConfig
    from stylemc_tpu.models.arcface import init_backbone_params
    from stylemc_tpu.losses.lpips import init_lpips_params
    from stylemc_tpu.train.coach import Coach, CoachOptions

    # batch 4: the 16 GB v5e ceiling for this workload (batch-4 step peaks
    # at ~13 GiB with donated param/opt buffers — XLA memory_analysis)
    batch, size = 4, 1024
    dev = jax.devices()[0]
    with jax.default_device(_cpu()):
        gen_cfg = GeneratorConfig(img_resolution=size, remat=True)
        gen_params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
        enc_params = init_encoder_params(jax.random.PRNGKey(1),
                                         stylegan_size=size)
        perception = {
            "lpips": init_lpips_params(jax.random.PRNGKey(2), "alex"),
            "arcface": init_backbone_params(jax.random.PRNGKey(3)),
        }
        n_ws = 2 * int(np.log2(size)) - 2

    to_dev = lambda t: jax.device_put(  # noqa: E731
        jax.tree_util.tree_map(np.asarray, t), dev)
    psp = PSP(cfg=PSPConfig(stylegan_size=size),
              encoder_params=to_dev(enc_params),
              decoder_cfg=gen_cfg, decoder_params=to_dev(gen_params),
              latent_avg=jnp.zeros((n_ws, 512)))
    rng = np.random.RandomState(0)
    # pre-generate the data stream: host-side randn inside the timed loop
    # would serialize ~10 ms/step of numpy into the measurement (a real
    # loader prefetches)
    batches = [(lambda x: (x, x.copy()))(
        rng.randn(batch, 3, 256, 256).astype(np.float32) * 0.3)
        for _ in range(iters)]

    kw = dict(batch_size=batch, stylegan_size=size,
              l2_lambda=1.0, lpips_lambda=0.8, id_lambda=0.1,
              w_discriminator_lambda=0.1)
    kw.update(opt_kw)
    coach = Coach(CoachOptions(**kw), psp, to_dev(perception),
                  lambda: batches[0], test_iter=None)
    coach.train_step(*batches[0])        # trace + compile
    probe = _wait_clean() if _PROBE else None
    out = {}
    best = float("inf")
    for _ in range(2):                    # two passes, keep the faster
        t0 = time.perf_counter()
        for b in batches:
            coach.train_step(*b)          # float extraction syncs
        best = min(best, (time.perf_counter() - t0) / iters)
    out["ms_per_step"] = round(1e3 * best, 1)
    best_pipe = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for b in batches:
            last = coach.train_step(*b, fetch=False)
        jax.device_get(last)              # drains the whole chain
        best_pipe = min(best_pipe, (time.perf_counter() - t0) / iters)
    out["pipelined_ms_per_step"] = round(1e3 * best_pipe, 1)
    if probe is not None:
        out["contention_probe_ms"] = round(probe, 1)
        out["probe_clean"] = bool(probe <= _CLEAN_PROBE_MS)
    return out


def bench_coach(weights_tag):
    """e4e Coach training-step throughput (VERDICT r2 item 2): the
    reference ffhq_encode workload — IR-SE-50 Encoder4Editing + 1024px
    rosinality decoder, L2 + LPIPS(alex) + ArcFace ID + W-discriminator,
    Ranger (reference encoder4editing/training/coach.py:105-149). Random
    init (weights only scale magnitudes, not FLOPs). Baseline: the
    notebook's "~4 h per network" Colab estimate gives no imgs/s, so
    vs_baseline uses a documented ~6.7 imgs/s single-V100 e4e estimate
    (batch 8 ≈ 1.2 s/step) — an estimate, like the other baselines.

    Emits the fp32 headline plus recommended_config_* companions (the
    docs-recommended --bf16_full --perception_bf16 training config,
    measured in a subprocess: consecutive 1024px coaches in one process
    leave HBM buffers lingering past GC — .bench/coach_variants.py)."""
    batch = 4
    out = _coach_run({})
    imgs_per_sec = batch / (out["ms_per_step"] / 1e3)
    line = {
        "metric": "e4e_coach_1024_imgs_per_sec",
        "value": round(imgs_per_sec, 2),
        "unit": f"imgs/sec (batch {batch}, 1024px decoder, full loss stack)",
        "vs_baseline": round(imgs_per_sec
                             / V100_REFERENCE_COACH_IMGS_PER_SEC, 3),
        "weights": weights_tag,
        # value/ms_per_step: per-step loss fetch (the r<=4 basis).
        # pipelined_*: fetch-free steps chained on donated params — the
        # cadence a production loop with board_interval logging runs at.
        "pipelined_imgs_per_sec": round(
            batch / (out["pipelined_ms_per_step"] / 1e3), 2),
        **{k: v for k, v in out.items() if k != "probe_clean"},
    }
    if "contention_probe_ms" in out:
        line["probe_iters"] = _PROBE_ITERS
        line["probe_clean"] = out["probe_clean"]
    # recommended training config in a fresh process (fresh HBM)
    if os.environ.get("STYLEMC_BENCH_COACH_RECOMMENDED", "1") != "0":
        import subprocess
        env = dict(os.environ)
        env["STYLEMC_BENCH_COACH_ONLY"] = json.dumps(
            {"bf16_full": True, "perception_bf16": True})
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=3600)
            rec = None
            for ln in r.stdout.splitlines():
                if ln.startswith("COACH_ONLY "):
                    rec = json.loads(ln[len("COACH_ONLY "):])
            if rec is None:
                raise RuntimeError(
                    f"no COACH_ONLY line (rc={r.returncode}): "
                    f"{r.stderr.strip()[-300:]}")
            line["recommended_config"] = "--bf16_full --perception_bf16"
            for k, v in rec.items():
                line[f"recommended_config_{k}"] = v
            ms = rec.get("pipelined_ms_per_step") or rec.get("ms_per_step")
            line["recommended_config_imgs_per_sec"] = round(
                batch / (ms / 1e3), 2)
        except Exception as e:
            print(f"# recommended-config coach variant unavailable: {e}",
                  file=sys.stderr)
    print(json.dumps(line))


def bench_serving(cfg, params, weights_tag):
    """BatchEditor request latency (p50/p99 per bucket) — the serving
    subsystem has no reference counterpart; numbers recorded in PARITY.md."""
    from stylemc_tpu.serve import BatchEditor

    with jax.default_device(_cpu()):
        rng = np.random.RandomState(0)
        direction = rng.randn(1, 26, 512).astype(np.float32) * 0.5

    editor = BatchEditor(cfg, jax.device_put(
        jax.tree_util.tree_map(np.asarray, params), jax.devices()[0]),
        direction=direction, max_batch=64)
    editor.warmup()
    if _PROBE:
        _wait_clean()

    out = {"metric": "serve_edit_latency", "unit": "ms/request",
           "weights": weights_tag, "vs_baseline": 1.0}
    for b in (1, 8, 64):
        styles = np.asarray(editor.styles_from_seeds(range(b)))
        lat = []
        for _ in range(40):
            t0 = time.perf_counter()
            editor.edit_styles(styles, change_power=2.0)  # returns np → sync
            lat.append(1e3 * (time.perf_counter() - t0))
        lat = np.asarray(lat[5:])  # drop warmup stragglers
        out[f"batch{b}_p50_ms"] = round(float(np.percentile(lat, 50)), 2)
        out[f"batch{b}_p99_ms"] = round(float(np.percentile(lat, 99)), 2)
    out["value"] = out["batch1_p50_ms"]
    print(json.dumps(out))


def main():
    global _CPU_FALLBACK_NOTE, BATCH, WARMUP, ITERS
    # persistent compile cache: repeated bench runs skip recompilation
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/stylemc_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    coach_only = os.environ.get("STYLEMC_BENCH_COACH_ONLY")
    if coach_only:
        # subprocess variant mode (bench_coach recommended-config child):
        # fresh HBM, own probe bracketing, one machine-readable line
        _setup_probe()
        print("COACH_ONLY " + json.dumps(_coach_run(json.loads(coach_only))))
        return
    probe_s = float(os.environ.get("STYLEMC_BENCH_TPU_PROBE_S", "240"))
    if probe_s > 0 and not _tpu_reachable(probe_s):
        # Pin CPU before ANY device query in this process or the axon
        # plugin hangs it too. Reduced workload, honestly annotated; the
        # full-scale TPU metrics are skipped rather than misreported.
        _CPU_FALLBACK_NOTE = "cpu-fallback: TPU backend unreachable at bench time"
        jax.config.update("jax_platforms", "cpu")
        BATCH, WARMUP, ITERS = 8, 1, 3
        _PROBE_BUDGET_S[0] = 0.0
    cfg, params, weights_tag = _get_network()
    try:
        bench_synthesis(cfg, params, weights_tag)
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        print(f"# synthesis bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    if _CPU_FALLBACK_NOTE is not None:
        # serving/find_direction at TPU scale are meaningless on CPU, but
        # the north-star metric must still be the LAST JSON line (the
        # driver's last-line parser records it) — emit it explicitly
        # skipped rather than letting the CPU synthesis line be recorded
        # under the wrong metric name/unit.
        print(json.dumps({
            "metric": "find_direction_129seed_wall_clock",
            "value": None,
            "unit": "seconds (warm, 129 seeds, batch 4, 256px, 4 epochs)",
            "vs_baseline": None,
            "skipped": _CPU_FALLBACK_NOTE,
            "weights": weights_tag,
        }))
        return
    if os.environ.get("STYLEMC_BENCH_SERVE", "1") != "0":
        try:
            bench_serving(cfg, params, weights_tag)
        except Exception as e:
            traceback.print_exc(file=sys.stderr)
            print(f"# serving bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if os.environ.get("STYLEMC_BENCH_COACH", "1") != "0":
        try:
            bench_coach("random-init (FLOPs-equivalent)")
        except Exception as e:
            traceback.print_exc(file=sys.stderr)
            print(f"# coach bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    # North-star metric last: a last-JSON-line parser records this one.
    # A phase failure (the shared compile service has documented bad
    # phases — docs/performance.md) must never leave a different metric
    # as the last JSON line, so emit an explicitly-failed north-star
    # record instead of dying mid-run.
    try:
        bench_find_direction(cfg, params, weights_tag)
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        print(f"# find_direction bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        print(json.dumps({
            "metric": "find_direction_129seed_wall_clock",
            "value": None,
            "unit": "seconds (warm, 129 seeds, batch 4, 256px, 4 epochs)",
            "vs_baseline": None,
            "failed": f"{type(e).__name__}: {e}",
            "weights": weights_tag,
        }))
        # exit-code visibility for callers that check status rather than
        # parse the last JSON line (the failed record above stays last)
        sys.exit(1)


if __name__ == "__main__":
    main()
