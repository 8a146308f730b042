"""Coalescing A/B: N concurrent single-seed clients, coalesce on vs off.

Measures per-request p50/p99 and aggregate throughput through the real
EditService (no HTTP — the dispatcher/lock layer is what's under test;
the socket adds a constant). Probe-bracketed per docs/performance.md.
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import threading
import time

import numpy as np
import jax.numpy as jnp

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis)
from stylemc_tpu.serve import BatchEditor
from stylemc_tpu.cli.serve import EditService

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.z_dim))
    s_probe = np.asarray(w_to_s(params, cfg,
                                mapping(params, cfg, z, truncation_psi=0.7)))
    direction = (np.random.RandomState(0).randn(1, 26, 512) * 0.5
                 ).astype(np.float32)
dparams = jax.device_put(jax.tree_util.tree_map(np.asarray, params), dev)
pf = jax.jit(lambda ss: synthesis(dparams, cfg, ss, noise_mode="const"))
dsp = jax.device_put(s_probe, dev)
float(jnp.sum(pf(dsp)))


def probe():
    x = dsp
    t0 = time.perf_counter()
    for _ in range(5):
        x = x + 0 * jnp.mean(pf(x))
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / 5 * 1e3


deadline = time.time() + 1500
while time.time() < deadline:
    ms = probe()
    print(f"probe: {ms:.1f}", flush=True)
    if ms < 150:
        break
    time.sleep(60)

editor = BatchEditor(cfg, dparams, direction=direction, max_batch=64)
editor.warmup()

N_CLIENTS = 16
REQS_PER_CLIENT = 8

for coalesce_ms in (0.0, 3.0, 10.0):
    svc = EditService(editor, coalesce_ms=coalesce_ms, max_batch=64)
    lat = []
    lock = threading.Lock()

    def client(cid):
        for r in range(REQS_PER_CLIENT):
            t0 = time.perf_counter()
            svc.edit([cid * 100 + r], power=2.0, pairs=False)
            dt = 1e3 * (time.perf_counter() - t0)
            with lock:
                lat.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.asarray(lat)
    n = N_CLIENTS * REQS_PER_CLIENT
    extra = ""
    if svc._dispatcher is not None:
        extra = (f", {svc._dispatcher.batched_calls} dispatches for "
                 f"{svc._dispatcher.coalesced_items} requests")
        svc._dispatcher.close()
    pm = probe()
    print(f"coalesce_ms={coalesce_ms:4.1f}: {n / wall:6.1f} req/s, "
          f"p50 {np.percentile(lat, 50):6.1f} ms, "
          f"p99 {np.percentile(lat, 99):6.1f} ms{extra} "
          f"(probe after: {pm:.1f})", flush=True)
