"""Clean-window e4e inversion latency on the TPU, probe-bracketed.

Measures (a) encode: IR-SE-50 FPN Encoder4Editing at 256 px -> W+ [18,512],
and (b) full invert: encode + rosinality-layout 1024 px decode — per-request
wall latency including host transfer, after warmup (the serving-style
number; methodology in docs/performance.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python .bench/e4e_latency.py \
           /tmp/e4e_bench/e4e_ffhq_encode.pt
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from stylemc_tpu.models.e4e.psp import load_psp_from_checkpoint

ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e4e_bench/e4e_ffhq_encode.pt"
psp = load_psp_from_checkpoint(ckpt, 1024)
dev = jax.devices()[0]

import dataclasses as _dc

# Params as jit ARGS (not closed-over constants): matches the CLI's jit
# signature so the persistent compile cache is shared, and avoids the
# slower constant-folding compile path.
_encode = jax.jit(
    lambda ep, x: _dc.replace(psp, encoder_params=ep).encode(x))
_invert = jax.jit(
    lambda ep, dp, x: _dc.replace(psp, encoder_params=ep,
                                  decoder_params=dp).decode(
        _dc.replace(psp, encoder_params=ep).encode(x)))

_invert_u8 = jax.jit(
    lambda ep, dp, x: jnp.clip(jnp.transpose(
        _dc.replace(psp, encoder_params=ep, decoder_params=dp).decode(
            _dc.replace(psp, encoder_params=ep).encode(x)),
        (0, 2, 3, 1)) * 127.5 + 128, 0, 255).astype(jnp.uint8))

encode = lambda x: _encode(psp.encoder_params, x)
invert = lambda x: _invert(psp.encoder_params, psp.decoder_params, x)
invert_u8 = lambda x: _invert_u8(psp.encoder_params, psp.decoder_params, x)

x_probe = jax.device_put(
    np.random.RandomState(0).randn(4, 3, 256, 256).astype(np.float32), dev)
float(jnp.sum(encode(x_probe)))  # warm


def probe():
    x = x_probe
    t0 = time.perf_counter()
    for _ in range(5):
        x = x + 0 * jnp.mean(encode(x))
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / 5 * 1e3


deadline = time.time() + 1500
while time.time() < deadline:
    ms = probe()
    print(f"probe: {ms:.1f}", flush=True)
    if ms < 100:
        break
    time.sleep(60)

import os

BATCHES = tuple(int(b) for b in
                os.environ.get("E4E_BATCHES", "1,4,8").split(","))

for name, fn in (("encode", encode), ("invert(encode+1024px decode)", invert),
                 ("invert→uint8-on-device (4x fewer link bytes)", invert_u8)):
    out = {}
    for b in BATCHES:
        xb = np.random.RandomState(b).randn(b, 3, 256, 256).astype(np.float32)
        np.asarray(fn(jax.device_put(xb, dev)))  # warm this batch shape
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            np.asarray(fn(jax.device_put(xb, dev)))
            lat.append(1e3 * (time.perf_counter() - t0))
        lat = np.asarray(lat[5:])
        out[b] = (float(np.percentile(lat, 50)), float(np.percentile(lat, 99)))
    pm = probe()
    print(f"{name}: " + " | ".join(
        f"b{b}: p50 {p50:.1f} p99 {p99:.1f}" for b, (p50, p99) in out.items())
        + f"  (probe after: {pm:.1f})", flush=True)
