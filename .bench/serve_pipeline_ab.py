"""Batch-64 serve latency: monolithic dispatch+fetch vs chunked
double-buffering (VERDICT r3 item 10).

The ~750-1000 ms batch-64 p50 is dominated by the 12.6 MB uint8
device→host transfer over the tunnel. Chunking the batch into K renders
and starting every chunk's host copy asynchronously overlaps compute
(and any per-transfer setup) under the serialized link; the bytes
themselves cannot shrink, so the expected win is bounded by the compute
time of all-but-the-first chunk.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/stylemc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from stylemc_tpu.serve import BatchEditor
from stylemc_tpu.models.stylegan2.generator import GeneratorConfig, \
    init_generator_params

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    cfg = GeneratorConfig(img_resolution=256)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    direction = np.random.RandomState(0).randn(1, 26, 512).astype(
        np.float32) * 0.5

editor = BatchEditor(cfg, jax.device_put(
    jax.tree_util.tree_map(np.asarray, params), dev),
    direction=direction, max_batch=64)
editor.warmup()
styles = jnp.asarray(editor.styles_from_seeds(range(64)))


def mono():
    return editor.edit_styles(styles, change_power=2.0)


def chunked(k):
    outs = []
    per = 64 // k
    # dispatch every chunk first (async), start host copies immediately
    arrs = []
    for lo in range(0, 64, per):
        chunk = editor._pad(styles[lo:lo + per], editor._bucket(per))
        d = editor._directions_for(chunk)
        out = editor._render(editor.params, chunk + d * 2.0)
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        arrs.append(out)
    for a in arrs:
        outs.append(np.asarray(a))
    return np.concatenate(outs, axis=0)


def bench(name, fn, iters=25):
    fn()  # warm
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        lat.append(1e3 * (time.perf_counter() - t0))
    lat = np.asarray(lat[3:])
    print(f"{name:22s} p50 {np.percentile(lat, 50):7.1f} ms   "
          f"p99 {np.percentile(lat, 99):7.1f} ms", flush=True)
    return float(np.percentile(lat, 50))


if __name__ == "__main__":
    a = bench("monolithic b64", mono)
    for k in (2, 4, 8):
        bench(f"chunked k={k}", lambda k=k: chunked(k))
    a2 = bench("monolithic b64 (re)", mono)
    print(f"probe drift: {a:.1f} vs {a2:.1f} ms")
