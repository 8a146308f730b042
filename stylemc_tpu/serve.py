"""Batch edit serving.

A thin production path over the editing stack: pre-jitted render/edit
programs with bucketed batch shapes (no recompiles at request time), device-
resident weights, and uint8 outputs. The reference has no serving layer
(SURVEY.md §1); this is the minimal TPU-native one implied by the direction/
mapper artifacts the pipeline produces.

Usage:
    editor = BatchEditor.from_files(network="ffhq.npz",
                                    direction="runs/m2f/direction_x.npz")
    imgs_u8 = editor.edit_seeds([1, 2, 3], change_power=2.0)
    pairs_u8 = editor.edit_styles(styles, change_power=1.5, pairs=True)
"""

from __future__ import annotations

import bisect
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.stylegan2.generator import (GeneratorConfig, inference_cfg,
                                         mapping, w_to_s, synthesis)
from .models.mapper import mapper_apply
from .edit import (N_STYLE_CHANNELS, STYLE_DIM, TRAINABLE,
                   mapper_directions_batched, to_u8_nhwc)


def _apply_precision(cfg: GeneratorConfig, precision: str) -> GeneratorConfig:
    """Serving precision policy. 'fp32' = bit-parity with the offline
    pipeline; 'bf16-upper' = bfloat16 on the top num_fp16_res blocks (the
    NVIDIA fp16 inference policy, TPU-native); 'bf16' = every block bfloat16
    (fastest; outputs differ from fp32 by ~1 uint8 LSB)."""
    import dataclasses

    if precision == "fp32":
        return dataclasses.replace(cfg, low_precision_dtype="float32")
    if precision == "bf16-upper":
        return dataclasses.replace(cfg, low_precision_dtype="bfloat16")
    if precision == "bf16":
        return dataclasses.replace(
            cfg, low_precision_dtype="bfloat16",
            num_fp16_res=len(cfg.block_resolutions))
    raise ValueError(f"unknown precision {precision!r}; "
                     "expected fp32 | bf16-upper | bf16")


class BatchEditor:
    """Pre-compiled seed/style → edited-image service.

    Batch sizes bucket to powers of two up to `max_batch`; each bucket's
    programs compile once (weights flow as jit arguments, so graphs are
    small and cache across processes via the persistent compile cache).
    """

    def __init__(self, gen_cfg: GeneratorConfig, gen_params,
                 direction: Optional[np.ndarray] = None,
                 mapper_params=None, mapper_neg_slope: float = 0.01,
                 max_batch: int = 64, truncation_psi: float = 0.7,
                 noise_mode: str = "const", precision: str = "fp32",
                 mesh=None, pipeline_chunk: int = 16):
        gen_cfg = _apply_precision(gen_cfg, precision)
        # forward-only service → pad_dilate up-convs (61 vs 102 ms/batch64;
        # inference_cfg docstring)
        gen_cfg = inference_cfg(gen_cfg)
        self.cfg = gen_cfg
        # mesh: a 1-axis ('data',) jax Mesh — multi-chip serving. Weights
        # replicate; request batches shard over 'data' (zero collectives).
        # Buckets smaller than the mesh fall back to the replicated program.
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._rep_sh = NamedSharding(mesh, P())
            self._data_sh = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(gen_params, self._rep_sh)
        else:
            self.params = jax.device_put(gen_params)
        self.direction = None if direction is None else \
            jax.device_put(jnp.asarray(direction, jnp.float32))
        # named-direction registry: several edits deployed at once, selected
        # per request (directions are runtime values — no recompiles)
        self.directions: Dict[str, jnp.ndarray] = {}
        self.mapper_params = None if mapper_params is None else \
            jax.device_put(mapper_params)
        self.mapper_neg_slope = mapper_neg_slope
        self.truncation_psi = truncation_psi
        self.noise_mode = noise_mode
        self._invert = None  # set by attach_inverter
        self.buckets = [b for b in (1, 2, 4, 8, 16, 32, 64) if b <= max_batch]
        # Large requests render in pipeline_chunk sub-batches with their
        # device→host copies started asynchronously: the next chunk's
        # compute overlaps the previous chunk's uint8 transfer over the
        # (slow, serializing) host link. Measured batch 64 @256px: p50
        # 617 → 425 ms (-31%) at chunk 16 (.bench/serve_pipeline_ab.py).
        # Equality with the unchunked path was measured byte-equal on this
        # platform (same rows through the bucket-16 graph instead of the
        # bucket-32/64 ones — an XLA compilation detail, not guaranteed by
        # construction). 0 disables chunking. In-flight chunks are bounded
        # (max_inflight_chunks) so peak HBM for direct large-N edit_styles
        # calls stays constant instead of linear in request size.
        self.pipeline_chunk = pipeline_chunk
        self.max_inflight_chunks = 4

        def _styles_fn(gp, z):
            return w_to_s(gp, self.cfg,
                          mapping(gp, self.cfg, z,
                                  truncation_psi=self.truncation_psi))

        def _render_u8(gp, s):
            # uint8 NHWC conversion ON DEVICE: a quarter of the fp32 NCHW
            # bytes over the host link (matters on tunneled devices)
            img = synthesis(gp, self.cfg, s, noise_mode=self.noise_mode)
            return to_u8_nhwc(img)

        self._styles_from_z_plain = jax.jit(_styles_fn)
        self._render_plain = jax.jit(_render_u8)
        if mesh is not None:
            self._styles_from_z_sharded = jax.jit(
                _styles_fn, in_shardings=(self._rep_sh, self._data_sh),
                out_shardings=self._data_sh)
            self._render_sharded = jax.jit(
                _render_u8, in_shardings=(self._rep_sh, self._data_sh),
                out_shardings=self._data_sh)

    def _sharded_ok(self, n: int) -> bool:
        return self._mesh is not None and n % self._mesh.devices.size == 0

    def _styles_from_z(self, gp, z):
        if self._sharded_ok(z.shape[0]):
            return self._styles_from_z_sharded(gp, z)
        return self._styles_from_z_plain(gp, z)

    def _render(self, gp, s):
        if self._sharded_ok(s.shape[0]):
            return self._render_sharded(gp, s)
        return self._render_plain(gp, s)

    # ------------------------------------------------------------- plumbing

    def _bucket(self, n: int) -> int:
        i = bisect.bisect_left(self.buckets, n)
        if i == len(self.buckets):
            return self.buckets[-1]
        return self.buckets[i]

    def _pad(self, x: jnp.ndarray, b: int):
        n = x.shape[0]
        if n == b:
            return x
        return jnp.concatenate([x, jnp.repeat(x[-1:], b - n, axis=0)], axis=0)

    def add_direction(self, name: str, direction) -> None:
        """Register a named direction for per-request selection."""
        self.directions[name] = jax.device_put(
            jnp.asarray(direction, jnp.float32))

    def attach_inverter(self, psp) -> None:
        """Enable REAL-IMAGE serving: uint8 photos → e4e W+ codes → this
        generator's S space → edit → render.

        Mirrors the offline pipeline's composition exactly (reference
        infer.py:104-134 then w_s_converter.py:26-82 on the main network):
        the pSp DECODER is unused — codes convert to styles through the
        editor's own generator, so named directions/mappers apply unchanged.

        `psp`: a `models.e4e.psp.PSP` whose stylegan_size matches this
        editor's generator resolution.
        """
        import dataclasses as _dc

        if psp.cfg.stylegan_size != self.cfg.img_resolution:
            raise ValueError(
                f"e4e encoder trained for {psp.cfg.stylegan_size}px, "
                f"editor generator is {self.cfg.img_resolution}px")
        self._enc_params = jax.device_put(psp.encoder_params)
        latent_avg = None if psp.latent_avg is None else \
            jax.device_put(jnp.asarray(psp.latent_avg, jnp.float32))
        # decoder-free copy for the closure: only encode() runs here, and
        # the full pSp would pin its (unused) decoder pytree for the
        # editor's lifetime
        slim_psp = _dc.replace(psp, decoder_params={},
                               latent_avg=latent_avg)

        def _invert_u8(gp, enc_params, x_u8):
            # uint8 NHWC → [-1,1] NCHW (the e4e eval transform:
            # ToTensor+Normalize(0.5,0.5), reference infer.py:73-76)
            x = jnp.transpose(x_u8.astype(jnp.float32), (0, 3, 1, 2))
            x = x / 127.5 - 1.0
            codes = _dc.replace(slim_psp, encoder_params=enc_params).encode(x)
            return w_to_s(gp, self.cfg, codes)

        self._invert = jax.jit(_invert_u8)

    @property
    def has_inverter(self) -> bool:
        return self._invert is not None

    def invert_images(self, images_u8) -> jnp.ndarray:
        """uint8 NHWC photos (the e4e input size, 256² for real ckpts) →
        S-space styles [N, 26, 512]. Requires attach_inverter()."""
        assert self._invert is not None, \
            "no inverter attached (attach_inverter / --e4e_ckpt)"
        x = jnp.asarray(images_u8)
        assert x.dtype == jnp.uint8 and x.ndim == 4 and x.shape[-1] == 3, \
            f"expected uint8 [N,H,W,3], got {x.dtype} {x.shape}"
        outs = []
        for lo in range(0, x.shape[0], self.buckets[-1]):
            chunk = x[lo:lo + self.buckets[-1]]
            b = self._bucket(chunk.shape[0])
            s = self._invert(self.params, self._enc_params,
                             self._pad(chunk, b))
            outs.append(s[:chunk.shape[0]])
        return jnp.concatenate(outs, axis=0)

    def edit_images(self, images_u8, change_power: float = 2.0,
                    pairs: bool = False,
                    direction_name: Optional[str] = None) -> np.ndarray:
        """Real photos in, edited renders out (pairs=True returns
        [reconstruction | edited] — 'orig' is the e4e reconstruction, the
        same left panel the offline pipeline produces)."""
        return self.edit_styles(self.invert_images(images_u8),
                                change_power=change_power, pairs=pairs,
                                direction_name=direction_name)

    def _directions_for(self, styles: jnp.ndarray,
                        name: Optional[str] = None) -> jnp.ndarray:
        if name is not None:
            if name not in self.directions:
                raise KeyError(
                    f"unknown direction {name!r}; loaded: "
                    f"{sorted(self.directions)}")
            return self.directions[name]
        if self.mapper_params is not None:
            return mapper_directions_batched(self.mapper_params, styles,
                                             neg_slope=self.mapper_neg_slope)
        assert self.direction is not None, "no direction or mapper loaded"
        return self.direction

    # -------------------------------------------------------------- public

    def styles_from_seeds(self, seeds: Sequence[int]) -> jnp.ndarray:
        zs = np.concatenate([np.random.RandomState(s).randn(1, self.cfg.z_dim)
                             for s in seeds]).astype(np.float32)
        out = []
        for lo in range(0, len(seeds), self.buckets[-1]):
            chunk = jnp.asarray(zs[lo:lo + self.buckets[-1]])
            b = self._bucket(chunk.shape[0])
            s = self._styles_from_z(self.params, self._pad(chunk, b))
            out.append(s[:chunk.shape[0]])
        return jnp.concatenate(out, axis=0)

    def edit_styles(self, styles, change_power: float = 2.0,
                    pairs: bool = False,
                    direction_name: Optional[str] = None) -> np.ndarray:
        """styles [N, 26, 512] → uint8 HWC images; pairs=True returns
        [orig | edited] concatenations; direction_name selects from the
        named registry (default: the constructor direction / mapper)."""
        styles = jnp.asarray(styles, jnp.float32)
        step = self.pipeline_chunk or self.buckets[-1]
        step = min(step, self.buckets[-1])
        # Dispatch ahead and start host copies asynchronously, but keep at
        # most max_inflight_chunks chunks' device buffers live — compute of
        # chunk k+1 still overlaps the transfer of chunk k, while peak HBM
        # stays constant for arbitrarily large N (1024px pairs ≈ 6 MB/row).
        pending: List[Tuple[int, jnp.ndarray, Optional[jnp.ndarray]]] = []
        outs: List[np.ndarray] = []

        def _fetch(n, edited, orig):
            if orig is not None:
                img = np.concatenate([np.asarray(orig), np.asarray(edited)],
                                     axis=2)
            else:
                img = np.asarray(edited)
            outs.append(img[:n])

        for lo in range(0, styles.shape[0], step):
            chunk = styles[lo:lo + step]
            n = chunk.shape[0]
            padded = self._pad(chunk, self._bucket(n))
            d = self._directions_for(padded, name=direction_name)
            edited = self._render(self.params, padded + d * change_power)
            orig = self._render(self.params, padded) if pairs else None
            for a in (edited, orig):
                if a is not None:
                    try:
                        a.copy_to_host_async()
                    except Exception:  # sharded arrays / older runtimes
                        pass
            pending.append((n, edited, orig))
            if len(pending) >= max(1, self.max_inflight_chunks):
                _fetch(*pending.pop(0))
        for t in pending:
            _fetch(*t)
        return np.concatenate(outs, axis=0)

    def edit_seeds(self, seeds: Sequence[int], change_power: float = 2.0,
                   pairs: bool = False,
                   direction_name: Optional[str] = None) -> np.ndarray:
        return self.edit_styles(self.styles_from_seeds(seeds),
                                change_power=change_power, pairs=pairs,
                                direction_name=direction_name)

    def warmup(self):
        """Compile every reachable bucket ahead of serving. The edit path
        chunks requests at pipeline_chunk, so only buckets ≤ that chunk can
        ever render; the invert path chunks at buckets[-1] and warms them
        all (otherwise the first POST /edit_image pays the encoder
        trace+compile in-request)."""
        step = min(self.pipeline_chunk or self.buckets[-1], self.buckets[-1])
        # chunks of size `step` render through the bucket step pads up to
        # (_bucket), which may exceed step itself when pipeline_chunk is not
        # a bucket size (e.g. chunk 24 → bucket 32) — warm through it
        top = self._bucket(step)
        for b in self.buckets:
            if b > top:
                break
            s = jnp.zeros((b, N_STYLE_CHANNELS, STYLE_DIM), jnp.float32)
            self.edit_styles(s, change_power=0.0)
        if self._invert is not None:
            for b in self.buckets:
                x = np.zeros((b, 256, 256, 3), np.uint8)
                jax.block_until_ready(self.invert_images(x))

    # ------------------------------------------------------------- loading

    @classmethod
    def from_files(cls, network: str, direction: Optional[str] = None,
                   mapper: Optional[str] = None,
                   directions: Optional[Dict[str, str]] = None,
                   e4e_ckpt: Optional[str] = None,
                   **kwargs) -> "BatchEditor":
        """directions: {name: path} registers a named-direction zoo on top
        of (or instead of) the single default `direction`. e4e_ckpt attaches
        a real-image inverter (edit_images / the HTTP POST endpoint)."""
        from .io import load_generator, load_state_dict_numpy
        from .models.mapper import params_from_torch_state

        cfg, params = load_generator(network)
        d = np.load(direction)["s"] if direction else None
        mp = None
        if mapper:
            mp = params_from_torch_state(load_state_dict_numpy(mapper))
        editor = cls(cfg, params, direction=d, mapper_params=mp, **kwargs)
        for name, path in (directions or {}).items():
            editor.add_direction(name, np.load(path)["s"])
        if e4e_ckpt:
            from .models.e4e.psp import load_psp_from_checkpoint
            editor.attach_inverter(load_psp_from_checkpoint(
                e4e_ckpt, stylegan_size=cfg.img_resolution))
        return editor

class CoalescingDispatcher:
    """Merge concurrent same-parameter requests into one batched dispatch.

    A production TPU server sees many small concurrent requests; dispatching
    each at batch 1 wastes the pre-compiled larger buckets (batch 8 costs
    ~2.5x batch 1 on the measured v5e — 3.2x fewer device-dispatches per
    image). Submissions enqueue and block; one worker thread drains the
    queue, groups items by `key` (the edit parameters — only identical
    parameters may share a graph invocation), concatenates each group along
    axis 0, runs ONE editor call, and splits the result back to the waiting
    submitters. The first item of a drain waits up to max_wait_ms for
    company; a full bucket dispatches immediately.

    The worker is also the single device owner (JAX dispatch is not
    thread-safe across concurrent tracers), replacing the serial lock.
    """

    _STOP = object()

    def __init__(self, max_batch: int = 64, max_wait_ms: float = 3.0):
        import queue
        import threading

        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self.batched_calls = 0
        self.coalesced_items = 0
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="coalescing-dispatcher")
        self._worker.start()

    def submit(self, key, rows: np.ndarray, fn) -> np.ndarray:
        """Block until `fn` ran on a batch containing `rows`; returns this
        submission's slice of the result. `fn` must map a [N, ...] batch to
        [N, ...] results and be identical for every submission with the
        same `key`."""
        import threading

        item = {"key": key, "rows": rows, "fn": fn,
                "ev": threading.Event(), "out": None, "err": None}
        self._q.put(item)
        item["ev"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    def close(self):
        self._q.put(self._STOP)
        self._worker.join(timeout=5)

    # ------------------------------------------------------------ internal

    def _drain(self, first) -> list:
        """Collect items for up to max_wait_s / max_batch rows."""
        import queue
        import time as _time

        batch = [first]
        rows = first["rows"].shape[0]
        deadline = _time.perf_counter() + self.max_wait_s
        while rows < self.max_batch:
            remaining = deadline - _time.perf_counter()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is self._STOP:
                self._q.put(item)  # re-deliver to the loop
                break
            batch.append(item)
            rows += item["rows"].shape[0]
        return batch

    def _run(self):
        while True:
            item = self._q.get()
            if item is self._STOP:
                return
            batch = self._drain(item)
            groups: Dict = {}
            for it in batch:
                groups.setdefault(it["key"], []).append(it)
            for items in groups.values():
                try:
                    rows = np.concatenate([it["rows"] for it in items],
                                          axis=0)
                    out = items[0]["fn"](rows)
                    self.batched_calls += 1
                    self.coalesced_items += len(items)
                    lo = 0
                    for it in items:
                        n = it["rows"].shape[0]
                        it["out"] = out[lo:lo + n]
                        lo += n
                except Exception as e:  # noqa: BLE001 — deliver to callers
                    for it in items:
                        it["err"] = e
                finally:
                    for it in items:
                        it["ev"].set()
