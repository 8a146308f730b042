"""e4e inversion-encoder trainer (the Coach).

Behavioral contract: /root/reference/encoder4editing/training/coach.py —
Ranger over the encoder (optionally + decoder), loss = adversarial(w
discriminator, softplus) + progressive delta-norm reg + ID/MoCo + L2 +
LPIPS (calc_loss, coach.py:232-278); latent-codes discriminator trained
with softplus real/fake + lazy R1 every d_reg_every steps (:354-424);
progressive stage advanced on a step schedule (:148-155); best-model and
interval checkpointing; validation sweep.

TPU-first: encoder and discriminator updates are each one jit graph; the
progressive stage is a static int (stage changes recompile — 18 times over
a full run, amortized to nothing). Data loading stays host-side numpy.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.e4e.psp import PSP
from ..models.e4e.encoders import (style_count, encoder4editing,
                                   gradual_style_encoder,
                                   backbone_encoder_into_w)
from ..models.e4e.discriminator import (discriminator_apply,
                                        init_discriminator_params,
                                        LatentCodesPool)
from ..losses.lpips import lpips_loss
from ..losses.moco import e4e_id_loss, moco_loss
from ..losses.w_norm import w_norm_loss
from ..models.stylegan2.generator import mapping as gen_mapping
from .ranger import ranger


@dataclasses.dataclass
class CoachOptions:
    """Mirrors TrainOptions defaults (reference options/train_options.py)."""
    dataset_type: str = "ffhq_encode"
    encoder_type: str = "Encoder4Editing"
    batch_size: int = 4
    test_batch_size: int = 2
    learning_rate: float = 1e-4
    optim_name: str = "ranger"
    train_decoder: bool = False
    start_from_latent_avg: bool = True
    lpips_type: str = "alex"
    lpips_lambda: float = 0.8
    id_lambda: float = 0.1
    l2_lambda: float = 1.0
    w_norm_lambda: float = 0.0
    stylegan_size: int = 1024
    max_steps: int = 500000
    board_interval: int = 50
    val_interval: int = 1000
    save_interval: Optional[int] = None
    w_discriminator_lambda: float = 0.0
    w_discriminator_lr: float = 2e-5
    r1: float = 10.0
    d_reg_every: int = 16
    use_w_pool: bool = False
    w_pool_size: int = 50
    delta_norm: int = 2
    delta_norm_lambda: float = 2e-4
    progressive_steps: Optional[List[int]] = None
    progressive_start: Optional[int] = None
    progressive_step_every: int = 2000
    exp_dir: str = "experiments/e4e"
    seed: int = 0
    # optional global-norm gradient clip (0 = off, reference parity). The
    # Ranger/RAdam warmup phase applies ~lr·|g| un-normalized — with
    # pathological inits/batches that diverges (in the reference too).
    grad_clip: float = 0.0
    # bf16 activations in the decoder's upper num_fp16_res blocks (the
    # NVIDIA fp16 policy the released generators train under; params and
    # the optimizer state stay fp32 — mixed precision with fp32 master).
    # Off by default: reference e4e trains pure fp32.
    bf16: bool = False
    # bf16 on EVERY decoder block (not just the upper num_fp16_res) —
    # the coach step is decoder-dominated and the 1024 generator's FLOPs
    # sit in the 512-channel lower blocks (per-phase attribution,
    # docs/performance.md); implies bf16.
    bf16_full: bool = False
    # bf16 activations through the PERCEPTION towers (LPIPS + ArcFace/MoCo
    # ID). Same
    # mechanism as find_direction's --perception_bf16 (0.998 direction
    # cosine there): tower INPUTS cast to bf16, weights follow the input
    # dtype inside the ops, losses accumulate in fp32. The L2/W-norm
    # terms and all trainable state stay fp32.
    perception_bf16: bool = False
    # bf16 activations through the TRAINABLE e4e encoder — classic mixed
    # precision: the Ranger state and master weights stay fp32; the
    # forward casts params+input to bf16 (bf16 keeps the fp32 exponent
    # range, so no loss scaling is needed) and the W+ codes return to
    # fp32. Measured +~10% alone; the step is decoder-dominated
    # (per-phase attribution, docs/performance.md).
    encoder_bf16: bool = False
    # Fuse the W-discriminator phase (latent sampling + D update + lazy
    # R1) and the encoder update into ONE jit dispatch per train_step.
    # The unfused path pays 3 dispatches + eager slices + a separate x
    # transfer per step — ~100 ms of link/composition overhead on a
    # tunneled runtime for a ~3 ms discriminator graph (the r4 "non-tower
    # residue", docs/performance.md). Numerics match the unfused path
    # (same op sequence: D trains first, encoder sees the updated D —
    # reference coach.py:105-149; pinned by
    # test_coach_fused_d_step_matches_unfused). Automatically falls back
    # to the unfused path when use_w_pool (host-side pool) is on.
    fuse_d_step: bool = True
    # selective decoder remat: with the remat decoder cfg, checkpoint only
    # blocks at resolution >= this (0 = all blocks). See
    # GeneratorConfig.remat_min_res.
    remat_min_res: int = 0
    # fetch losses to the host every N steps (1 = every step, reference
    # parity). N>1 lets back-to-back steps pipeline on the device — the
    # loop only pays a host round-trip on fetch steps; board/save/val/
    # final steps always fetch so logging and checkpoint cadence are
    # unchanged. Callbacks fire only on fetch steps when N>1.
    fetch_every: int = 1
    # depth of the background-thread batch prefetcher in train(): the
    # next batch loads/augments while the device runs the current step
    # (host-side data generation otherwise serializes into the step —
    # ~10+ ms/step measured for even a plain randn source). 0 disables
    # (train_iter called inline, reference cadence). Batch ORDER is
    # unchanged: one worker thread calls train_iter sequentially.
    prefetch_batches: int = 2

    def __post_init__(self):
        if self.progressive_start is not None:
            n = style_count(self.stylegan_size)
            self.progressive_steps = [0] + [
                self.progressive_start + i * self.progressive_step_every
                for i in range(n - 1)]
        if self.save_interval is None:
            self.save_interval = self.max_steps


class _Prefetcher:
    """Single background thread pulling batches from `fn` ahead of the
    training loop (depth-bounded). One worker ⇒ batch order identical to
    calling `fn` inline; worker exceptions re-raise at the next get()."""

    def __init__(self, fn: Callable, depth: int = 2):
        import queue
        import threading

        self._q: Any = queue.Queue(maxsize=max(1, depth))
        self._fn = fn
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import queue
        while not self._stop.is_set():
            try:
                item = self._fn()
            except BaseException as e:  # noqa: BLE001 — surface at get()
                self._err = e
                self._q.put(None)
                return
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def get(self):
        item = self._q.get()
        if item is None and self._err is not None:
            raise self._err
        return item

    def close(self):
        self._stop.set()
        # unblock a worker stuck on put()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass


class Coach:
    """Host-side training driver around two jit'd steps.

    psp: PSP bundle (encoder trainable; decoder frozen unless train_decoder).
    perception: {'lpips': params, 'arcface'|'moco': params} as configured.
    train_iter / test_iter: callables -> (x, y) numpy batches in [-1,1] NCHW.

    Buffer-donation contract: train_step donates (trainable params, optimizer
    state) into the jit — the ~4 GiB saving that fits FFHQ-1024 batch 4 on a
    16 GB chip; the fused W-D step additionally donates (discriminator
    params, d_opt_state). Two consequences for callers: (a) any reference
    held to pre-training encoder/decoder/discriminator params (or opt
    state) is INVALIDATED after
    the first step — copy before training if you need the originals; (b) a
    step that fails at execute time (e.g. a transient device OOM) leaves
    self.psp/self.opt_state pointing at already-donated buffers, making this
    Coach instance unrecoverable mid-run — restart from the last checkpoint.
    """

    def __init__(self, opts: CoachOptions, psp: PSP,
                 perception: Dict[str, Any],
                 train_iter: Callable, test_iter: Optional[Callable] = None,
                 arcface_layout=None, mesh=None):
        self.opts = opts
        if opts.remat_min_res > 0 and psp.decoder_cfg.remat:
            psp = dataclasses.replace(psp, decoder_cfg=dataclasses.replace(
                psp.decoder_cfg, remat_min_res=opts.remat_min_res))
        if opts.bf16 or opts.bf16_full:
            dec_cfg = dataclasses.replace(
                psp.decoder_cfg, low_precision_dtype="bfloat16")
            if opts.bf16_full:
                # every block, not just the upper num_fp16_res: the
                # 1024px coach step is decoder-dominated (229 of 608 ms)
                # and a 1024 generator's FLOPs sit in the 512-channel
                # LOWER blocks the NVIDIA fp16 policy leaves fp32
                # (docs/performance.md per-phase attribution)
                dec_cfg = dataclasses.replace(
                    dec_cfg,
                    num_fp16_res=len(dec_cfg.block_resolutions))
            psp = dataclasses.replace(psp, decoder_cfg=dec_cfg)
        self.psp = psp
        self.perception = perception
        self.train_iter = train_iter
        self.test_iter = test_iter
        self.arcface_layout = arcface_layout
        self.global_step = 0
        self.best_val_loss = None
        # mesh: a 1-axis ('data',) jax Mesh — image batches shard over it,
        # weights/optimizer state replicate, and GSPMD inserts the gradient
        # psum (the DDP the reference e4e never had; SURVEY §2e).
        self.mesh = mesh
        self._rep_sh = self._data_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.devices.size
            assert opts.batch_size % n_dev == 0, \
                f"batch_size {opts.batch_size} must divide over {n_dev} devices"
            self._rep_sh = NamedSharding(mesh, P())
            self._data_sh = NamedSharding(mesh, P("data"))

        self.optimizer = self._make_optimizer()
        self.opt_state = self.optimizer.init(self._trainable())

        self.discriminator_params = None
        if opts.w_discriminator_lambda > 0:
            self.discriminator_params = init_discriminator_params(
                jax.random.PRNGKey(opts.seed + 1))
            self.d_optimizer = optax.adam(opts.w_discriminator_lr)
            self.d_opt_state = self.d_optimizer.init(self.discriminator_params)
            self.real_w_pool = LatentCodesPool(opts.w_pool_size)
            self.fake_w_pool = LatentCodesPool(opts.w_pool_size)

        self._step_cache: Dict[int, Callable] = {}
        self._d_step_cache: Dict[bool, Callable] = {}
        self._sample_cache: Dict[int, Callable] = {}
        self._fused_cache: Dict[Any, Callable] = {}
        self._rng = np.random.RandomState(opts.seed)

    # ------------------------------------------------------------- plumbing

    def _trainable(self):
        if self.opts.train_decoder:
            return {"encoder": self.psp.encoder_params,
                    "decoder": self.psp.decoder_params}
        return {"encoder": self.psp.encoder_params}

    def _install(self, trainable):
        self.psp.encoder_params = trainable["encoder"]
        if self.opts.train_decoder:
            self.psp.decoder_params = trainable["decoder"]

    def _make_optimizer(self):
        base = ranger(self.opts.learning_rate) \
            if self.opts.optim_name == "ranger" \
            else optax.adam(self.opts.learning_rate)
        if self.opts.grad_clip > 0:
            return optax.chain(optax.clip_by_global_norm(self.opts.grad_clip),
                               base)
        return base

    def progressive_stage(self) -> int:
        """Stage index for the current global step (coach.py:148-155)."""
        if not self.opts.progressive_steps:
            return 18
        stage = 0
        for i, s in enumerate(self.opts.progressive_steps):
            if self.global_step >= s:
                stage = i
        return stage

    def get_dims_to_discriminate(self) -> List[int]:
        n = style_count(self.opts.stylegan_size)
        if self.opts.progressive_steps:
            return list(range(min(self.progressive_stage() + 1, n)))
        return list(range(n))

    def is_training_discriminator(self) -> bool:
        return self.opts.w_discriminator_lambda > 0

    # ----------------------------------------------------------- loss graph

    def _calc_loss(self, trainable, x, y, stage, disc_params, frozen=None):
        """`frozen` carries the non-trained weights (decoder + perception)
        as jit arguments — closure'd weights embed as HLO literals, which
        remote-compile toolchains reject."""
        opts = self.opts
        frozen = frozen or {"decoder": self.psp.decoder_params,
                            "perception": self.perception}
        perception = frozen["perception"]
        enc_params = trainable["encoder"]
        x_enc = x
        if opts.encoder_bf16:
            # mixed precision: bf16 compute params cast from the fp32
            # masters each step (grads flow back through the cast as fp32)
            enc_params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, enc_params)
            x_enc = x.astype(jnp.bfloat16)
        psp = dataclasses.replace(
            self.psp, encoder_params=enc_params,
            decoder_params=trainable.get("decoder", frozen["decoder"]))
        codes = psp.encode(x_enc, progressive_stage=stage).astype(
            jnp.float32)
        y_hat = psp.decode(codes, resize=True, noise_mode="const")
        if opts.dataset_type == "cars_encode":
            # cars StyleGAN renders 512x384 content in a 512x512 frame
            # (reference coach.py forward, :283-285)
            y_hat = y_hat[:, :, 32:224, :]
        latent = codes

        loss = 0.0
        loss_dict = {}
        if self.is_training_discriminator():
            dims = self.get_dims_to_discriminate()
            loss_disc = 0.0
            for i in dims:
                fake_pred = discriminator_apply(disc_params, latent[:, i, :])
                loss_disc += jnp.mean(jax.nn.softplus(-fake_pred))
            loss_disc = loss_disc / len(dims)
            loss_dict["encoder_discriminator_loss"] = loss_disc
            loss += opts.w_discriminator_lambda * loss_disc

        if opts.progressive_steps and stage != 18:
            first_w = latent[:, 0, :]
            total_delta = 0.0
            n = style_count(opts.stylegan_size)
            for i in range(1, min(stage + 1, n)):
                delta = latent[:, i, :] - first_w
                total_delta += jnp.mean(
                    jnp.linalg.norm(delta, ord=opts.delta_norm, axis=1))
            loss_dict["total_delta_loss"] = total_delta
            loss += opts.delta_norm_lambda * total_delta

        # perception towers optionally run in bf16 (activations; weights
        # follow the input dtype inside the ops); losses come back fp32
        if opts.perception_bf16:
            yp_hat = y_hat.astype(jnp.bfloat16)
            yp = y.astype(jnp.bfloat16)
            xq = x.astype(jnp.bfloat16)
        else:
            yp_hat, yp, xq = y_hat, y, x
        if opts.id_lambda > 0:
            if "arcface" in perception:
                loss_id, sim = e4e_id_loss(perception["arcface"],
                                           yp_hat, yp, xq,
                                           self.arcface_layout)
            else:
                loss_id, sim = moco_loss(perception["moco"], yp_hat, yp, xq)
            loss_id = loss_id.astype(jnp.float32)
            loss_dict["loss_id"] = loss_id
            loss_dict["id_improve"] = sim.astype(jnp.float32)
            loss += loss_id * opts.id_lambda
        if opts.l2_lambda > 0:
            loss_l2 = jnp.mean(jnp.square(y_hat - y))
            loss_dict["loss_l2"] = loss_l2
            loss += loss_l2 * opts.l2_lambda
        if opts.lpips_lambda > 0:
            loss_lp = lpips_loss(perception["lpips"], yp_hat, yp,
                                 self.opts.lpips_type).astype(jnp.float32)
            loss_dict["loss_lpips"] = loss_lp
            loss += loss_lp * opts.lpips_lambda
        if opts.w_norm_lambda > 0:
            loss_w = w_norm_loss(latent, psp.latent_avg,
                                 opts.start_from_latent_avg)
            loss_dict["loss_w_norm"] = loss_w
            loss += loss_w * opts.w_norm_lambda
        loss_dict["loss"] = loss
        return loss, (loss_dict, y_hat, latent)

    def _get_step_fn(self, stage: int):
        if stage in self._step_cache:
            return self._step_cache[stage]

        def _step_fn(trainable, opt_state, x, y, disc_params, frozen):
            (loss, (loss_dict, y_hat, latent)), grads = jax.value_and_grad(
                self._calc_loss, has_aux=True)(trainable, x, y, stage,
                                               disc_params, frozen)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss_dict, y_hat, latent

        # Donate (trainable, opt_state): the update aliases in place of
        # allocating fresh buffers. Without this the FFHQ-1024 step peaks
        # at 16.19 GiB (XLA memory_analysis: 4.28 args + 8.85 temps +
        # 3.99 un-aliased outputs) and OOMs the 16 GB v5e; with donation
        # the ~4 GiB of new params+opt state alias the old. train_step
        # reinstalls the returned arrays, so the donated inputs are never
        # reused.
        if self.mesh is not None:
            rep, dat = self._rep_sh, self._data_sh
            _step = jax.jit(_step_fn, donate_argnums=(0, 1),
                            in_shardings=(rep, rep, dat, dat, rep, rep))
        else:
            _step = jax.jit(_step_fn, donate_argnums=(0, 1))

        def step(trainable, opt_state, x, y, disc_params):
            # with train_decoder the decoder rides in `trainable` (donated);
            # passing the same buffers again under `frozen` would alias a
            # donated input — send a scalar placeholder instead (unused:
            # _calc_loss prefers trainable["decoder"])
            frozen_dec = (jnp.zeros((), jnp.float32)
                          if self.opts.train_decoder
                          else self.psp.decoder_params)
            frozen = {"decoder": frozen_dec, "perception": self.perception}
            return _step(trainable, opt_state, x, y, disc_params, frozen)

        self._step_cache[stage] = step
        return step

    # -------------------------------------------------------- discriminator

    def _d_loss(self, disc_params, real_w, fake_w):
        real_pred = discriminator_apply(disc_params, real_w)
        fake_pred = discriminator_apply(disc_params, fake_w)
        real_loss = jnp.mean(jax.nn.softplus(-real_pred))
        fake_loss = jnp.mean(jax.nn.softplus(fake_pred))
        return real_loss + fake_loss, (real_loss, fake_loss)

    def _get_d_step_fn(self, regularize: bool):
        if regularize in self._d_step_cache:
            return self._d_step_cache[regularize]
        opts = self.opts

        def _d_step_fn(disc_params, d_opt_state, real_w, fake_w):
            (loss, (rl, fl)), grads = jax.value_and_grad(
                self._d_loss, has_aux=True)(disc_params, real_w, fake_w)
            updates, d_opt_state = self.d_optimizer.update(grads, d_opt_state,
                                                           disc_params)
            disc_params = optax.apply_updates(disc_params, updates)
            out = {"discriminator_loss": loss, "d_real_loss": rl,
                   "d_fake_loss": fl}
            if regularize:
                def real_sum(w):
                    return jnp.sum(discriminator_apply(disc_params, w))

                grad_real = jax.grad(real_sum)(real_w)
                r1 = jnp.mean(jnp.sum(
                    jnp.square(grad_real).reshape(real_w.shape[0], -1), axis=1))
                r1_loss = opts.r1 / 2 * r1 * opts.d_reg_every

                def r1_obj(dp):
                    g = jax.grad(lambda w: jnp.sum(
                        discriminator_apply(dp, w)))(real_w)
                    pen = jnp.mean(jnp.sum(
                        jnp.square(g).reshape(real_w.shape[0], -1), axis=1))
                    return opts.r1 / 2 * pen * opts.d_reg_every

                r1_grads = jax.grad(r1_obj)(disc_params)
                updates, d_opt_state = self.d_optimizer.update(
                    r1_grads, d_opt_state, disc_params)
                disc_params = optax.apply_updates(disc_params, updates)
                out["discriminator_r1_loss"] = r1_loss
            return disc_params, d_opt_state, out

        if self.mesh is not None:
            rep, dat = self._rep_sh, self._data_sh
            d_step = jax.jit(_d_step_fn, donate_argnums=(0, 1),
                             in_shardings=(rep, rep, dat, dat))
        else:
            d_step = jax.jit(_d_step_fn, donate_argnums=(0, 1))

        self._d_step_cache[regularize] = d_step
        return d_step

    def _get_fused_step_fn(self, stage: int):
        """ONE jit dispatch for the full W-discriminator train step:
        latent sampling (decoder mapping + encoder forward) → D update →
        lazy R1 (lax.cond on a traced flag, so one executable serves both
        step kinds) → encoder update against the UPDATED discriminator.

        Same op sequence as the unfused 3-dispatch path (the reference
        trains D first each step — coach.py:105-149); equivalence pinned
        by test_coach_fused_d_step_matches_unfused. On a tunneled runtime
        the unfused path paid ~2 extra dispatches + eager latent slices +
        a duplicate x transfer per step — the bulk of the measured
        ~125 ms/step W-D overhead for a ~3 ms discriminator graph."""
        if stage in self._fused_cache:
            return self._fused_cache[stage]
        opts = self.opts
        cfg = self.psp.cfg
        dec_cfg = self.psp.decoder_cfg
        use_avg = (cfg.start_from_latent_avg
                   and self.psp.latent_avg is not None)

        def _fused_fn(trainable, opt_state, disc_params, d_opt_state,
                      x, y, z, latent_avg, do_r1, frozen):
            # --- D phase (fake w from the CURRENT encoder, stop-grad) ---
            dec_params = trainable.get("decoder", frozen["decoder"])
            real_w = gen_mapping(dec_params, dec_cfg, z)[:, 0, :]
            codes = self._encoder_forward(trainable["encoder"], x, stage)
            if use_avg:
                codes = codes + latent_avg[None].astype(codes.dtype)
            real_w = jax.lax.stop_gradient(real_w.astype(jnp.float32))
            fake_w = jax.lax.stop_gradient(codes[:, 0, :].astype(jnp.float32))
            (d_loss, (rl, fl)), d_grads = jax.value_and_grad(
                self._d_loss, has_aux=True)(disc_params, real_w, fake_w)
            d_updates, d_opt_state = self.d_optimizer.update(
                d_grads, d_opt_state, disc_params)
            disc_params = optax.apply_updates(disc_params, d_updates)

            def _r1(args):
                dp, dos = args
                g = jax.grad(lambda w: jnp.sum(
                    discriminator_apply(dp, w)))(real_w)
                r1 = jnp.mean(jnp.sum(
                    jnp.square(g).reshape(real_w.shape[0], -1), axis=1))
                r1_loss = opts.r1 / 2 * r1 * opts.d_reg_every

                def r1_obj(dpp):
                    gg = jax.grad(lambda w: jnp.sum(
                        discriminator_apply(dpp, w)))(real_w)
                    pen = jnp.mean(jnp.sum(
                        jnp.square(gg).reshape(real_w.shape[0], -1), axis=1))
                    return opts.r1 / 2 * pen * opts.d_reg_every

                r1_grads = jax.grad(r1_obj)(dp)
                upd, dos = self.d_optimizer.update(r1_grads, dos, dp)
                return optax.apply_updates(dp, upd), dos, r1_loss

            disc_params, d_opt_state, r1_loss = jax.lax.cond(
                do_r1, _r1, lambda a: (a[0], a[1], jnp.float32(0.0)),
                (disc_params, d_opt_state))
            d_dict = {"discriminator_loss": d_loss, "d_real_loss": rl,
                      "d_fake_loss": fl, "discriminator_r1_loss": r1_loss}

            # --- encoder phase, against the updated discriminator ---
            (loss, (loss_dict, y_hat, latent)), grads = jax.value_and_grad(
                self._calc_loss, has_aux=True)(trainable, x, y, stage,
                                               disc_params, frozen)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       trainable)
            trainable = optax.apply_updates(trainable, updates)
            return (trainable, opt_state, disc_params, d_opt_state,
                    {**d_dict, **loss_dict}, y_hat, latent)

        if self.mesh is not None:
            rep, dat = self._rep_sh, self._data_sh
            fused = jax.jit(_fused_fn, donate_argnums=(0, 1, 2, 3),
                            in_shardings=(rep, rep, rep, rep, dat, dat,
                                          dat, rep, rep, rep))
        else:
            fused = jax.jit(_fused_fn, donate_argnums=(0, 1, 2, 3))

        self._fused_cache[stage] = fused
        return fused

    def _encoder_forward(self, enc_params, x, stage: int):
        """Raw encoder forward (no latent_avg), dispatched by encoder_type.
        Used by the D-phase latent sampling — always fp32 params, matching
        the reference's discriminator sampling path."""
        cfg = self.psp.cfg
        if cfg.encoder_type == "Encoder4Editing":
            return encoder4editing(enc_params, x, cfg.stylegan_size,
                                   stage, layout=cfg.encoder_layout)
        if cfg.encoder_type == "GradualStyleEncoder":
            return gradual_style_encoder(enc_params, x, cfg.stylegan_size,
                                         layout=cfg.encoder_layout)
        return backbone_encoder_into_w(enc_params, x, cfg.stylegan_size,
                                       layout=cfg.encoder_layout)

    def _get_sample_fn(self, stage: int):
        """One jit for the real/fake W sampling (decoder mapping + encoder
        forward). The previous eager path dispatched every op individually —
        pathological on remote/tunneled runtimes (docs/performance.md)."""
        if stage in self._sample_cache:
            return self._sample_cache[stage]
        cfg = self.psp.cfg
        dec_cfg = self.psp.decoder_cfg
        use_avg = (cfg.start_from_latent_avg
                   and self.psp.latent_avg is not None)

        def _sample_fn(dec_params, enc_params, latent_avg, z, x):
            real_w = gen_mapping(dec_params, dec_cfg, z)[:, 0, :]
            codes = self._encoder_forward(enc_params, x, stage)
            if use_avg:
                codes = codes + latent_avg[None].astype(codes.dtype)
            return real_w, codes

        if self.mesh is not None:
            rep, dat = self._rep_sh, self._data_sh
            _sample = jax.jit(_sample_fn,
                              in_shardings=(rep, rep, rep, dat, dat))
        else:
            _sample = jax.jit(_sample_fn)

        self._sample_cache[stage] = _sample
        return _sample

    def sample_real_and_fake_latents(self, x):
        """coach.py:426-439: real w from the decoder mapping on random z;
        fake w from the encoder (first row under progressive training)."""
        z = jnp.asarray(self._rng.randn(x.shape[0], 512), jnp.float32)
        sample = self._get_sample_fn(self.progressive_stage())
        latent_avg = (self.psp.latent_avg if self.psp.latent_avg is not None
                      else jnp.zeros((1, 512)))
        real_w, fake_w = sample(self.psp.decoder_params,
                                self.psp.encoder_params, latent_avg, z,
                                jnp.asarray(x))
        if self.opts.progressive_steps:
            dims = self.get_dims_to_discriminate()
            fake_w = fake_w[:, dims, :]
        if self.opts.use_w_pool:
            real_w = jnp.asarray(self.real_w_pool.query(real_w))
            fake_w = jnp.asarray(self.fake_w_pool.query(fake_w))
        if fake_w.ndim == 3:
            fake_w = fake_w[:, 0, :]
        return real_w, fake_w

    def train_discriminator(self, x):
        """Returns the D losses as DEVICE scalars: train_step merges them
        with the encoder step's dict into ONE device_get — on tunneled
        runtimes each fetch is a full link round-trip."""
        real_w, fake_w = self.sample_real_and_fake_latents(x)
        real_w = jax.lax.stop_gradient(real_w)
        fake_w = jax.lax.stop_gradient(fake_w)
        d_step = self._get_d_step_fn(self.global_step % self.opts.d_reg_every == 0)
        self.discriminator_params, self.d_opt_state, out = d_step(
            self.discriminator_params, self.d_opt_state, real_w, fake_w)
        return out

    # ------------------------------------------------------------ main loop

    def train_step(self, x, y, fetch: bool = True) -> Dict[str, float]:
        """One optimization step. fetch=False returns the loss dict as
        DEVICE scalars instead of floats: back-to-back steps then pipeline
        on the device without a per-step host round-trip (each step's
        donated params chain it after the previous one, so throughput
        timing stays honest); call jax.device_get on the returned dict
        when the losses are actually needed (e.g. at board_interval)."""
        stage = self.progressive_stage()
        regularize = (self.is_training_discriminator()
                      and self.global_step % self.opts.d_reg_every == 0)
        if (self.opts.fuse_d_step and self.is_training_discriminator()
                and not self.opts.use_w_pool):
            fused = self._get_fused_step_fn(stage)
            z = jnp.asarray(self._rng.randn(x.shape[0], 512), jnp.float32)
            latent_avg = (self.psp.latent_avg
                          if self.psp.latent_avg is not None
                          else jnp.zeros((1, 512)))
            frozen_dec = (jnp.zeros((), jnp.float32)
                          if self.opts.train_decoder
                          else self.psp.decoder_params)
            frozen = {"decoder": frozen_dec, "perception": self.perception}
            trainable = self._trainable()
            (trainable, self.opt_state, self.discriminator_params,
             self.d_opt_state, merged, _y_hat, _latent) = fused(
                trainable, self.opt_state, self.discriminator_params,
                self.d_opt_state, jnp.asarray(x), jnp.asarray(y), z,
                latent_avg, jnp.asarray(regularize), frozen)
            self._install(trainable)
        else:
            d_dict = {}
            if self.is_training_discriminator():
                d_dict = self.train_discriminator(x)
            step = self._get_step_fn(stage)
            trainable = self._trainable()
            trainable, self.opt_state, enc_dict, y_hat, latent = step(
                trainable, self.opt_state, jnp.asarray(x), jnp.asarray(y),
                self.discriminator_params)
            self._install(trainable)
            merged = {**d_dict, **enc_dict}
        self.global_step += 1
        if not fetch:
            return merged
        # ONE device→host transfer for D + encoder losses together:
        # per-dict (let alone per-scalar) fetches each pay a tunnel
        # round-trip on remote runtimes
        got = jax.device_get(merged)
        loss_dict = {k: float(v) for k, v in got.items()}
        if not regularize:
            # the fused executable reports r1 as 0.0 on non-reg steps; the
            # unfused path (and the reference) omits the key — match that
            loss_dict.pop("discriminator_r1_loss", None)
        return loss_dict

    def train(self, callback: Optional[Callable] = None,
              best_checkpoint_path: Optional[str] = None):
        """Main loop. When validation improves, best_val_loss is updated and
        (if `best_checkpoint_path` is given) a best-model checkpoint is
        written — the reference's checkpoint_me(is_best=True) → best_model.pt
        (coach.py:133-135)."""
        source = (self.train_iter if self.opts.prefetch_batches <= 0
                  else _Prefetcher(self.train_iter,
                                   self.opts.prefetch_batches).get)
        try:
            while self.global_step < self.opts.max_steps:
                x, y = source()
                step_no = self.global_step + 1  # train_step increments
                fetch = (self.opts.fetch_every <= 1
                         or step_no % self.opts.fetch_every == 0
                         or step_no % self.opts.board_interval == 0
                         or step_no % self.opts.save_interval == 0
                         or step_no >= self.opts.max_steps
                         or (self.test_iter is not None
                             and step_no % self.opts.val_interval == 0))
                loss_dict = self.train_step(x, y, fetch=fetch)
                if callback is not None and fetch:
                    callback(self.global_step, loss_dict)
                if self.test_iter is not None and \
                        self.global_step % self.opts.val_interval == 0:
                    val = self.validate()
                    if self.best_val_loss is None or \
                            val["loss"] < self.best_val_loss:
                        self.best_val_loss = val["loss"]
                        if best_checkpoint_path is not None:
                            self.save_checkpoint(best_checkpoint_path)
        finally:
            if source is not self.train_iter:
                source.__self__.close()

    def validate(self, n_batches: int = 4) -> Dict[str, float]:
        agg: Dict[str, List[float]] = {}
        stage = self.progressive_stage()
        for _ in range(n_batches):
            x, y = self.test_iter()
            loss, (loss_dict, _, _) = self._calc_loss(
                self._trainable(), jnp.asarray(x), jnp.asarray(y), stage,
                self.discriminator_params)
            for k, v in loss_dict.items():
                agg.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in agg.items()}

    # ---------------------------------------------------------- checkpoints

    def save_checkpoint(self, path: str, backend: str = "pickle"):
        """Full train state (net + optimizer + discriminator + step), the
        reference's __get_save_dict analogue (coach.py:323-340).

        backend='orbax' writes an orbax StandardCheckpointer directory
        (async-safe, multi-host-aware) instead of the pickle bundle."""
        if backend == "orbax":
            self._save_orbax(path)
            return
        import pickle
        state = {
            "global_step": self.global_step,
            "best_val_loss": self.best_val_loss,
            "encoder_params": jax.tree_util.tree_map(np.asarray,
                                                     self.psp.encoder_params),
            "decoder_params": jax.tree_util.tree_map(np.asarray,
                                                     self.psp.decoder_params),
            "latent_avg": None if self.psp.latent_avg is None
            else np.asarray(self.psp.latent_avg),
            "opt_state": jax.tree_util.tree_map(np.asarray, self.opt_state),
            "opts": dataclasses.asdict(self.opts),
        }
        if self.discriminator_params is not None:
            state["discriminator_params"] = jax.tree_util.tree_map(
                np.asarray, self.discriminator_params)
            state["d_opt_state"] = jax.tree_util.tree_map(np.asarray,
                                                          self.d_opt_state)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def _save_orbax(self, path: str):
        import orbax.checkpoint as ocp

        state = {
            "encoder_params": self.psp.encoder_params,
            "decoder_params": self.psp.decoder_params,
            "opt_state": self.opt_state,
        }
        if self.psp.latent_avg is not None:
            state["latent_avg"] = self.psp.latent_avg
        if self.discriminator_params is not None:
            state["discriminator_params"] = self.discriminator_params
            state["d_opt_state"] = self.d_opt_state
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), state, force=True)
        import json
        with open(os.path.join(path, "coach_meta.json"), "w") as f:
            json.dump({"global_step": self.global_step,
                       "best_val_loss": self.best_val_loss,
                       "opts": dataclasses.asdict(self.opts)}, f)

    def load_checkpoint(self, path: str, backend: str = "pickle"):
        if backend == "orbax" or os.path.isdir(path):
            import json
            import orbax.checkpoint as ocp

            target = {
                "encoder_params": self.psp.encoder_params,
                "decoder_params": self.psp.decoder_params,
                "opt_state": self.opt_state,
            }
            if self.psp.latent_avg is not None:
                target["latent_avg"] = self.psp.latent_avg
            if self.discriminator_params is not None:
                target["discriminator_params"] = self.discriminator_params
                target["d_opt_state"] = self.d_opt_state
            with ocp.StandardCheckpointer() as ckptr:
                state = ckptr.restore(os.path.abspath(path), target)
            self.psp.encoder_params = state["encoder_params"]
            self.psp.decoder_params = state["decoder_params"]
            self.opt_state = state["opt_state"]
            if "latent_avg" in state:
                self.psp.latent_avg = state["latent_avg"]
            if "discriminator_params" in state:
                self.discriminator_params = state["discriminator_params"]
                self.d_opt_state = state["d_opt_state"]
            with open(os.path.join(path, "coach_meta.json")) as f:
                meta = json.load(f)
            self.global_step = meta["global_step"]
            self.best_val_loss = meta["best_val_loss"]
            return
        import pickle
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.global_step = state["global_step"]
        self.best_val_loss = state["best_val_loss"]
        self.psp.encoder_params = jax.tree_util.tree_map(
            jnp.asarray, state["encoder_params"])
        self.psp.decoder_params = jax.tree_util.tree_map(
            jnp.asarray, state["decoder_params"])
        if state.get("latent_avg") is not None:
            self.psp.latent_avg = jnp.asarray(state["latent_avg"])
        self.opt_state = jax.tree_util.tree_map(jnp.asarray, state["opt_state"])
        if "discriminator_params" in state:
            self.discriminator_params = jax.tree_util.tree_map(
                jnp.asarray, state["discriminator_params"])
            self.d_opt_state = jax.tree_util.tree_map(jnp.asarray,
                                                      state["d_opt_state"])
