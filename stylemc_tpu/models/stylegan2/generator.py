"""StyleGAN2-ADA generator, functional JAX.

Architecture contract: the `training/networks.py` embedded in NVIDIA pickles —
not present in the reference tree; its layout is documented by the parameter
table in /root/reference/legacy.py:172-203 and exercised by
/root/reference/utils.py:13-53 (block_forward) and :77-158 (S-space surgery).

TPU-first redesign decisions:
  * The generator is a pure function over a params pytree — no module state.
    The reference's affine→Identity surgery (utils.py:108-117) exists only
    because torch modules are stateful; here the style space is a first-class
    input: `synthesis` consumes packed S-space styles directly, and
    `w_to_s` / `mapping` produce them.
  * Per-sample weight modulation runs as the unfused input/output scaling
    decomposition (ops/modulated_conv.py) so every conv is one shared-weight
    MXU conv over the whole batch.
  * Low precision is bfloat16 (TPU-native), applied to blocks at resolution
    >= img_resolution / 2**(num_fp16_res-1) exactly like the reference's fp16
    policy; fp32 everywhere by default for bit-parity runs.
  * `until_k` partial-resolution synthesis (utils.py:169-173) is a static
    Python argument — each truncation compiles its own graph, keeping control
    flow out of the compiled program.

Parameter pytree layout (names follow the checkpoint mapping in legacy.py so
import is a direct rename):

  params = {
    'mapping': {'fc0': {'weight': [512,512], 'bias': [512]}, ..., 'w_avg': [512]},
    'synthesis': {
      'b4':   {'const': [C,4,4], 'conv1': LAYER, 'torgb': RGB},
      'b8':   {'conv0': LAYER, 'conv1': LAYER, 'torgb': RGB},
      ...
    },
  }
  LAYER = {'affine': {'weight': [C_in, w_dim], 'bias': [C_in]},
           'weight': [C_out, C_in, 3, 3], 'bias': [C_out],
           'noise_strength': scalar, 'noise_const': [res, res]}
  RGB   = {'affine': ..., 'weight': [3, C_in, 1, 1], 'bias': [3]}
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import (bias_act, modulated_conv2d, setup_filter,
                    setup_filter_np, upsample2d)

# Packed S-space layout: 26 rows of width 512 — 2 rows for b4 (conv1, torgb)
# + 3 rows (conv0, conv1, torgb) per upper block, sized for a 1024-res
# generator (reference find_direction.py:38-41).
N_STYLE_CHANNELS = 26
S_TRAINABLE_SPACE_CHANNELS = (2, 3, 5, 6, 8, 9, 11, 12)
S_NON_TRAINABLE_SPACE_CHANNELS = tuple(
    i for i in range(N_STYLE_CHANNELS) if i not in S_TRAINABLE_SPACE_CHANNELS
)
STYLE_DIM = 512


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    mapping_layers: int = 8
    mapping_lr_multiplier: float = 0.01
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    # 'float32' for parity; 'bfloat16' enables mixed precision on the top
    # num_fp16_res blocks (TPU-native analogue of the reference fp16 policy).
    low_precision_dtype: str = "float32"
    # Fused up-conv implementation for the synthesis blocks (None → the ops
    # module default, "polyphase"). "polyphase" keeps the autodiff transpose
    # at low resolution (fastest fwd+bwd → training); "pad_dilate" skips the
    # output interleave (fastest pure forward → inference/serving). Static
    # (part of the frozen cfg) so shared jit caches key on it.
    up_conv_impl: Optional[str] = None
    # rematerialize each synthesis block under autodiff (jax.checkpoint):
    # activations are recomputed in the backward pass instead of stored,
    # cutting peak HBM from O(sum of block activations) to O(largest block)
    # — enables 1024px / large-batch training on 16 GB chips at the cost of
    # one extra forward. Identical numerics.
    remat: bool = False
    # selective remat: with remat=True, checkpoint only blocks at
    # resolution >= remat_min_res (0 = every block, the conservative
    # default). A 1024 generator's FLOPs sit in the 512-channel LOWER
    # blocks while its activation bytes sit in the channel-thin UPPER
    # planes — storing the small low-res activations (skipping their
    # backward recompute) while still rematerializing the big planes
    # keeps peak HBM near full-remat at a fraction of the recompute.
    remat_min_res: int = 0

    @property
    def block_resolutions(self) -> List[int]:
        return [2 ** i for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    def channels(self, res: int) -> int:
        # floor at 1: tiny test configs (small channel_base at high res) must
        # not produce 0-channel layers (zero-div equalized-lr gains)
        return max(1, min(self.channel_base // res, self.channel_max))

    @property
    def num_ws(self) -> int:
        # One w per conv, plus one for the last torgb (ADA broadcast
        # convention: each torgb reuses the following block's first w).
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2
        return n + 1

    @property
    def num_style_rows(self) -> int:
        """Actual number of occupied rows in the packed [*, 26, 512] layout."""
        return 2 + 3 * (len(self.block_resolutions) - 1)

    def block_dtype(self, res: int) -> jnp.dtype:
        if self.low_precision_dtype == "float32":
            return jnp.float32
        lowp_cutoff = self.img_resolution // (2 ** (self.num_fp16_res - 1))
        if res >= lowp_cutoff:
            return jnp.dtype(self.low_precision_dtype)
        return jnp.float32

    def temp_shapes(self) -> List[Tuple[int, int, int]]:
        """Per-block true style widths (conv0, conv1, torgb) — the reference's
        `get_temp_shapes` (utils.py:100-120) derived from config instead of
        module surgery."""
        shapes = []
        for res in self.block_resolutions:
            c = self.channels(res)
            c_in = self.channels(res // 2) if res > 4 else c
            if res == 4:
                shapes.append((c, c, c))
            else:
                shapes.append((c_in, c, c))
        return shapes


# ------------------------------------------------------------------ init


def _fc_init(key, in_f, out_f, bias_init=0.0, lr_multiplier=1.0):
    # ADA stores weights pre-divided by lr_multiplier (networks.py
    # FullyConnectedLayer: randn/lr_multiplier) so the runtime gain
    # lr_multiplier/sqrt(in_f) nets to unit-scale activations. Without the
    # division, an 8-layer mapping at lr_mult=0.01 attenuates z by 1e-16 and
    # every seed collapses to the same w.
    kw, _ = jax.random.split(key)
    return {
        "weight": jax.random.normal(kw, (out_f, in_f), jnp.float32)
        / lr_multiplier,
        "bias": jnp.full((out_f,), float(bias_init), jnp.float32),
    }


def init_generator_params(key, cfg: GeneratorConfig) -> Dict[str, Any]:
    """Random init matching the ADA scheme (unit normal weights; equalized-lr
    gains applied at runtime)."""
    # mapping fcs + (conv0 3, conv1 3, torgb 2) per block + const: a 1024-res
    # generator draws 78 keys (a fixed 64 failed there with StopIteration)
    n_keys = cfg.mapping_layers + 8 * len(cfg.block_resolutions) + 1
    keys = jax.random.split(key, n_keys)
    ki = iter(keys)

    mapping = {}
    for i in range(cfg.mapping_layers):
        mapping[f"fc{i}"] = _fc_init(next(ki), cfg.w_dim if i else cfg.z_dim,
                                     cfg.w_dim,
                                     lr_multiplier=cfg.mapping_lr_multiplier)
    mapping["w_avg"] = jnp.zeros((cfg.w_dim,), jnp.float32)

    synthesis = {}
    for res in cfg.block_resolutions:
        c_out = cfg.channels(res)
        c_in = cfg.channels(res // 2) if res > 4 else c_out
        block: Dict[str, Any] = {}
        if res == 4:
            block["const"] = jax.random.normal(next(ki), (c_out, 4, 4), jnp.float32)
        else:
            block["conv0"] = {
                "affine": _fc_init(next(ki), cfg.w_dim, c_in, bias_init=1.0),
                "weight": jax.random.normal(next(ki), (c_out, c_in, 3, 3), jnp.float32),
                "bias": jnp.zeros((c_out,), jnp.float32),
                "noise_strength": jnp.zeros((), jnp.float32),
                "noise_const": jax.random.normal(next(ki), (res, res), jnp.float32),
            }
        block["conv1"] = {
            "affine": _fc_init(next(ki), cfg.w_dim, c_out, bias_init=1.0),
            "weight": jax.random.normal(next(ki), (c_out, c_out, 3, 3), jnp.float32),
            "bias": jnp.zeros((c_out,), jnp.float32),
            "noise_strength": jnp.zeros((), jnp.float32),
            "noise_const": jax.random.normal(next(ki), (res, res), jnp.float32),
        }
        block["torgb"] = {
            "affine": _fc_init(next(ki), cfg.w_dim, c_out, bias_init=1.0),
            "weight": jax.random.normal(next(ki), (cfg.img_channels, c_out, 1, 1), jnp.float32),
            "bias": jnp.zeros((cfg.img_channels,), jnp.float32),
        }
        synthesis[f"b{res}"] = block
    return {"mapping": mapping, "synthesis": synthesis}


# ------------------------------------------------------------------ mapping


def _fc(params, x, activation="linear", lr_multiplier=1.0, gain_dim=None):
    """Equalized-lr fully connected layer: runtime weight gain
    lr_multiplier/sqrt(in_features), bias scaled by lr_multiplier."""
    w = params["weight"]
    in_f = w.shape[1]
    w = w * (lr_multiplier / np.sqrt(in_f))
    b = params["bias"] * lr_multiplier
    y = x @ w.T.astype(x.dtype)
    return bias_act(y, b.astype(jnp.float32), dim=y.ndim - 1, act=activation)


def normalize_2nd_moment(x, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


def mapping(params, cfg: GeneratorConfig, z, c=None, truncation_psi: float = 1.0,
            truncation_cutoff: Optional[int] = None, skip_w_avg_update: bool = True):
    """z [N, z_dim] → broadcast ws [N, num_ws, w_dim]."""
    mp = params["mapping"]
    x = normalize_2nd_moment(z.astype(jnp.float32))
    if cfg.c_dim > 0 and c is not None:
        # Conditional embedding path (parity stub: FFHQ models are unconditional).
        y = normalize_2nd_moment(_fc(mp["embed"], c.astype(jnp.float32)))
        x = jnp.concatenate([x, y], axis=-1)
    for i in range(cfg.mapping_layers):
        x = _fc(mp[f"fc{i}"], x, activation="lrelu",
                lr_multiplier=cfg.mapping_lr_multiplier)
    ws = jnp.repeat(x[:, None, :], cfg.num_ws, axis=1)
    if truncation_psi != 1.0:
        w_avg = mp["w_avg"]
        if truncation_cutoff is None:
            ws = w_avg + truncation_psi * (ws - w_avg)
        else:
            head = w_avg + truncation_psi * (ws[:, :truncation_cutoff] - w_avg)
            ws = jnp.concatenate([head, ws[:, truncation_cutoff:]], axis=1)
    return ws


# ------------------------------------------------------------------ W → S


def split_ws(cfg: GeneratorConfig, ws):
    """Slice broadcast ws into per-block rows (num_conv + num_torgb each),
    advancing by num_conv only — torgb reuses the next block's first w
    (reference utils.py:77-87)."""
    blocks = []
    w_idx = 0
    for res in cfg.block_resolutions:
        num_conv = 1 if res == 4 else 2
        blocks.append(ws[:, w_idx:w_idx + num_conv + 1, :])
        w_idx += num_conv
    return blocks


def _affine(params, w, lr_multiplier=1.0):
    return _fc(params, w, activation="linear", lr_multiplier=lr_multiplier)


def w_to_s(params, cfg: GeneratorConfig, ws):
    """ws [N, num_ws, w_dim] → packed S-space styles [N, 26, 512].

    Row layout matches the reference `get_styles` (utils.py:123-158): per
    block, the per-layer affine outputs packed left-aligned into 512-wide
    rows, zero-padded. The torgb rows hold affine(w) WITHOUT the ToRGB
    weight_gain, which is applied inside synthesis (matching the Identity
    surgery semantics).
    """
    n = ws.shape[0]
    block_ws = split_ws(cfg, ws)
    styles = jnp.zeros((n, N_STYLE_CHANNELS, STYLE_DIM), jnp.float32)
    idx = 0
    for res, cur in zip(cfg.block_resolutions, block_ws):
        bp = params["synthesis"][f"b{res}"]
        if res == 4:
            s_conv1 = _affine(bp["conv1"]["affine"], cur[:, 0, :])
            s_torgb = _affine(bp["torgb"]["affine"], cur[:, 1, :])
            styles = styles.at[:, 0, :s_conv1.shape[-1]].set(s_conv1)
            styles = styles.at[:, 1, :s_torgb.shape[-1]].set(s_torgb)
            idx += 2
        else:
            s_conv0 = _affine(bp["conv0"]["affine"], cur[:, 0, :])
            s_conv1 = _affine(bp["conv1"]["affine"], cur[:, 1, :])
            s_torgb = _affine(bp["torgb"]["affine"], cur[:, 2, :])
            styles = styles.at[:, idx, :s_conv0.shape[-1]].set(s_conv0)
            styles = styles.at[:, idx + 1, :s_conv1.shape[-1]].set(s_conv1)
            styles = styles.at[:, idx + 2, :s_torgb.shape[-1]].set(s_torgb)
            idx += 3
    return styles


# ------------------------------------------------------------------ synthesis


def _synthesis_layer(lp, x, style, resample_filter, up, dtype, noise_mode,
                     noise_key=None, gain=1.0, conv_clamp=256.0,
                     up_impl=None):
    """One modulated 3x3 conv + noise + fused lrelu."""
    res = x.shape[-1] * up
    noise = None
    if noise_mode == "const":
        noise = (lp["noise_const"] * lp["noise_strength"]).astype(jnp.float32)
        noise = noise[None, None, :, :]
    elif noise_mode == "random":
        assert noise_key is not None, "random noise requires a PRNG key"
        noise = jax.random.normal(noise_key, (x.shape[0], 1, res, res),
                                  jnp.float32) * lp["noise_strength"]
    flip_weight = up == 1
    x = modulated_conv2d(
        x.astype(dtype), lp["weight"], style, noise=noise, up=up, padding=1,
        resample_filter=resample_filter, demodulate=True, flip_weight=flip_weight,
        up_impl=up_impl,
    )
    act_gain = float(np.sqrt(2)) * gain
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    return bias_act(x, lp["bias"], act="lrelu", gain=act_gain, clamp=act_clamp)


def _torgb_layer(lp, x, style, conv_clamp=256.0):
    c_in = lp["weight"].shape[1]
    weight_gain = 1.0 / np.sqrt(c_in)  # 1x1 kernel
    style = style * weight_gain
    y = modulated_conv2d(x, lp["weight"], style, demodulate=False)
    y = bias_act(y, lp["bias"], act="linear", clamp=conv_clamp)
    return y.astype(jnp.float32)


def synthesis(params, cfg: GeneratorConfig, styles, until_k: Optional[int] = None,
              noise_mode: str = "const", noise_key=None,
              blend_masks: Optional[Dict[int, Any]] = None,
              xs_original: Optional[List[Any]] = None,
              return_features: bool = False):
    """Packed S-space styles [N, 26, 512] → image [N, C, R, R].

    Args:
      until_k: stop after block index k (partial-resolution rendering,
        reference utils.py:169-173). None = all blocks. Static.
      noise_mode: 'const' | 'random' | 'none'.
      blend_masks: {resolution: mask [N or 1, 1, res, res]} — feature-space
        blending with `xs_original` at that block (reference utils.py:186-205,
        used at res 32/64). Masks must be pre-resized.
      xs_original: per-block features of the original image (from a previous
        `return_features=True` call) to blend toward.
      return_features: also return the per-block feature list `xs`.
    """
    n = styles.shape[0]
    filt = setup_filter_np(cfg.resample_filter)  # numpy: static for pallas
    temp_shapes = cfg.temp_shapes()

    x = None
    img = None
    xs = []
    styles_idx = 0
    for k, res in enumerate(cfg.block_resolutions):
        if until_k is not None and k > until_k:
            break
        bp = params["synthesis"][f"b{res}"]
        shapes = temp_shapes[k]
        dtype = cfg.block_dtype(res)
        nk0 = nk1 = None
        if noise_key is not None:
            noise_key, nk0, nk1 = jax.random.split(noise_key, 3)

        if res == 4:
            x = jnp.broadcast_to(bp["const"][None], (n,) + bp["const"].shape)
            x = x.astype(dtype)
            s_conv1 = styles[:, styles_idx, :shapes[1]]
            s_torgb = styles[:, styles_idx + 1, :shapes[2]]
            x = _synthesis_layer(bp["conv1"], x, s_conv1, filt, up=1, dtype=dtype,
                                 noise_mode=noise_mode, noise_key=nk1,
                                 conv_clamp=cfg.conv_clamp,
                                 up_impl=cfg.up_conv_impl)
            styles_idx += 2
        else:
            s_conv0 = styles[:, styles_idx, :shapes[0]]
            s_conv1 = styles[:, styles_idx + 1, :shapes[1]]
            s_torgb = styles[:, styles_idx + 2, :shapes[2]]
            styles_idx += 3

            def upper_block(bp, x, img, s_conv0, s_conv1, s_torgb, nk0, nk1,
                            dtype=dtype):
                x = _synthesis_layer(bp["conv0"], x, s_conv0, filt, up=2,
                                     dtype=dtype, noise_mode=noise_mode,
                                     noise_key=nk0, conv_clamp=cfg.conv_clamp,
                                     up_impl=cfg.up_conv_impl)
                x = _synthesis_layer(bp["conv1"], x, s_conv1, filt, up=1,
                                     dtype=dtype, noise_mode=noise_mode,
                                     noise_key=nk1, conv_clamp=cfg.conv_clamp,
                                     up_impl=cfg.up_conv_impl)
                from ...ops.pallas.upfirdn2d_pallas import upsample2d_pallas
                img = upsample2d_pallas(img, filt)
                img = img + _torgb_layer(bp["torgb"], x, s_torgb,
                                         conv_clamp=cfg.conv_clamp)
                return x, img

            blend_here = bool(blend_masks and res in blend_masks
                              and xs_original is not None)
            if cfg.remat and not blend_here and res >= cfg.remat_min_res:
                # store only each block's (x, img) boundary; recompute the
                # convs in the backward pass
                upper_block = jax.checkpoint(upper_block)
            if blend_here:
                x = _synthesis_layer(bp["conv0"], x, s_conv0, filt, up=2,
                                     dtype=dtype, noise_mode=noise_mode,
                                     noise_key=nk0, conv_clamp=cfg.conv_clamp,
                                     up_impl=cfg.up_conv_impl)
                x = _synthesis_layer(bp["conv1"], x, s_conv1, filt, up=1,
                                     dtype=dtype, noise_mode=noise_mode,
                                     noise_key=nk1, conv_clamp=cfg.conv_clamp,
                                     up_impl=cfg.up_conv_impl)
                masks = blend_masks[res]
                if not isinstance(masks, (list, tuple)):
                    masks = [masks]
                # applied sequentially, matching the reference's stacked
                # bg/teeth blends at res 64 (utils.py:196-205)
                for m in masks:
                    m = m.astype(x.dtype)
                    x = m * xs_original[k].astype(x.dtype) + (1 - m) * x
            else:
                x, img = upper_block(bp, x, img, s_conv0, s_conv1, s_torgb,
                                     nk0, nk1)
                xs.append(x)
                continue

        # fall-through for b4 and blended blocks: skip-architecture ToRGB
        # chain (Pallas polyphase kernel on TPU, XLA fallback elsewhere)
        if img is not None:
            from ...ops.pallas.upfirdn2d_pallas import upsample2d_pallas
            img = upsample2d_pallas(img, filt)
        y = _torgb_layer(bp["torgb"], x, s_torgb, conv_clamp=cfg.conv_clamp)
        img = y if img is None else img + y
        xs.append(x)

    if return_features:
        return xs, img
    return img


def inference_cfg(cfg: GeneratorConfig) -> GeneratorConfig:
    """cfg tuned for forward-only (no-grad) use: pad_dilate up-convs.

    Measured on a v5e (.bench/up_fwd_ab.py): pure-forward FFHQ-256
    synthesis runs 61 ms/batch64 with pad_dilate vs 102 ms with polyphase
    (the polyphase output interleave is pure bandwidth at full output
    size); polyphase wins only when the backward runs (its autodiff
    transpose stays at low resolution — .bench/up_conv_ab.py). Serving,
    rendering CLIs, and metrics loops call this; training paths keep the
    polyphase default. An explicit user-set cfg.up_conv_impl wins.
    """
    if cfg.up_conv_impl is None:
        return dataclasses.replace(cfg, up_conv_impl="pad_dilate")
    return cfg


def generate(params, cfg: GeneratorConfig, z, truncation_psi: float = 1.0,
             noise_mode: str = "const", noise_key=None):
    """Full z → image convenience path (mapping → w_to_s → synthesis)."""
    ws = mapping(params, cfg, z, truncation_psi=truncation_psi)
    styles = w_to_s(params, cfg, ws)
    return synthesis(params, cfg, styles, noise_mode=noise_mode,
                     noise_key=noise_key)


RESOLUTION_UNTIL_K = {256: 6, 512: 7, 1024: 8}  # reference find_direction.py:263

# Jitted entry points (cfg is a frozen dataclass → hashable static arg).
# Eager per-op dispatch is pathological over remote-TPU links; CLIs use these.
mapping_jit = jax.jit(mapping, static_argnums=(1,),
                      static_argnames=("truncation_psi", "truncation_cutoff",
                                       "skip_w_avg_update"))
w_to_s_jit = jax.jit(w_to_s, static_argnums=(1,))
synthesis_jit = jax.jit(synthesis, static_argnums=(1,),
                        static_argnames=("until_k", "noise_mode",
                                         "return_features"))
