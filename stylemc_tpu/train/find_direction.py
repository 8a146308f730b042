"""Global S-space direction optimization (the StyleMC core).

Behavioral contract: /root/reference/find_direction.py:203-353 —
SGD over a trainable Δs restricted to channels [2,3,5,6,8,9,11,12], cosine
LR, loss = id_coef·ArcFace + clip_coef·CLIP-directional (+0.5·ViT-B/16 when
clip_type='double') + l2_coef·MSE(styles2, styles) (+ landmarks, see below),
partial-resolution synthesis via until_k = {256:6, 512:7, 1024:8}.

TPU-first redesign (same math, fewer FLOPs, one jit graph):
  * The original (unedited) images depend only on the fixed seed styles, so
    their ArcFace/CLIP features are precomputed ONCE and cached — each step
    runs a single synthesis + single CLIP/ArcFace forward instead of the
    reference's two of each. Numerically identical: the reference detaches
    the original-image features anyway (id_loss.py:30; CLIP source features
    carry no Δs dependence).
  * Whole step (synthesis → losses → grad → SGD update) is one jit graph.
  * Data parallelism: batch rows sharded over a 1-axis device mesh with
    NamedSharding; Δs replicated; XLA inserts the psum for the grad — no
    hand-written collectives.
  * Batch sampling: `batch_size` random items per step (static shapes). The
    reference samples an aligned batch-start instead, with a ragged final
    batch (find_direction.py:303-304) — equivalent in expectation, and
    static shapes keep XLA from recompiling.

Landmarks loss: in the reference the MobileNet landmarker runs under
torch.no_grad() with a PIL round-trip (find_direction.py:90-91,129-141), so
it contributes ZERO gradient — it only shifts the printed loss. We therefore
keep it out of the jit graph; `landmarks_metric_fn` can be supplied to
reproduce the reported number.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import math
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.stylegan2.generator import (
    GeneratorConfig, synthesis, N_STYLE_CHANNELS, STYLE_DIM,
    S_TRAINABLE_SPACE_CHANNELS,
)
from ..models.clip import encode_image, unprocess
from ..losses.clip_loss import make_text_direction
from ..losses.id_loss import extract_feats
from ..losses.clip_loss_nada import NADATextAnchors, preprocess_nada

TRAINABLE = list(S_TRAINABLE_SPACE_CHANNELS)


@dataclasses.dataclass
class FindDirectionConfig:
    """Mirrors the reference CLI defaults (find_direction.py:205-228)."""
    text_prompt: str = "a photo of a face of a feminine woman with no makeup"
    negative_text_prompt: str = "a photo of a face of a masculine man"
    resolution: int = 256
    batch_size: int = 4
    learning_rate: float = 1.5
    n_epochs: int = 4
    identity_loss_coef: float = 0.6
    landmarks_loss_coef: float = 25.0
    # BEYOND-REFERENCE fix-with-flag: backpropagate the landmarks loss.
    # The reference's landmarks term contributes ZERO gradient (no_grad +
    # PIL round-trip, find_direction.py:90-141) — default False keeps that
    # parity (logging-only term). True moves it into the jit graph: MTCNN
    # boxes are detected ONCE on the frozen originals, the edited render is
    # cropped with a differentiable bilinear crop (ops/image.py, oracle-
    # matched to the host crop_face+cv2.resize pipeline) and the MobileNet
    # landmarker runs differentiably; loss = coef · MSE over non-jaw
    # points in pixel units, like the reference intended.
    landmarks_in_graph: bool = False
    l2_reg_coef: float = 0.1
    clip_loss_coef: float = 1.0
    clip_type: str = "double"          # 'small' | 'large' | 'double'
    clip_loss_type: str = "default"    # 'default' | 'nada' | 'nada_global'
    noise_mode: str = "const"
    seed: int = 0
    # non-default ArcFace bottleneck layout (tests / dryruns); None = IR-SE-50
    arcface_layout: Optional[Any] = None
    # split the training step into per-model jits chained through image
    # cotangents — bounds per-graph compile size (remote-TPU toolchains choke
    # on the monolithic generator+2×CLIP+ArcFace fwd+bwd graph). Costs one
    # extra synthesis forward per step; numerics identical.
    split_step: bool = False
    # run the perception nets (CLIP/ArcFace) in bfloat16 — the TPU analogue
    # of the reference's fp16 CLIP on CUDA (clip.load casts to half there).
    # 'float32' keeps full-precision parity.
    perception_dtype: str = "float32"
    # batch K optimizer steps into one device dispatch via lax.scan. Same
    # math, same RNG stream; 1 = dispatch per step. Measured NEUTRAL on a
    # single v5e (JAX's async dispatch already pipelines the unrolled
    # loop); useful when host-side stepping is the bottleneck (very small
    # models, slow hosts, high-latency device links that defeat
    # pipelining). Ignored (with a warning) when split_step=True: split_step
    # exists to BOUND per-graph compile size and a K-step scan would undo
    # that.
    steps_per_dispatch: int = 1
    # 'cosine' mirrors the reference schedule (find_direction.py:298-299);
    # 'constant' holds learning_rate fixed — the regime where cross-seed
    # direction repeatability is near-1.0 (PARITY.md "Direction
    # robustness"), used by bench.py's tight numerics tripwire. LR is a
    # runtime value in every step path, so switching never recompiles.
    lr_schedule: str = "cosine"        # 'cosine' | 'constant'


def until_k_for_resolution(resolution: int) -> int:
    """Block index for partial-resolution synthesis; generalizes the
    reference's resolution_dict {256:6, 512:7, 1024:8}
    (find_direction.py:263)."""
    return int(np.log2(resolution)) - 2


def cosine_lr(base_lr: float, cur_iteration: int, total_iterations: int) -> float:
    """reference find_direction.py:298-299."""
    return float(np.cos(np.pi * cur_iteration / total_iterations)
                 * base_lr * 0.5 + base_lr * 0.5)


def schedule_lr(fdc: "FindDirectionConfig", cur_iteration: int,
                total_iterations: int) -> float:
    """LR for step `cur_iteration` under fdc.lr_schedule."""
    if fdc.lr_schedule == "constant":
        return float(fdc.learning_rate)
    if fdc.lr_schedule != "cosine":
        raise ValueError(f"lr_schedule {fdc.lr_schedule!r} "
                         "(cosine | constant)")
    return cosine_lr(fdc.learning_rate, cur_iteration, total_iterations)


@dataclasses.dataclass
class CLIPBundle:
    cfg: Any
    params: Any
    text_direction: Optional[jnp.ndarray] = None      # StyleMC loss
    nada_anchors: Optional[NADATextAnchors] = None    # NADA losses
    weight: float = 1.0


def make_clip_bundles(fdc: FindDirectionConfig, clip_models: Dict[str, Tuple],
                      tokenizer=None) -> List[CLIPBundle]:
    """clip_models: {'ViT-B/32': (cfg, params), ...}. Builds the 1-2 bundles
    init_clip_loss would (reference find_direction.py:100-122)."""
    from ..models.clip import tokenize

    if fdc.clip_type == "double":
        names_weights = [("ViT-B/32", 1.0), ("ViT-B/16", 0.5)]
    elif fdc.clip_type == "large":
        names_weights = [("ViT-B/16", 1.0)]
    else:
        names_weights = [("ViT-B/32", 1.0)]

    bundles = []
    for name, weight in names_weights:
        cfg, params = clip_models[name]
        b = CLIPBundle(cfg=cfg, params=params, weight=weight)
        if fdc.clip_loss_type in ("nada", "nada_global"):
            b.nada_anchors = NADATextAnchors.create(
                params, cfg, fdc.negative_text_prompt, fdc.text_prompt,
                tokenizer=tokenizer)
        else:
            t_pos = jnp.asarray(tokenize([fdc.text_prompt], tokenizer=tokenizer))
            t_neg = jnp.asarray(tokenize([fdc.negative_text_prompt],
                                         tokenizer=tokenizer))
            b.text_direction = make_text_direction(params, cfg, t_pos, t_neg)
        bundles.append(b)
    return bundles


def _clip_image_features(bundle: CLIPBundle, img, clip_loss_type: str = "default",
                         clip_params=None, dtype: str = "float32"):
    """clip_params overrides bundle.params when the weights are routed as a
    jit argument (weights embedded as HLO literals make remote-compile
    request bodies exceed size limits). dtype='bfloat16' runs the encoder in
    bf16 (reference parity: clip.load is fp16 on CUDA); features return fp32."""
    size = bundle.cfg.image_resolution
    if clip_loss_type in ("nada", "nada_global"):
        x = preprocess_nada(img, size)
    else:
        x = unprocess(img, size)
    params = clip_params if clip_params is not None else bundle.params
    if dtype != "float32":
        x = x.astype(jnp.dtype(dtype))
    return encode_image(params, bundle.cfg, x).astype(jnp.float32)


def _repr_keyed_cache(maxsize: int):
    """lru_cache keyed on repr(args): the frozen configs aren't reliably
    hashable (resample_filter may arrive as a list), but their reprs are
    stable and capture every traced-in value."""
    def deco(fn):
        cache: collections.OrderedDict = collections.OrderedDict()

        @functools.wraps(fn)
        def wrapper(*args):
            key = repr(args)
            hit = cache.get(key)
            if hit is not None:
                cache.move_to_end(key)
                return hit
            out = fn(*args)
            if len(cache) >= maxsize:
                cache.popitem(last=False)
            cache[key] = out
            return out
        wrapper.cache = cache
        return wrapper
    return deco


@_repr_keyed_cache(maxsize=8)
def _render_graph(gen_cfg: GeneratorConfig, until_k, noise_mode: str):
    """Jitted synthesis forward, cached across find_direction calls (the
    key is pure frozen config; weights ride as the `gp` argument). Fresh
    `jax.jit(lambda...)` per call would retrace every invocation —
    tens of seconds of host time on repeat runs."""
    return jax.jit(lambda gp, s: synthesis(gp, gen_cfg, s,
                                           until_k=until_k,
                                           noise_mode=noise_mode))


@_repr_keyed_cache(maxsize=8)
def _render_u8_graph(gen_cfg: GeneratorConfig, until_k, noise_mode: str):
    """Synthesis + on-device uint8 NHWC conversion in one jit (4× fewer
    host-link bytes than fp32 NCHW), cached like _render_graph."""
    from ..edit import to_u8_nhwc
    return jax.jit(lambda gp, s: to_u8_nhwc(
        synthesis(gp, gen_cfg, s, until_k=until_k, noise_mode=noise_mode)))


@_repr_keyed_cache(maxsize=4)
def _id_feats_graph(arcface_layout: str):
    return jax.jit(lambda ap, img: extract_feats(ap, img, arcface_layout))


@_repr_keyed_cache(maxsize=8)
def _clip_feats_graph(cfg, clip_loss_type: str, dtype: str):
    """cfg is the frozen CLIPConfig; params always arrive via the
    clip_params jit argument, so the traced graph carries no weights."""
    shell = CLIPBundle(cfg=cfg, params=None, weight=1.0)
    return jax.jit(functools.partial(_clip_image_features, shell,
                                     clip_loss_type=clip_loss_type,
                                     dtype=dtype))


def precompute_original_features(gen_params, gen_cfg: GeneratorConfig,
                                 styles_array, bundles: List[CLIPBundle],
                                 arcface_params, fdc: FindDirectionConfig,
                                 chunk: int = 8):
    """Original-image ArcFace + CLIP features for every item, computed once."""
    until_k = until_k_for_resolution(fdc.resolution)

    # Separate jits per model, with the WEIGHTS passed as arguments: each
    # graph compiles (and caches) independently and carries no weight
    # literals — monolithic/constant-laden graphs choke remote-TPU
    # toolchains (HTTP 413 / multi-minute compiles). The jit wrappers are
    # module-cached (pure-config keys) so repeat calls skip the retrace.
    render = _render_graph(gen_cfg, until_k, fdc.noise_mode)
    id_feats = _id_feats_graph(fdc.arcface_layout)
    clip_feats = [_clip_feats_graph(b.cfg, fdc.clip_loss_type,
                                    fdc.perception_dtype)
                  for b in bundles]

    def feats(styles):
        img = render(gen_params, styles)
        return id_feats(arcface_params, img), tuple(
            fn(img, clip_params=b.params)
            for fn, b in zip(clip_feats, bundles))

    n = styles_array.shape[0]
    id_out, clip_out = [], [[] for _ in bundles]
    for i in range(0, n, chunk):
        batch = styles_array[i:i + chunk]
        pad = 0
        if batch.shape[0] < chunk:
            pad = chunk - batch.shape[0]
            batch = jnp.concatenate(
                [batch, jnp.repeat(batch[-1:], pad, axis=0)], axis=0)
        id_f, clip_f = feats(batch)
        keep = chunk - pad
        id_out.append(id_f[:keep])
        for j, cf in enumerate(clip_f):
            clip_out[j].append(cf[:keep])
    return (jnp.concatenate(id_out, axis=0),
            tuple(jnp.concatenate(c, axis=0) for c in clip_out))



def _clip_term_from_img(bundle: CLIPBundle, clip_loss_type: str, img, orig_f,
                        clip_params=None, dtype: str = "float32",
                        text_override: Optional[Dict] = None):
    """One bundle's CLIP alignment term given the rendered image and the
    cached original-image features (un-normalized encode_image outputs).

    text_override routes the prompt-derived anchors as runtime values (keys
    'text_direction' / 'target_direction' / 'target_text_features') instead
    of the bundle's closed-over constants — this is what lets
    `DirectionEngine` swap prompts without retracing."""
    cp = clip_params if clip_params is not None else bundle.params
    f_tgt = _clip_image_features(bundle, img, clip_loss_type, clip_params=cp,
                                 dtype=dtype)
    if clip_loss_type == "nada_global":
        f_n = f_tgt / jnp.linalg.norm(f_tgt, axis=-1, keepdims=True)
        t_n = text_override["target_text_features"] if text_override else \
            bundle.nada_anchors.target_text_features
        logit_scale = jnp.exp(cp["logit_scale"])
        return jnp.mean(1.0 - logit_scale * (f_n @ t_n.T) / 100.0)
    if clip_loss_type == "nada":
        f_src = orig_f / jnp.linalg.norm(orig_f, axis=-1, keepdims=True)
        f_t = f_tgt / jnp.linalg.norm(f_tgt, axis=-1, keepdims=True)
        edit = f_t - f_src
        edit = edit / jnp.maximum(
            jnp.linalg.norm(edit, axis=-1, keepdims=True), 1e-6)
        tgt = text_override["target_direction"] if text_override else \
            bundle.nada_anchors.target_direction
        cos = jnp.sum(edit * tgt, axis=-1)
        return jnp.mean(1.0 - cos)
    # StyleMC: normalize(E(tgt) − E(src)) vs text direction. Norm clamped:
    # at step 1 a zero Δs renders the original exactly (const noise,
    # deterministic TPU), so the edit direction is 0 — 0/0 would NaN.
    edit = f_tgt - orig_f
    edit = edit / jnp.maximum(
        jnp.linalg.norm(edit, axis=-1, keepdims=True), 1e-6)
    td = text_override["text_direction"] if text_override else \
        bundle.text_direction
    cos = jnp.sum(edit * td.astype(edit.dtype), axis=-1)
    return jnp.mean(1.0 - cos)


def make_loss_fn(gen_params, gen_cfg: GeneratorConfig,
                 bundles: List[CLIPBundle], arcface_params,
                 fdc: FindDirectionConfig,
                 edit_fn: Optional[Callable] = None,
                 edit_gen: Optional[Tuple] = None,
                 mobilenet_params=None):
    """loss(trainable, styles, id_feats_orig, clip_feats_orig) → (loss, aux).

    edit_fn(trainable, styles) → styles2. Default: global-direction edit
    (trainable = Δs rows scattered into the trainable channels). The mapper
    trainer passes its own edit_fn. `edit_gen` optionally supplies a second
    (params, cfg) used to render the EDITED image (the two-generator
    domain-transfer mode, reference train_latent_mapper.py:159-162).

    With fdc.landmarks_in_graph, the LAST TWO entries of clip_feats_orig
    are (boxes [B,4], lm_orig [B,68,2] crop-normalized) from
    `prepare_landmarks_refs` — appended to that tuple so every batch-gather
    path (in-jit take, host gather, scan) moves them with the styles rows;
    the landmarker weights route via model_params['mobilenet'] (or the
    `mobilenet_params` closure fallback).
    """
    until_k = until_k_for_resolution(fdc.resolution)
    e_params, e_cfg = edit_gen if edit_gen is not None else (gen_params, gen_cfg)

    if edit_fn is None:
        def edit_fn(delta_s, styles):
            direction = jnp.zeros((1, N_STYLE_CHANNELS, STYLE_DIM), jnp.float32)
            direction = direction.at[:, TRAINABLE].set(delta_s)
            return styles + direction

    def loss_fn(trainable, styles, id_feats_orig, clip_feats_orig,
                model_params=None, text_dirs=None):
        """model_params ({'gen','arc','clip': [...]}) routes the frozen
        weights as jit ARGUMENTS — closures would embed hundreds of MB of
        literals in the HLO (fatal for remote-compile toolchains).
        text_dirs (per-bundle override dicts) likewise routes the
        prompt-derived text anchors as arguments (DirectionEngine)."""
        mp_gen = model_params["gen"] if model_params else e_params
        mp_arc = model_params["arc"] if model_params else arcface_params
        mp_clip = model_params["clip"] if model_params else             [b.params for b in bundles]
        styles2 = edit_fn(trainable, styles)

        img = synthesis(mp_gen, e_cfg, styles2, until_k=until_k,
                        noise_mode=fdc.noise_mode)

        # --- identity loss (reference id_loss.py:26-39, orig feats detached)
        id_img = img.astype(jnp.dtype(fdc.perception_dtype)) \
            if fdc.perception_dtype != "float32" else img
        id_f = extract_feats(mp_arc, id_img, fdc.arcface_layout).astype(
            jnp.float32)
        identity_loss = jnp.mean(1.0 - jnp.sum(id_f * id_feats_orig, axis=1))
        identity_loss = identity_loss * fdc.identity_loss_coef

        # --- CLIP alignment loss
        clip_loss = 0.0
        for i, (b, orig_f, cp) in enumerate(zip(bundles, clip_feats_orig,
                                                mp_clip)):
            clip_loss = clip_loss + b.weight * _clip_term_from_img(
                b, fdc.clip_loss_type, img, orig_f, clip_params=cp,
                dtype=fdc.perception_dtype,
                text_override=text_dirs[i] if text_dirs else None)
        clip_loss = clip_loss * fdc.clip_loss_coef

        # --- L2 manipulation regularizer (find_direction.py:190-191)
        l2 = fdc.l2_reg_coef * jnp.mean(jnp.square(
            styles2[:, TRAINABLE] - styles[:, TRAINABLE]))

        loss = identity_loss + clip_loss + l2
        aux = {"clip_loss": clip_loss, "identity_loss": identity_loss,
               "l2_loss": l2}

        # --- in-graph differentiable landmarks loss (fix-with-flag; see
        # FindDirectionConfig.landmarks_in_graph)
        if fdc.landmarks_in_graph:
            from ..losses.landmarks_loss import landmarks_loss
            from ..models.mobilenet import (mobilenet_gdconv_apply,
                                            IMAGENET_MEAN, IMAGENET_STD)
            from ..ops.image import crop_resize_bilinear

            boxes = clip_feats_orig[-2]
            lm_orig = clip_feats_orig[-1]
            mb = (model_params.get("mobilenet")
                  if model_params else None) or mobilenet_params
            crop = crop_resize_bilinear(img, boxes)         # [-1,1] values
            mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
            std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
            x = ((crop * 0.5 + 128.0 / 255.0) - mean) / std
            lm_edit = mobilenet_gdconv_apply(mb, x).reshape(
                x.shape[0], -1, 2)
            side = (boxes[:, 2] - boxes[:, 0]).reshape(-1, 1, 1)
            lm_term = fdc.landmarks_loss_coef * landmarks_loss(
                lm_edit * side, lm_orig * side)
            loss = loss + lm_term
            aux["landmarks_loss"] = lm_term
        return loss, aux

    return loss_fn


def prepare_landmarks_refs(gen_params, gen_cfg: GeneratorConfig,
                           styles_array, fdc: FindDirectionConfig,
                           landmarker, chunk: int = 8):
    """One-time host+device precompute for the in-graph landmarks loss:
    render every original, MTCNN-detect the best face (host), form the
    crop_face square box (undetected → full-frame box), then run the SAME
    differentiable crop+landmarker pipeline the loss uses to record the
    original landmarks (crop-normalized [N, 68, 2])."""
    from ..models.mobilenet import (mobilenet_gdconv_apply, IMAGENET_MEAN,
                                    IMAGENET_STD)
    from ..models.mtcnn.detect import detect_faces
    from ..ops.image import crop_resize_bilinear, square_crop_box

    until_k = until_k_for_resolution(fdc.resolution)
    render = _render_graph(gen_cfg, until_k, fdc.noise_mode)

    @jax.jit
    def lm_of(mb, img, boxes):
        crop = crop_resize_bilinear(img, boxes)
        mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
        x = ((crop * 0.5 + 128.0 / 255.0) - mean) / std
        return mobilenet_gdconv_apply(mb, x).reshape(x.shape[0], -1, 2)

    n = styles_array.shape[0]
    res = float(fdc.resolution)
    boxes_all, lm_all = [], []
    from ..edit import to_uint8_hwc
    for i in range(0, n, chunk):
        batch = jnp.asarray(styles_array[i:i + chunk])
        img = render(gen_params, batch)
        img_u8 = to_uint8_hwc(img)
        boxes = []
        for frame in img_u8:
            try:
                faces, _ = detect_faces(frame, landmarker.mtcnn)
            except Exception:
                faces = []
            if len(faces):
                best = faces[np.argmax(np.asarray(faces)[:, 4])]
                boxes.append(square_crop_box(best))
            else:
                # undetected → full frame (the reference swallows detector
                # failures and reuses original landmarks)
                boxes.append(np.asarray([0, 0, res, res], np.float32))
        boxes = np.stack(boxes)
        lm_all.append(np.asarray(lm_of(landmarker._params, img,
                                       jnp.asarray(boxes))))
        boxes_all.append(boxes)
    return (jnp.asarray(np.concatenate(boxes_all), jnp.float32),
            jnp.asarray(np.concatenate(lm_all), jnp.float32))



def _make_split_step(gen_params, gen_cfg: GeneratorConfig,
                     bundles: List[CLIPBundle], arcface_params,
                     fdc: FindDirectionConfig, optimizer):
    """Per-model jits chained via dL/d(img): render → per-loss value_and_grad
    w.r.t. the image → pullback through synthesis via a linear contraction
    (grad of sum(img · stop_grad(g_img))) + the analytic L2 term."""
    until_k = until_k_for_resolution(fdc.resolution)

    def _render(gp, delta_s, styles):
        direction = jnp.zeros((1, N_STYLE_CHANNELS, STYLE_DIM), jnp.float32)
        direction = direction.at[:, TRAINABLE].set(delta_s)
        return synthesis(gp, gen_cfg, styles + direction,
                         until_k=until_k, noise_mode=fdc.noise_mode)

    render = jax.jit(_render)

    @jax.jit
    def id_vg(ap, img, id_feats_orig):
        def f(i):
            if fdc.perception_dtype != "float32":
                i = i.astype(jnp.dtype(fdc.perception_dtype))
            idf = extract_feats(ap, i, fdc.arcface_layout).astype(jnp.float32)
            return fdc.identity_loss_coef * jnp.mean(
                1.0 - jnp.sum(idf * id_feats_orig, axis=1))
        return jax.value_and_grad(f)(img)

    def _make_clip_vg(b):
        @jax.jit
        def vg(cp, img, orig_f):
            def f(i):
                return fdc.clip_loss_coef * b.weight * _clip_term_from_img(
                    b, fdc.clip_loss_type, i, orig_f, clip_params=cp,
                    dtype=fdc.perception_dtype)
            return jax.value_and_grad(f)(img)
        return vg

    clip_vgs = [_make_clip_vg(b) for b in bundles]

    @jax.jit
    def update(gp, delta_s, opt_state, styles, g_img):
        def render_contract(d):
            return jnp.sum(_render(gp, d, styles) * g_img)
        g_render = jax.grad(render_contract)(delta_s)

        def l2f(d):
            direction = jnp.zeros((1, N_STYLE_CHANNELS, STYLE_DIM),
                                  jnp.float32)
            direction = direction.at[:, TRAINABLE].set(d)
            styles2 = styles + direction
            return fdc.l2_reg_coef * jnp.mean(jnp.square(
                styles2[:, TRAINABLE] - styles[:, TRAINABLE]))

        l2_val, g_l2 = jax.value_and_grad(l2f)(delta_s)
        grads = g_render + g_l2
        updates, opt_state = optimizer.update(grads, opt_state, delta_s)
        delta_s = optax.apply_updates(delta_s, updates)
        grad_norm = jnp.linalg.norm(grads.reshape(-1))
        return delta_s, opt_state, l2_val, grad_norm

    def step(delta_s, opt_state, styles, id_f, clip_f):
        img = render(gen_params, delta_s, styles)
        id_val, g_img = id_vg(arcface_params, img, id_f)
        clip_total = 0.0
        for vg, cf, b in zip(clip_vgs, clip_f, bundles):
            v, g = vg(b.params, img, cf)
            clip_total = clip_total + v
            g_img = g_img + g
        delta_s, opt_state, l2_val, grad_norm = update(
            gen_params, delta_s, opt_state, styles, g_img)
        loss = id_val + clip_total + l2_val
        aux = {"clip_loss": clip_total, "identity_loss": id_val,
               "l2_loss": l2_val}
        return delta_s, opt_state, loss, aux, grad_norm

    return step


class _FusedGraphs:
    """Jitted fused-step callables shared across find_direction calls."""

    def __init__(self, optimizer, step, step_batch, multi_step):
        self.optimizer = optimizer
        self.step = step
        self.step_batch = step_batch
        self.multi_step = multi_step


def _bundles_fingerprint(bundles: List[CLIPBundle]) -> str:
    """Hash of everything a bundle bakes into the traced loss graph: the
    tower config, the loss weight, and the prompt-derived text anchors
    (which become HLO constants)."""
    import hashlib

    h = hashlib.sha1()
    for b in bundles:
        h.update(repr((b.cfg, b.weight)).encode())
        if b.text_direction is not None:
            h.update(np.asarray(b.text_direction).tobytes())
        if b.nada_anchors is not None:
            for leaf in jax.tree_util.tree_leaves(b.nada_anchors):
                h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


_FUSED_CACHE: Dict[Tuple, _FusedGraphs] = {}
_FUSED_CACHE_MAX = 2


def _fused_step_graphs(gen_cfg: GeneratorConfig, fdc: FindDirectionConfig,
                       bundles: List[CLIPBundle],
                       has_mobilenet: bool) -> _FusedGraphs:
    """The fused training-step graphs, CACHED across find_direction calls.

    Every weight pytree (generator / ArcFace / CLIP / MobileNet) routes
    through the `mp` jit argument, so the traced step depends only on
    (gen_cfg, fdc, bundle anchors) — the cache key. A repeat call with the
    same config (the warm benchmark run, or re-running the same prompt)
    reuses the jitted callables and skips the full Python retrace of
    synthesis + CLIP + ArcFace fwd+bwd — tens of seconds on slow hosts
    (DirectionEngine gives prompt sweeps the same property via runtime
    text anchors; this covers repeat same-prompt invocations).
    Small FIFO bound: entries pin their XLA executables.
    """
    key = (repr(gen_cfg), repr(fdc), _bundles_fingerprint(bundles),
           has_mobilenet)
    hit = _FUSED_CACHE.get(key)
    if hit is not None:
        return hit

    optimizer = optax.inject_hyperparams(optax.sgd)(
        learning_rate=fdc.learning_rate)
    # weights route via `mp` on every call path below; the closure
    # fallbacks are intentionally None so accidental use fails loudly
    # (and no stale param pytree is pinned by the cache)
    loss_fn = make_loss_fn(None, gen_cfg, bundles, None, fdc)

    # ONE dispatch per step: the batch gather (idx) and the cosine-LR
    # update ride inside the jit. Separate eager gathers + a host-side
    # hyperparam set cost ~4 extra device round-trips per step on
    # high-latency (tunneled) links.
    @jax.jit
    def _step(delta_s, opt_state, idx, lr, all_s, all_id, all_clip, mp):
        opt_state = opt_state._replace(
            hyperparams=dict(opt_state.hyperparams, learning_rate=lr))
        styles = jnp.take(all_s, idx, axis=0)
        id_f = jnp.take(all_id, idx, axis=0)
        clip_f = tuple(jnp.take(c, idx, axis=0) for c in all_clip)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            delta_s, styles, id_f, clip_f, mp)
        updates, opt_state = optimizer.update(grads, opt_state, delta_s)
        delta_s = optax.apply_updates(delta_s, updates)
        grad_norm = jnp.linalg.norm(grads.reshape(-1))
        return delta_s, opt_state, loss, aux, grad_norm, styles

    # mesh path keeps the pre-gathered signature: the batch is indexed
    # on host and device_put with a NamedSharding before the call
    @jax.jit
    def _step_batch(delta_s, opt_state, styles, id_f, clip_f, mp):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            delta_s, styles, id_f, clip_f, mp)
        updates, opt_state = optimizer.update(grads, opt_state, delta_s)
        delta_s = optax.apply_updates(delta_s, updates)
        grad_norm = jnp.linalg.norm(grads.reshape(-1))
        return delta_s, opt_state, loss, aux, grad_norm

    # lax.scan over K steps → ONE dispatch per K steps (steps_per_dispatch).
    # The body is the same value_and_grad + optimizer.update graph as _step,
    # so numerics match the unrolled loop; lrs are host-computed per step
    # (float64 cosine, as in the unrolled path) and fed in as scan inputs.
    @jax.jit
    def multi_step(delta_s, opt_state, styles_k, id_k, clip_k, lrs, mp):
        def body(carry, xs):
            d, os = carry
            styles, id_f, clip_f, lr = xs
            os = os._replace(
                hyperparams=dict(os.hyperparams, learning_rate=lr))
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(d, styles, id_f, clip_f, mp)
            updates, os = optimizer.update(grads, os, d)
            d = optax.apply_updates(d, updates)
            gn = jnp.linalg.norm(grads.reshape(-1))
            # per-step Δs snapshot (tiny: 8×512 floats) so callbacks
            # inside the chunk see the direction as of THEIR step
            return (d, os), (loss, aux, gn, d)
        (delta_s, opt_state), (losses, auxs, gns, deltas) = jax.lax.scan(
            body, (delta_s, opt_state), (styles_k, id_k, clip_k, lrs))
        return delta_s, opt_state, losses, auxs, gns, deltas

    entry = _FusedGraphs(optimizer, _step, _step_batch, multi_step)
    if len(_FUSED_CACHE) >= _FUSED_CACHE_MAX:
        _FUSED_CACHE.pop(next(iter(_FUSED_CACHE)))
    _FUSED_CACHE[key] = entry
    return entry


def find_direction(gen_params, gen_cfg: GeneratorConfig, styles_array,
                   clip_models: Dict[str, Tuple], arcface_params,
                   fdc: FindDirectionConfig,
                   tokenizer=None,
                   mesh: Optional[jax.sharding.Mesh] = None,
                   resume_direction: Optional[np.ndarray] = None,
                   callback: Optional[Callable] = None,
                   landmarks_metric_fn: Optional[Callable] = None,
                   landmarker=None):
    """Run the full optimization. Returns styles_direction [1, 26, 512].

    styles_array: [n_items, 26, 512]; clip_models: {'ViT-B/32': (cfg, params)}.
    callback(iteration, loss, aux, lr, grad_norm, direction) every 10 iters.
    landmarker (cv.landmarks.Landmarker) is required when
    fdc.landmarks_in_graph — see that flag's docstring.
    """
    styles_array = jnp.asarray(styles_array, jnp.float32)
    n_items = styles_array.shape[0]
    bundles = make_clip_bundles(fdc, clip_models, tokenizer)

    id_feats_orig_all, clip_feats_orig_all = precompute_original_features(
        gen_params, gen_cfg, styles_array, bundles, arcface_params, fdc)

    mobilenet_params = None
    if fdc.landmarks_in_graph:
        assert not fdc.split_step, \
            "landmarks_in_graph is not supported with split_step"
        assert landmarker is not None, \
            "landmarks_in_graph needs a landmarker (MTCNN+MobileNet weights)"
        boxes_all, lm_orig_all = prepare_landmarks_refs(
            gen_params, gen_cfg, styles_array, fdc, landmarker)
        clip_feats_orig_all = tuple(clip_feats_orig_all) + (boxes_all,
                                                            lm_orig_all)
        mobilenet_params = landmarker._params

    if resume_direction is not None:
        delta_s = jnp.asarray(resume_direction, jnp.float32)[:, TRAINABLE]
    else:
        # Tiny non-zero init: breaks the degenerate edited==original start
        # (the reference inits at exactly zero — find_direction.py:270 — and
        # relies on CUDA noise to leave the 0/0 point; deterministic TPU
        # must not). Documented deviation; scale is negligible vs trained
        # direction magnitudes.
        delta_s = jax.random.normal(
            jax.random.PRNGKey(fdc.seed),
            (1, len(TRAINABLE), STYLE_DIM), jnp.float32) * 1e-3

    num_batches = math.ceil(n_items / fdc.batch_size)
    total_iterations = num_batches * fdc.n_epochs

    data_sharding = None
    if mesh is not None:
        data_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))

    multi_step = None
    if fdc.split_step:
        optimizer = optax.inject_hyperparams(optax.sgd)(
            learning_rate=fdc.learning_rate)
        step = _make_split_step(gen_params, gen_cfg, bundles, arcface_params,
                                fdc, optimizer)
        if fdc.steps_per_dispatch > 1:
            import warnings
            warnings.warn(
                "steps_per_dispatch > 1 is ignored when split_step=True "
                "(split_step bounds per-graph compile size; a K-step scan "
                "would undo that) — running per-step dispatch", stacklevel=2)
    else:
        model_params = {"gen": gen_params, "arc": arcface_params,
                        "clip": [b.params for b in bundles]}
        if mobilenet_params is not None:
            model_params["mobilenet"] = mobilenet_params

        graphs = _fused_step_graphs(gen_cfg, fdc, bundles,
                                    mobilenet_params is not None)
        optimizer = graphs.optimizer

        def step_idx(delta_s, opt_state, idx, lr):
            return graphs.step(delta_s, opt_state,
                               jnp.asarray(idx, jnp.int32), jnp.float32(lr),
                               styles_array, id_feats_orig_all,
                               clip_feats_orig_all, model_params)

        def step(delta_s, opt_state, styles, id_f, clip_f):
            return graphs.step_batch(delta_s, opt_state, styles, id_f,
                                     clip_f, model_params)

        if fdc.steps_per_dispatch > 1:
            multi_step = graphs.multi_step

    opt_state = optimizer.init(delta_s)

    rng = np.random.RandomState(fdc.seed)
    cur_iteration = 0
    t0 = time.time()
    first_step_done = None
    first_chunk_steps = 1   # steps covered by the first timing drain
    history = []

    def fire_callback(it, loss_s, aux_s, lr, gn_s, styles_last, delta):
        aux_out = {k: float(v) for k, v in aux_s.items()}
        # Landmarks metric: zero-gradient in the reference (no_grad +
        # PIL round-trip, find_direction.py:90-141) — reproduced as a
        # host-side logging-only term when a landmarker is supplied.
        if landmarks_metric_fn is not None and fdc.landmarks_loss_coef != 0:
            aux_out["landmarks_loss"] = fdc.landmarks_loss_coef * \
                float(landmarks_metric_fn(
                    assemble_direction(delta), styles_last))
        else:
            aux_out.setdefault("landmarks_loss", 0.0)
        callback(it, float(loss_s), aux_out, lr, float(gn_s),
                 assemble_direction(delta))

    if multi_step is not None:
        K = fdc.steps_per_dispatch
        chunk_sharding = None
        if mesh is not None:
            chunk_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, "data"))
        while cur_iteration < total_iterations:
            k = min(K, total_iterations - cur_iteration)
            iters = np.arange(cur_iteration + 1, cur_iteration + k + 1)
            lrs = np.asarray([schedule_lr(fdc, int(i), total_iterations)
                              for i in iters], np.float32)
            # one rng draw per step — identical stream to the unrolled loop
            idx = np.stack([rng.randint(0, n_items, size=fdc.batch_size)
                            for _ in range(k)])
            styles_k = styles_array[idx]
            id_k = id_feats_orig_all[idx]
            clip_k = tuple(c[idx] for c in clip_feats_orig_all)
            if chunk_sharding is not None:
                styles_k = jax.device_put(styles_k, chunk_sharding)
                id_k = jax.device_put(id_k, chunk_sharding)
                clip_k = tuple(jax.device_put(c, chunk_sharding)
                               for c in clip_k)

            delta_s, opt_state, losses, auxs, gns, deltas = multi_step(
                delta_s, opt_state, styles_k, id_k, clip_k,
                jnp.asarray(lrs), model_params)

            start = cur_iteration
            cur_iteration += k
            if first_step_done is None:
                # drain the first CHUNK: separates the one-time per-call
                # cost (trace + executable load) from steady-state chunks,
                # mirroring the unrolled path's first-step drain
                jax.block_until_ready(losses)
                first_step_done = time.time()
                first_chunk_steps = k
            history.append(losses)
            if callback is not None:
                # same cadence as the unrolled loop: every multiple of 10
                # covered by this chunk (plus the final iteration), each
                # with its own step's scan outputs
                for j in range(k):
                    it = start + j + 1
                    if it % 10 == 0 or it == total_iterations:
                        fire_callback(it, losses[j],
                                      {kk: v[j] for kk, v in auxs.items()},
                                      float(lrs[j]), gns[j], styles_k[j],
                                      deltas[j])
    else:
        fused = not fdc.split_step and data_sharding is None
        for epoch in range(fdc.n_epochs):
            for _ in range(num_batches):
                cur_iteration += 1
                lr = schedule_lr(fdc, cur_iteration, total_iterations)
                idx = rng.randint(0, n_items, size=fdc.batch_size)

                if fused:
                    # single dispatch: gather + LR update inside the jit
                    delta_s, opt_state, loss, aux, grad_norm, styles = \
                        step_idx(delta_s, opt_state, idx, lr)
                else:
                    opt_state.hyperparams["learning_rate"] = jnp.asarray(
                        lr, jnp.float32)
                    styles = styles_array[idx]
                    id_f = id_feats_orig_all[idx]
                    clip_f = tuple(c[idx] for c in clip_feats_orig_all)
                    if data_sharding is not None:
                        styles = jax.device_put(styles, data_sharding)
                        id_f = jax.device_put(id_f, data_sharding)
                        clip_f = tuple(jax.device_put(c, data_sharding)
                                       for c in clip_f)
                    delta_s, opt_state, loss, aux, grad_norm = step(
                        delta_s, opt_state, styles, id_f, clip_f)

                if cur_iteration == 1:
                    # drain once: separates the one-time per-call cost
                    # (tracing + compile/cache-load of the step graph) from
                    # steady-state step time in the reported timings
                    float(loss)
                    first_step_done = time.time()  # noqa: F841 (read at return)

                if callback is not None and (
                        cur_iteration % 10 == 0
                        or cur_iteration == total_iterations):
                    fire_callback(cur_iteration, loss, aux, lr, grad_norm,
                                  styles, delta_s)
                # keep the loss on-device; float() forces a sync per step
                history.append(loss)

    direction = assemble_direction(delta_s)
    # drain BEFORE stopping the clock: block_until_ready can be launch-bound
    # on some runtimes; materializing the loss history forces completion of
    # every step
    flat_history = np.concatenate(
        [np.atleast_1d(np.asarray(h)) for h in history]) if history else \
        np.zeros((0,), np.float32)
    jax.block_until_ready(direction)
    elapsed = time.time() - t0
    info = {"history": [float(x) for x in flat_history],
            "time": elapsed, "iterations": cur_iteration}
    fcs = first_chunk_steps
    if first_step_done is not None and cur_iteration > fcs:
        first_done = first_step_done
        # one-time cost (trace + compile/cache-load) vs steady-state steps
        # (the first drain covers fcs steps: 1 unrolled, k on the
        # steps_per_dispatch scan path)
        info["first_step_time"] = first_done - t0
        info["steady_ms_per_step"] = (
            1e3 * (elapsed - (first_done - t0)) / (cur_iteration - fcs))
    return direction, info


def assemble_direction(delta_s) -> jnp.ndarray:
    """[1, 8, 512] trainable rows → full [1, 26, 512] direction."""
    direction = jnp.zeros((1, N_STYLE_CHANNELS, STYLE_DIM), jnp.float32)
    return direction.at[:, TRAINABLE].set(delta_s)


def make_landmarks_metric_fn(gen_params, gen_cfg: GeneratorConfig,
                             fdc: FindDirectionConfig, landmarker):
    """Build the host-side landmarks metric (reference
    compute_landmarks_loss, find_direction.py:125-145): render the original
    and edited batches, detect 68-point landmarks (MTCNN → MobileNet), MSE
    over the non-jawline points. Zero when any face is undetected, matching
    the reference's bare-except fallbacks."""
    from ..losses.landmarks_loss import landmarks_loss

    until_k = until_k_for_resolution(fdc.resolution)

    _render_u8 = _render_u8_graph(gen_cfg, until_k, fdc.noise_mode)

    def render(styles):
        return np.asarray(_render_u8(gen_params, styles))

    def metric(direction, styles):
        orig_u8 = render(styles)
        edit_u8 = render(styles + direction)
        lm1 = landmarker.detect_batch(list(orig_u8))
        if lm1 is None:
            return 0.0
        lm2 = landmarker.detect_batch(list(edit_u8))
        if lm2 is None:
            lm2 = lm1
        return float(landmarks_loss(jnp.asarray(lm1), jnp.asarray(lm2)))

    return metric


class DirectionEngine:
    """Prompt-sweep direction optimizer: build the jitted step ONCE, swap
    prompts as runtime arguments.

    A fresh `find_direction` call pays a large one-time cost per invocation
    (tracing + compile-cache load of the monolithic step graph — tens of
    seconds on remote-compile toolchains) because its jits are rebuilt each
    call. The engine holds the traced step across calls and routes the
    prompt-derived CLIP text anchors as arguments, so a sweep over N prompts
    (the male2female.ipynb workflow trains several attribute directions)
    pays the cost once and runs every subsequent prompt at steady-state
    step time. Numerics are identical to `find_direction` (tested).

    Usage:
        eng = DirectionEngine(params, cfg, styles, clip_models, arcface, fdc)
        d1, info1 = eng.optimize("a face with a big smile")
        d2, info2 = eng.optimize("an old face")   # no retrace/recompile
    """

    def __init__(self, gen_params, gen_cfg: GeneratorConfig, styles_array,
                 clip_models: Dict[str, Tuple], arcface_params,
                 fdc: FindDirectionConfig, tokenizer=None):
        self.fdc = fdc
        self.tokenizer = tokenizer
        self.styles_array = jnp.asarray(styles_array, jnp.float32)
        self.n_items = self.styles_array.shape[0]

        # prompt-less bundles: cfg/params/weight only — anchors arrive at
        # optimize() time as step arguments
        if fdc.clip_type == "double":
            names_weights = [("ViT-B/32", 1.0), ("ViT-B/16", 0.5)]
        elif fdc.clip_type == "large":
            names_weights = [("ViT-B/16", 1.0)]
        else:
            names_weights = [("ViT-B/32", 1.0)]
        self.bundles = [CLIPBundle(cfg=clip_models[n][0],
                                   params=clip_models[n][1], weight=w)
                        for n, w in names_weights]
        self.clip_models = clip_models

        assert not fdc.landmarks_in_graph, \
            "DirectionEngine does not support landmarks_in_graph yet — " \
            "use find_direction()"
        if fdc.split_step or fdc.steps_per_dispatch > 1:
            import warnings
            warnings.warn(
                "DirectionEngine builds one fused step graph; "
                "split_step/steps_per_dispatch are ignored on the "
                "prompt-sweep path (use find_direction() if you need them "
                "to bound compile size or batch dispatches)", stacklevel=2)
        self.id_feats, self.clip_feats = precompute_original_features(
            gen_params, gen_cfg, self.styles_array, self.bundles,
            arcface_params, fdc)
        loss_fn = make_loss_fn(gen_params, gen_cfg, self.bundles,
                               arcface_params, fdc)
        self._loss_fn = loss_fn
        self._batched_step = None  # built lazily by optimize_batch
        self._batched_step_2d = None       # 2-axis (prompt, data) variant
        self._batched_step_2d_mesh = None
        self.optimizer = optax.inject_hyperparams(optax.sgd)(
            learning_rate=fdc.learning_rate)
        self.model_params = {"gen": gen_params, "arc": arcface_params,
                             "clip": [b.params for b in self.bundles]}

        optimizer = self.optimizer

        @jax.jit
        def _step(delta_s, opt_state, idx, lr, all_s, all_id, all_clip, mp,
                  text_dirs):
            opt_state = opt_state._replace(
                hyperparams=dict(opt_state.hyperparams, learning_rate=lr))
            styles = jnp.take(all_s, idx, axis=0)
            id_f = jnp.take(all_id, idx, axis=0)
            clip_f = tuple(jnp.take(c, idx, axis=0) for c in all_clip)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                delta_s, styles, id_f, clip_f, mp, text_dirs)
            updates, opt_state = optimizer.update(grads, opt_state, delta_s)
            delta_s = optax.apply_updates(delta_s, updates)
            return delta_s, opt_state, loss, aux

        self._step = _step

    def _text_dirs(self, text_prompt: str, negative_text_prompt: str):
        from ..models.clip import tokenize

        dirs = []
        for b in self.bundles:
            if self.fdc.clip_loss_type in ("nada", "nada_global"):
                a = NADATextAnchors.create(b.params, b.cfg,
                                           negative_text_prompt, text_prompt,
                                           tokenizer=self.tokenizer)
                dirs.append({"target_direction": a.target_direction,
                             "target_text_features": a.target_text_features})
            else:
                t_pos = jnp.asarray(tokenize([text_prompt],
                                             tokenizer=self.tokenizer))
                t_neg = jnp.asarray(tokenize([negative_text_prompt],
                                             tokenizer=self.tokenizer))
                dirs.append({"text_direction": make_text_direction(
                    b.params, b.cfg, t_pos, t_neg)})
        return tuple(dirs)

    def optimize(self, text_prompt: str,
                 negative_text_prompt: Optional[str] = None,
                 resume_direction: Optional[np.ndarray] = None,
                 callback: Optional[Callable] = None):
        """Returns (direction [1, 26, 512], info) — same contract as
        `find_direction`, same RNG stream (fdc.seed)."""
        fdc = self.fdc
        neg = negative_text_prompt if negative_text_prompt is not None \
            else fdc.negative_text_prompt
        text_dirs = self._text_dirs(text_prompt, neg)

        if resume_direction is not None:
            delta_s = jnp.asarray(resume_direction, jnp.float32)[:, TRAINABLE]
        else:
            delta_s = jax.random.normal(
                jax.random.PRNGKey(fdc.seed),
                (1, len(TRAINABLE), STYLE_DIM), jnp.float32) * 1e-3
        opt_state = self.optimizer.init(delta_s)

        num_batches = math.ceil(self.n_items / fdc.batch_size)
        total_iterations = num_batches * fdc.n_epochs
        rng = np.random.RandomState(fdc.seed)
        t0 = time.time()
        first_step_done = None
        history = []
        cur_iteration = 0
        for _ in range(fdc.n_epochs):
            for _ in range(num_batches):
                cur_iteration += 1
                lr = schedule_lr(fdc, cur_iteration, total_iterations)
                idx = rng.randint(0, self.n_items, size=fdc.batch_size)
                delta_s, opt_state, loss, aux = self._step(
                    delta_s, opt_state, jnp.asarray(idx, jnp.int32),
                    jnp.float32(lr), self.styles_array, self.id_feats,
                    self.clip_feats, self.model_params, text_dirs)
                if cur_iteration == 1:
                    float(loss)
                    first_step_done = time.time()
                if callback is not None and cur_iteration % 10 == 0:
                    callback(cur_iteration, float(loss),
                             {k: float(v) for k, v in aux.items()}, lr,
                             assemble_direction(delta_s))
                history.append(loss)

        direction = assemble_direction(delta_s)
        flat = [float(x) for x in np.asarray(jnp.stack(history))] \
            if history else []
        jax.block_until_ready(direction)
        elapsed = time.time() - t0
        info = {"history": flat, "time": elapsed,
                "iterations": cur_iteration}
        if first_step_done is not None and cur_iteration > 1:
            info["first_step_time"] = first_step_done - t0
            info["steady_ms_per_step"] = (
                1e3 * (elapsed - (first_step_done - t0))
                / (cur_iteration - 1))
        return direction, info

    def _ensure_batched_step(self, mesh=None):
        """jit(vmap(step)) over a leading PROMPT axis.

        Per-prompt work (delta, optimizer state, CLIP text anchors) maps over
        axis 0; the model params, style bank, cached original features, batch
        indices, and LR broadcast. Prompts are independent, so the vmapped
        graph has NO cross-prompt collectives — sharding the prompt axis over
        a mesh scales a direction zoo linearly across chips with zero ICI
        traffic (each device trains its own prompts against replicated
        weights).

        With a 2-axis ('prompt', 'data') mesh (`parallel.mesh.zoo_mesh`) the
        per-prompt image batch ADDITIONALLY shards over 'data':
        `spmd_axis_name="prompt"` stamps the vmapped dimension into every
        internal sharding annotation, and a `with_sharding_constraint` on the
        gathered batch rows pins them to P('prompt', 'data') — GSPMD then
        partitions the whole synthesis/CLIP/ArcFace tower both ways and
        inserts the grad psum over 'data' (delta is replicated along it).
        """
        two_axis = mesh is not None and "prompt" in mesh.axis_names
        if two_axis:
            if self._batched_step_2d_mesh is mesh:
                return self._batched_step_2d
        elif self._batched_step is not None:
            return self._batched_step
        loss_fn, optimizer = self._loss_fn, self.optimizer
        if two_axis:
            batch_sh = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data"))

        def one(delta_s, opt_state, text_dirs, idx, lr, all_s, all_id,
                all_clip, mp):
            opt_state = opt_state._replace(
                hyperparams=dict(opt_state.hyperparams, learning_rate=lr))
            styles = jnp.take(all_s, idx, axis=0)
            id_f = jnp.take(all_id, idx, axis=0)
            clip_f = tuple(jnp.take(c, idx, axis=0) for c in all_clip)
            if two_axis:
                styles, id_f, clip_f = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(x, batch_sh),
                    (styles, id_f, clip_f))
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                delta_s, styles, id_f, clip_f, mp, text_dirs)
            updates, opt_state = optimizer.update(grads, opt_state, delta_s)
            delta_s = optax.apply_updates(delta_s, updates)
            return delta_s, opt_state, loss, aux

        step = jax.jit(jax.vmap(
            one, in_axes=(0, 0, 0) + (None,) * 6,
            spmd_axis_name="prompt" if two_axis else None))
        if two_axis:
            self._batched_step_2d, self._batched_step_2d_mesh = step, mesh
        else:
            self._batched_step = step
        return step

    def optimize_batch(self, text_prompts: List[str],
                       negative_text_prompts: Optional[List[str]] = None,
                       mesh=None,
                       resume_directions: Optional[Sequence] = None,
                       callback: Optional[Callable] = None):
        """Train P directions SIMULTANEOUSLY in one vmapped graph.

        The serial `optimize()` sweep reuses one traced step but still runs
        the reference's batch-4 workload per prompt — far below MXU
        occupancy. Batching P prompts multiplies the effective synthesis /
        CLIP / ArcFace batch by P in the same dispatch (StyleGAN2's upper
        blocks are channel-thin; P×4 images fill the systolic array), so a
        direction zoo trains in ~the wall-clock of one direction until the
        chip saturates. Each prompt sees the SAME batch-index stream as a
        serial `optimize()` call (both draw RandomState(fdc.seed)), so
        results match the serial path per prompt.

        `mesh`: optional jax Mesh.
          * 1-axis: the prompt axis is sharded over its devices
            (len(text_prompts) must divide evenly); everything else
            replicates. No collectives are emitted (prompts are independent).
          * 2-axis ('prompt', 'data') (`parallel.mesh.zoo_mesh`): prompts
            shard over 'prompt' AND each prompt's image batch shards over
            'data' (fdc.batch_size must divide the 'data' size) — zoo
            task-parallelism composed with per-prompt data parallelism,
            the full-pod deployment shape.

        Returns (directions [P, 1, 26, 512], info) — info["history"] has
        shape [P, steps].
        """
        fdc = self.fdc
        P = len(text_prompts)
        if negative_text_prompts is None:
            negative_text_prompts = [fdc.negative_text_prompt] * P
        assert len(negative_text_prompts) == P

        # stack per-prompt anchors: tuple-of-dicts pytree, leading P axis
        per_prompt = [self._text_dirs(t, n)
                      for t, n in zip(text_prompts, negative_text_prompts)]
        text_dirs_b = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *per_prompt)

        # identical init to optimize(): every prompt starts from the same
        # PRNGKey(fdc.seed) draw; per-prompt resume_directions (None entries
        # keep the fresh init) mirror optimize()'s resume_direction
        delta0 = jax.random.normal(
            jax.random.PRNGKey(fdc.seed),
            (1, len(TRAINABLE), STYLE_DIM), jnp.float32) * 1e-3
        if resume_directions is not None:
            assert len(resume_directions) == P, (len(resume_directions), P)
            deltas = jnp.stack([
                delta0 if d is None
                else jnp.asarray(d, jnp.float32)[:, TRAINABLE]
                for d in resume_directions])
        else:
            deltas = jnp.broadcast_to(delta0, (P,) + delta0.shape)
        opt_states = jax.vmap(self.optimizer.init)(deltas)

        if mesh is not None:
            # prompt axis name: 'prompt' on a 2-axis zoo mesh, else the
            # single axis of a 1-axis mesh
            p_axis = "prompt" if "prompt" in mesh.axis_names \
                else mesh.axis_names[0]
            n_p = mesh.shape[p_axis]
            assert P % n_p == 0, f"{P} prompts over {n_p} '{p_axis}' shards"
            if "prompt" in mesh.axis_names and "data" in mesh.axis_names:
                assert fdc.batch_size % mesh.shape["data"] == 0, (
                    f"batch {fdc.batch_size} over {mesh.shape['data']} "
                    "'data' shards")
            deltas = jax.device_put(
                deltas, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(p_axis)))
            opt_states, text_dirs_b = jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec(
                            *((p_axis,) + (None,) * (x.ndim - 1))))),
                (opt_states, text_dirs_b))

        batched_step = self._ensure_batched_step(mesh)
        num_batches = math.ceil(self.n_items / fdc.batch_size)
        total_iterations = num_batches * fdc.n_epochs
        rng = np.random.RandomState(fdc.seed)
        t0 = time.time()
        first_step_done = None
        history = []
        cur_iteration = 0
        for _ in range(fdc.n_epochs):
            for _ in range(num_batches):
                cur_iteration += 1
                lr = schedule_lr(fdc, cur_iteration, total_iterations)
                idx = rng.randint(0, self.n_items, size=fdc.batch_size)
                deltas, opt_states, losses, auxs = batched_step(
                    deltas, opt_states, text_dirs_b,
                    jnp.asarray(idx, jnp.int32), jnp.float32(lr),
                    self.styles_array, self.id_feats, self.clip_feats,
                    self.model_params)
                if cur_iteration == 1:
                    jax.block_until_ready(losses)
                    first_step_done = time.time()
                if callback is not None and cur_iteration % 10 == 0:
                    callback(cur_iteration,
                             [float(x) for x in np.asarray(losses)],
                             {k: np.asarray(v) for k, v in auxs.items()}, lr,
                             np.stack([np.asarray(assemble_direction(d))
                                       for d in deltas]))
                history.append(losses)

        directions = jnp.stack([assemble_direction(d) for d in deltas])
        jax.block_until_ready(directions)
        elapsed = time.time() - t0
        hist = np.stack([np.asarray(h) for h in history], axis=1) \
            if history else np.zeros((P, 0), np.float32)
        info = {"history": hist, "time": elapsed,
                "iterations": cur_iteration, "prompts": list(text_prompts)}
        if first_step_done is not None and cur_iteration > 1:
            info["first_step_time"] = first_step_done - t0
            info["steady_ms_per_step"] = (
                1e3 * (elapsed - (first_step_done - t0))
                / (cur_iteration - 1))
        return directions, info
