"""Latent-mapper training.

Behavioral contract: /root/reference/train_latent_mapper.py:43-209 — Adam
(betas 0.9/0.999) over the Mapper parameters, cosine LR, same loss stack as
find_direction (compute_loss is literally reused there), edited styles
styles2[:, TRAINABLE] += mapper(styles[:, TRAINABLE]), optional second
generator for domain transfer. Shares the TPU-first single-synthesis loss
graph from train.find_direction via its `edit_fn` hook.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mapper import mapper_apply, init_mapper_params
from ..models.stylegan2.generator import GeneratorConfig
from .find_direction import (
    FindDirectionConfig, TRAINABLE, cosine_lr, make_clip_bundles,
    make_loss_fn, precompute_original_features,
)


@dataclasses.dataclass
class MapperTrainConfig(FindDirectionConfig):
    """Reference CLI defaults (train_latent_mapper.py:43-70): Adam lr 5e-4,
    resolution 512, batch 2, 10 epochs, id 0.3, landmarks 0.0, l2 0.8,
    clip 2.0."""
    resolution: int = 512
    batch_size: int = 2
    learning_rate: float = 0.0005
    n_epochs: int = 10
    identity_loss_coef: float = 0.3
    landmarks_loss_coef: float = 0.0
    l2_reg_coef: float = 0.8
    clip_loss_coef: float = 2.0
    mapper_neg_slope: float = 0.01


def train_latent_mapper(gen_params, gen_cfg: GeneratorConfig, styles_array,
                        clip_models: Dict[str, Tuple], arcface_params,
                        mtc: MapperTrainConfig,
                        tokenizer=None,
                        mesh: Optional[jax.sharding.Mesh] = None,
                        gen2: Optional[Tuple] = None,
                        resume_params=None,
                        callback: Optional[Callable] = None,
                        landmarker=None):
    """Returns (mapper_params, info). `landmarker` enables
    mtc.landmarks_in_graph exactly as in find_direction()."""
    styles_array = jnp.asarray(styles_array, jnp.float32)
    n_items = styles_array.shape[0]
    bundles = make_clip_bundles(mtc, clip_models, tokenizer)

    id_feats_orig_all, clip_feats_orig_all = precompute_original_features(
        gen_params, gen_cfg, styles_array, bundles, arcface_params, mtc)

    mobilenet_params = None
    if mtc.landmarks_in_graph:
        from .find_direction import prepare_landmarks_refs

        assert landmarker is not None, \
            "landmarks_in_graph needs a landmarker (MTCNN+MobileNet weights)"
        boxes_all, lm_orig_all = prepare_landmarks_refs(
            gen_params, gen_cfg, styles_array, mtc, landmarker)
        clip_feats_orig_all = tuple(clip_feats_orig_all) + (boxes_all,
                                                            lm_orig_all)
        mobilenet_params = landmarker._params

    mapper_params = resume_params if resume_params is not None else \
        init_mapper_params(jax.random.PRNGKey(mtc.seed))

    def edit_fn(mp, styles):
        delta = mapper_apply(mp, styles[:, TRAINABLE], mtc.mapper_neg_slope)
        return styles.at[:, TRAINABLE].add(delta)

    loss_fn = make_loss_fn(gen_params, gen_cfg, bundles, arcface_params, mtc,
                           edit_fn=edit_fn, edit_gen=gen2,
                           mobilenet_params=mobilenet_params)

    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=mtc.learning_rate, b1=0.9, b2=0.999)
    opt_state = optimizer.init(mapper_params)

    num_batches = math.ceil(n_items / mtc.batch_size)
    total_iterations = num_batches * mtc.n_epochs

    data_sharding = None
    if mesh is not None:
        data_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))

    model_params = {"gen": gen2[0] if gen2 is not None else gen_params,
                    "arc": arcface_params,
                    "clip": [b.params for b in bundles]}
    if mobilenet_params is not None:
        model_params["mobilenet"] = mobilenet_params

    # ONE dispatch per step (cf. find_direction): batch gather + cosine-LR
    # update inside the jit; the mesh path keeps the pre-gathered signature.
    @jax.jit
    def _step_idx(mp, opt_state, idx, lr, all_s, all_id, all_clip, frozen):
        opt_state = opt_state._replace(
            hyperparams=dict(opt_state.hyperparams, learning_rate=lr))
        styles = jnp.take(all_s, idx, axis=0)
        id_f = jnp.take(all_id, idx, axis=0)
        clip_f = tuple(jnp.take(c, idx, axis=0) for c in all_clip)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            mp, styles, id_f, clip_f, frozen)
        updates, opt_state = optimizer.update(grads, opt_state, mp)
        mp = optax.apply_updates(mp, updates)
        grad_norm = sum(jnp.linalg.norm(g.reshape(-1))
                        for g in jax.tree_util.tree_leaves(grads))
        return mp, opt_state, loss, aux, grad_norm

    @jax.jit
    def _step(mp, opt_state, styles, id_f, clip_f, frozen):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            mp, styles, id_f, clip_f, frozen)
        updates, opt_state = optimizer.update(grads, opt_state, mp)
        mp = optax.apply_updates(mp, updates)
        grad_norm = sum(jnp.linalg.norm(g.reshape(-1))
                        for g in jax.tree_util.tree_leaves(grads))
        return mp, opt_state, loss, aux, grad_norm

    def step(mp, opt_state, styles, id_f, clip_f):
        return _step(mp, opt_state, styles, id_f, clip_f, model_params)

    rng = np.random.RandomState(mtc.seed)
    cur_iteration = 0
    t0 = time.time()
    history = []
    for epoch in range(mtc.n_epochs):
        for _ in range(num_batches):
            cur_iteration += 1
            lr = cosine_lr(mtc.learning_rate, cur_iteration, total_iterations)
            idx = rng.randint(0, n_items, size=mtc.batch_size)

            if data_sharding is None:
                mapper_params, opt_state, loss, aux, grad_norm = _step_idx(
                    mapper_params, opt_state, jnp.asarray(idx, jnp.int32),
                    jnp.float32(lr), styles_array, id_feats_orig_all,
                    clip_feats_orig_all, model_params)
                history.append(loss)
                if callback is not None and cur_iteration % 10 == 0:
                    callback(cur_iteration, float(loss),
                             {k: float(v) for k, v in aux.items()},
                             lr, float(grad_norm), mapper_params)
                continue

            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            styles = styles_array[idx]
            id_f = id_feats_orig_all[idx]
            clip_f = tuple(c[idx] for c in clip_feats_orig_all)
            styles = jax.device_put(styles, data_sharding)
            id_f = jax.device_put(id_f, data_sharding)
            clip_f = tuple(jax.device_put(c, data_sharding) for c in clip_f)

            mapper_params, opt_state, loss, aux, grad_norm = step(
                mapper_params, opt_state, styles, id_f, clip_f)

            if callback is not None and cur_iteration % 10 == 0:
                callback(cur_iteration, float(loss),
                         {k: float(v) for k, v in aux.items()},
                         lr, float(grad_norm), mapper_params)
            # keep the loss on-device; float() would force a sync per step
            history.append(loss)

    jax.block_until_ready(mapper_params)
    return mapper_params, {"history": [float(x) for x in history],
                           "time": time.time() - t0,
                           "iterations": cur_iteration}
