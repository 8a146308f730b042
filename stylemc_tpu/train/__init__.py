from .find_direction import (
    FindDirectionConfig, find_direction, make_loss_fn, make_clip_bundles,
    precompute_original_features, cosine_lr, assemble_direction,
    until_k_for_resolution, make_landmarks_metric_fn,
)
from .latent_mapper import MapperTrainConfig, train_latent_mapper
from .coach import Coach, CoachOptions
from .ranger import ranger, lookahead, gradient_centralization

__all__ = [
    "FindDirectionConfig", "find_direction", "make_loss_fn",
    "make_clip_bundles", "precompute_original_features", "cosine_lr",
    "assemble_direction", "until_k_for_resolution",
    "make_landmarks_metric_fn",
    "MapperTrainConfig", "train_latent_mapper",
    "Coach", "CoachOptions",
    "ranger", "lookahead", "gradient_centralization",
]
