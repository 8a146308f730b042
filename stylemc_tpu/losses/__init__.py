from .clip_loss import make_text_direction, clip_directional_loss
from .clip_loss_nada import (
    NADATextAnchors, nada_loss, preprocess_nada, direction_loss,
    clip_directional_loss_nada, global_clip_loss, clip_angle_loss,
    cnn_feature_loss, imagenet_templates_small, compute_text_direction,
)
from .id_loss import id_loss, extract_feats
from .landmarks_loss import landmarks_loss, wing_loss

__all__ = [
    "make_text_direction", "clip_directional_loss",
    "NADATextAnchors", "nada_loss", "preprocess_nada", "direction_loss",
    "clip_directional_loss_nada", "global_clip_loss", "clip_angle_loss",
    "cnn_feature_loss", "imagenet_templates_small", "compute_text_direction",
    "id_loss", "extract_feats",
    "landmarks_loss", "wing_loss",
]
