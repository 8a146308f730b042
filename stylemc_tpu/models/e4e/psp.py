"""pSp wrapper: encoder + StyleGAN2 decoder + latent_avg offset.

Behavioral contract: /root/reference/encoder4editing/models/psp.py:18-100 —
encode to W+ codes, add latent_avg (start_from_latent_avg), optional
latent_mask/style-mixing injection, decode with input_is_latent=True
(per-layer w, mapping skipped), adaptive-pool the output to 256².
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..stylegan2.generator import GeneratorConfig, synthesis, w_to_s
from ...utils.image import adaptive_avg_pool2d
from .encoders import (encoder4editing, gradual_style_encoder,
                       backbone_encoder_into_w, style_count)


@dataclasses.dataclass
class PSPConfig:
    stylegan_size: int = 1024
    encoder_type: str = "Encoder4Editing"
    start_from_latent_avg: bool = True
    # custom encoder body layout [(in_c, depth, stride), ...]; None = the
    # reference IR-SE-50 (tests use a 4-block body — see encoders.py)
    encoder_layout: Optional[Any] = None


@dataclasses.dataclass
class PSP:
    cfg: PSPConfig
    encoder_params: Dict[str, Any]
    decoder_cfg: GeneratorConfig
    decoder_params: Dict[str, Any]
    latent_avg: Optional[jnp.ndarray] = None    # [S, 512] or None

    def encode(self, x, progressive_stage: int = 18):
        """x: [N,3,256,256] normalized to [-1,1] → W+ codes [N, S, 512]."""
        if self.cfg.encoder_type == "Encoder4Editing":
            codes = encoder4editing(self.encoder_params, x,
                                    self.cfg.stylegan_size, progressive_stage,
                                    layout=self.cfg.encoder_layout)
        elif self.cfg.encoder_type == "GradualStyleEncoder":
            codes = gradual_style_encoder(self.encoder_params, x,
                                          self.cfg.stylegan_size,
                                          layout=self.cfg.encoder_layout)
        elif self.cfg.encoder_type == "SingleStyleCodeEncoder":
            codes = backbone_encoder_into_w(self.encoder_params, x,
                                            self.cfg.stylegan_size,
                                            layout=self.cfg.encoder_layout)
        else:
            raise ValueError(self.cfg.encoder_type)
        if self.cfg.start_from_latent_avg and self.latent_avg is not None:
            codes = codes + self.latent_avg[None].astype(codes.dtype)
        return codes

    def decode(self, codes, resize: bool = True, noise_mode: str = "const"):
        """codes: W+ [N, S, 512] → images [N,3,256,256] (resize=True)."""
        styles = w_to_s(self.decoder_params, self.decoder_cfg, codes)
        images = synthesis(self.decoder_params, self.decoder_cfg, styles,
                           noise_mode=noise_mode)
        if resize and images.shape[-1] != 256:
            images = adaptive_avg_pool2d(images, 256, 256)
        return images

    def __call__(self, x, resize: bool = True, return_latents: bool = False,
                 latent_mask: Optional[List[int]] = None,
                 inject_latent=None, alpha: Optional[float] = None,
                 noise_mode: str = "const", progressive_stage: int = 18):
        codes = self.encode(x, progressive_stage)
        if latent_mask is not None:
            for i in latent_mask:
                if inject_latent is not None:
                    if alpha is not None:
                        mixed = alpha * inject_latent[:, i] + \
                            (1 - alpha) * codes[:, i]
                    else:
                        mixed = inject_latent[:, i]
                    codes = codes.at[:, i].set(mixed)
                else:
                    codes = codes.at[:, i].set(0.0)
        images = self.decode(codes, resize=resize, noise_mode=noise_mode)
        if return_latents:
            return images, codes
        return images


def load_psp_from_checkpoint(path: str, stylegan_size: int = 1024,
                             encoder_type: str = "Encoder4Editing") -> PSP:
    """Load an e4e checkpoint (e4e_ffhq_encode.pt layout: encoder.* /
    decoder.* key-split + latent_avg, psp.py:41-55)."""
    from ...io.torch_state import load_state_dict_numpy, strip_prefix
    from ...io.rosinality import generator_params_from_rosinality
    from .encoders import encoder_params_from_torch_state

    state = load_state_dict_numpy(path, key="state_dict")
    enc_state = strip_prefix(state, "encoder.")
    dec_state = strip_prefix(state, "decoder.")
    encoder_params = encoder_params_from_torch_state(enc_state, stylegan_size)
    dec_cfg, dec_params = generator_params_from_rosinality(dec_state,
                                                           stylegan_size)

    latent_avg = None
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if "latent_avg" in ckpt:
        latent_avg = jnp.asarray(ckpt["latent_avg"].float().numpy())
        if latent_avg.ndim == 1:
            latent_avg = jnp.repeat(latent_avg[None],
                                    style_count(stylegan_size), axis=0)

    return PSP(cfg=PSPConfig(stylegan_size=stylegan_size,
                             encoder_type=encoder_type),
               encoder_params=encoder_params,
               decoder_cfg=dec_cfg, decoder_params=dec_params,
               latent_avg=latent_avg)
