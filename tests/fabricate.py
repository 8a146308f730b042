"""Checkpoint fabrication helpers shared by the loader/pipeline tests.

Builds checkpoints in the reference on-disk formats (NVIDIA persistence
.pkl via test_pickle_loader.fabricate_pkl; rosinality-layout e4e .pt here)
from OUR randomly initialized pytrees, so the import layer and the full CLI
pipeline can be exercised end-to-end from files without real weights.

The state-dict export maps now live in the package (stylemc_tpu/io/
export.py — they are a user-facing interop feature, not just test
plumbing); this module re-exports them for the tests and keeps the
random-init e4e fabrication wrapper.
"""

import numpy as np

from stylemc_tpu.io.export import (  # noqa: F401  (re-exported for tests)
    ada_to_rosinality_state,
    encoder_to_torch_state,
)


def fabricate_e4e_pt(path: str, stylegan_size: int = 32, seed: int = 0) -> str:
    """Write a rosinality-layout e4e checkpoint (e4e_ffhq_encode.pt format:
    state_dict with encoder./decoder. key-split + latent_avg + opts,
    reference psp.py:41-55) from randomly initialized pytrees."""
    import jax

    from stylemc_tpu.io.export import save_e4e_pt
    from stylemc_tpu.io.rosinality import config_for_rosinality
    from stylemc_tpu.models.e4e.encoders import init_encoder_params
    from stylemc_tpu.models.stylegan2.generator import init_generator_params

    enc = init_encoder_params(jax.random.PRNGKey(seed),
                              stylegan_size=stylegan_size)
    dec_cfg = config_for_rosinality(stylegan_size)
    dec_params = init_generator_params(jax.random.PRNGKey(seed + 1), dec_cfg)

    rng = np.random.RandomState(seed)
    latent_avg = rng.randn(512).astype(np.float32) * 0.1
    return save_e4e_pt(path, enc, dec_cfg, dec_params, latent_avg)
