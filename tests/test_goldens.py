"""Golden regression values: fixed-seed generator outputs recorded at commit
time. Catches silent numeric drift in the ops/generator stack (the parity
mechanism SURVEY.md §4 calls for, with self-recorded goldens standing in for
the PyTorch goldens until real checkpoints are available)."""

import jax
import jax.numpy as jnp
import numpy as np

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, mapping, w_to_s, synthesis,
)

# Recorded on CPU (highest matmul precision), jax 0.9.0 — see /tmp recipe in
# the commit introducing this file.
GOLDEN = {
    "ws_sum": 0.21948719024658203,
    "s_sum": 511.9989013671875,
    "img_mean": -0.2523880898952484,
    "img_std": 0.7794622778892517,
    "img_corner": -0.17554548382759094,
}


def test_generator_goldens():
    cfg = GeneratorConfig(img_resolution=16, channel_base=512, channel_max=32,
                          mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(42), cfg)
    z = jax.random.normal(jax.random.PRNGKey(7), (2, 512))
    ws = mapping(params, cfg, z, truncation_psi=0.7)
    s = w_to_s(params, cfg, ws)
    img = synthesis(params, cfg, s)

    np.testing.assert_allclose(float(jnp.sum(ws)), GOLDEN["ws_sum"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.sum(s)), GOLDEN["s_sum"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.mean(img)), GOLDEN["img_mean"],
                               rtol=1e-3)
    np.testing.assert_allclose(float(jnp.std(img)), GOLDEN["img_std"],
                               rtol=1e-3)
    np.testing.assert_allclose(float(img[0, 0, 0, 0]), GOLDEN["img_corner"],
                               rtol=1e-3)
