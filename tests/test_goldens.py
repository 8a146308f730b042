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

# Recorded on CPU (highest matmul precision), jax 0.9.0. Re-recorded after
# the mapping-init fix (weights stored as randn/lr_multiplier, matching ADA).
GOLDEN = {
    "ws_sum": 2194.871826171875,
    "s_sum": 502.3516845703125,
    "img_mean": -0.3184995651245117,
    "img_std": 1.0162326097488403,
    "img_corner": -0.18674805760383606,
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


def test_mapping_seeds_diverge_at_full_depth():
    """Regression: with 8 mapping layers at lr_multiplier=0.01, an init that
    omits the ADA 1/lr_multiplier weight storage attenuates z by 0.01^8 and
    every seed collapses to the same w (observed as 8 byte-identical 1024px
    renders). Distinct z must map to measurably distinct w."""
    cfg = GeneratorConfig(img_resolution=16, channel_base=512, channel_max=32,
                          mapping_layers=8)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    ws = mapping(params, cfg, z, truncation_psi=1.0)
    assert float(jnp.std(ws[0] - ws[1])) > 0.05
