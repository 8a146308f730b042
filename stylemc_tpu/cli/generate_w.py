"""Sample W latents from seeds.

CLI contract: /root/reference/generate_w.py:23-51 — seeds → per-seed
np.random.RandomState(seed).randn(1, z_dim) → G.mapping with truncation →
npz {'w': [N, num_ws, 512]}. Seed-exact: the z values use the same numpy
RandomState stream as the reference.
"""

from __future__ import annotations

import click
import numpy as np

from ..io import load_generator
from ..models.stylegan2.generator import mapping_jit as mapping
from ..utils.misc import num_range


@click.command()
@click.option("--network", "network_pkl", required=True,
              help="Network pickle filename")
@click.option("--seeds", type=num_range, help="List of random seeds",
              required=True)
@click.option("--trunc", "truncation_psi", type=float, default=1.0,
              show_default=True, help="Truncation psi")
@click.option("--out_file", type=str, default="encoder4editing/projected_w.npz",
              help="out file path")
def main(network_pkl, seeds, truncation_psi, out_file):
    import jax.numpy as jnp
    import os

    print(f'Loading networks from "{network_pkl}"...')
    cfg, params = load_generator(network_pkl)

    zs = np.concatenate([np.random.RandomState(s).randn(1, cfg.z_dim)
                         for s in seeds]).astype(np.float32)
    ws = mapping(params, cfg, jnp.asarray(zs), truncation_psi=truncation_psi)
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    np.savez(out_file, w=np.asarray(ws))
    print(f"saved {ws.shape} to {out_file}")


if __name__ == "__main__":
    main()
