"""Convert W latents to packed S-space styles.

CLI contract: /root/reference/w_s_converter.py:26-82 — load w npz, split per
block (torgb reuses the next conv w), apply each block affine, save npz
{'s': [N, 26, 512]}. Here the affine application is the pure `w_to_s`
(no module surgery needed).
"""

from __future__ import annotations

import os

import click
import numpy as np


@click.command()
@click.option("--network", "network_pkl", required=True,
              help="Network pickle filename")
@click.option("--projected-w", "projected_w", type=str, required=True,
              help="Projection result file")
@click.option("--out_file", type=str, default="out/input.npz",
              help="out file path")
def main(network_pkl, projected_w, out_file):
    import jax.numpy as jnp
    from ..io import load_generator
    from ..models.stylegan2.generator import w_to_s_jit as w_to_s

    print(f'Loading networks from "{network_pkl}"...')
    cfg, params = load_generator(network_pkl)

    ws = np.load(projected_w)["w"].astype(np.float32)
    from ..utils.profiling import record_function
    with record_function("split_ws"):  # trace scope parity (w_s_converter.py:78)
        styles = w_to_s(params, cfg, jnp.asarray(ws))
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    np.savez(out_file, s=np.asarray(styles))
    print(f"saved {styles.shape} to {out_file}")


if __name__ == "__main__":
    main()
