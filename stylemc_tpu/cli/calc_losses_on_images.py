"""LPIPS / L2 between two image directories.

CLI contract: /root/reference/encoder4editing/scripts/calc_losses_on_images.py
— pairwise reconstruction quality between ground-truth and generated dirs.
"""

from __future__ import annotations

import json
import os

import click
import numpy as np


@click.command()
@click.option("--mode", type=click.Choice(["lpips", "l2"]), default="lpips")
@click.option("--data_path", type=str, required=True, help="generated images")
@click.option("--gt_path", type=str, required=True, help="ground-truth images")
@click.option("--batch", type=int, default=4)
@click.option("--lpips_type", default="alex")
@click.option("--allow_random_init", is_flag=True, default=False)
def main(mode, data_path, gt_path, batch, lpips_type, allow_random_init):
    import jax
    import jax.numpy as jnp
    from ..data.images import make_dataset, load_image
    from ..losses.lpips import lpips_loss, init_lpips_params

    gen_paths = make_dataset(data_path)
    gt_by_name = {os.path.basename(p): p for p in make_dataset(gt_path)}
    pairs = [(p, gt_by_name[os.path.basename(p)]) for p in gen_paths
             if os.path.basename(p) in gt_by_name]
    print(f"{len(pairs)} matched pairs")

    lp = None
    if mode == "lpips":
        path = os.environ.get("STYLEMC_LPIPS_" + lpips_type.upper())
        if path and os.path.exists(path):
            import pickle
            with open(path, "rb") as f:
                lp = pickle.load(f)
        else:
            assert allow_random_init
            lp = init_lpips_params(jax.random.PRNGKey(0), lpips_type)

    @jax.jit
    def score(a, b):
        if mode == "l2":
            return jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
        return lpips_loss(lp, a, b, lpips_type)

    vals = []
    for lo in range(0, len(pairs), batch):
        chunk = pairs[lo:lo + batch]
        a = jnp.asarray(np.stack([load_image(p, 256) for p, _ in chunk]))
        b = jnp.asarray(np.stack([load_image(q, 256) for _, q in chunk]))
        v = np.asarray(score(a, b))
        vals.extend(np.atleast_1d(v).tolist())
    print(json.dumps({"mode": mode, "mean": float(np.mean(vals)),
                      "std": float(np.std(vals)), "n": len(vals)}))


if __name__ == "__main__":
    main()
