"""Batch face parsing to `parsings/` masks.

CLI contract: /root/reference/run_deeplab.py:136-167 — segment every image
in --dataset_root at 513², save class-index PNG masks (resized to
--resolution, NEAREST) under <dataset_root>/parsings/.
"""

from __future__ import annotations

import os

import click
import numpy as np


@click.command()
@click.option("--resolution", type=int, default=512,
              help="segmentation output size")
@click.option("--dataset_root", type=str, required=True,
              help="Folder with images")
@click.option("--ckpt", "ckpt_path", type=str, default=None,
              help="deeplab_model.pth (or set STYLEMC_DEEPLAB)")
def main(resolution, dataset_root, ckpt_path):
    from PIL import Image
    from ..models.deeplab import default_segmenter
    from ..data.images import make_dataset

    segmenter = default_segmenter(ckpt_path, resolution=resolution)
    paths = [p for p in make_dataset(dataset_root)
             if "parsings" not in p]
    outdir = os.path.join(dataset_root, "parsings")
    os.makedirs(outdir, exist_ok=True)
    for i, p in enumerate(paths):
        img = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        mask = segmenter.segment(img)
        name = os.path.splitext(os.path.basename(p))[0] + ".png"
        Image.fromarray(mask).save(os.path.join(outdir, name))
        if i % 50 == 0:
            print(f"{i}/{len(paths)}")
    print(f"saved {len(paths)} parsings to {outdir}")


if __name__ == "__main__":
    main()
