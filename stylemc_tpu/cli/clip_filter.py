"""CLIP-based dataset filtering / balancing.

Pipeline contract: /root/reference/male2female.ipynb cells 7-10 — classify
generated images against attribute prompt pairs with CLIP (e.g. "a photo of
a man" vs "a photo of a woman"), keep items whose argmax matches the wanted
class, optionally balancing counts across classes. Operates on the
styles npz + rendered images produced by generate_fromS/generate_w.
"""

from __future__ import annotations

import os

import click
import numpy as np


@click.command()
@click.option("--images_dir", type=str, required=True)
@click.option("--s_input", type=str, default=None,
              help="styles npz to subset alongside the images")
@click.option("--prompts", type=str, required=True,
              help="'|'-separated class prompts, e.g. 'a photo of a man|a photo of a woman'")
@click.option("--keep_class", type=int, required=True,
              help="index of the prompt class to keep")
@click.option("--out_file", type=str, required=True,
              help="output npz (filtered styles + kept indices)")
@click.option("--batch", type=int, default=16)
@click.option("--allow_random_init", is_flag=True, default=False)
def main(images_dir, s_input, prompts, keep_class, out_file, batch,
         allow_random_init):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from ..models.clip import encode_image, encode_text, tokenize
    from ..models.clip.preprocess import resize_short_side, center_crop, clip_mean_std
    from ..utils.model_zoo import load_clip_models
    from ..data.images import make_dataset

    clip_models, tokenizer = load_clip_models(
        "small", allow_random_init=allow_random_init)
    cfg, params = clip_models["ViT-B/32"]

    prompt_list = [p.strip() for p in prompts.split("|")]
    tokens = jnp.asarray(tokenize(prompt_list, tokenizer=tokenizer))
    tf = encode_text(params, cfg, tokens)
    tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)

    @jax.jit
    def classify(x_u8):
        x = jnp.asarray(x_u8, jnp.float32).transpose(0, 3, 1, 2) / 255.0
        x = resize_short_side(x, cfg.image_resolution)
        x = center_crop(x, cfg.image_resolution)
        mean, std = clip_mean_std(x.dtype)
        f = encode_image(params, cfg, (x - mean) / std)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        return jnp.argmax(f @ tf.T, axis=-1)

    paths = make_dataset(images_dir)
    keep_idx = []
    for lo in range(0, len(paths), batch):
        chunk = paths[lo:lo + batch]
        imgs = np.stack([np.asarray(Image.open(p).convert("RGB"), np.uint8)
                         for p in chunk])
        pred = np.asarray(classify(jnp.asarray(imgs)))
        keep_idx.extend(lo + i for i in range(len(chunk))
                        if pred[i] == keep_class)
    print(f"kept {len(keep_idx)}/{len(paths)} images for class "
          f"{prompt_list[keep_class]!r}")

    out = {"indices": np.asarray(keep_idx, np.int64),
           "paths": np.asarray([paths[i] for i in keep_idx])}
    if s_input:
        styles = np.load(s_input)["s"]
        out["s"] = styles[np.asarray(keep_idx, np.int64)]
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    np.savez(out_file, **out)
    print(f"saved {out_file}")


if __name__ == "__main__":
    main()
