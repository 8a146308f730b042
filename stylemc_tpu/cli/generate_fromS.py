"""Apply a saved S-space direction or mapper and render before/after pairs.

CLI contract: /root/reference/generate_fromS.py:38-209 — flags, file layouts
(direction_{prompt}.npz / mapper_{prompt}.pth under --outdir), whitelist/
stoplist masking, optional blending, optional second generator, and the
[orig | edited] horizontal-concat JPEG outputs named
{prompt}_{i:03d}.jpeg.
"""

from __future__ import annotations

import os
import time

import click
import numpy as np


@click.command()
@click.option("--network", "network_pkl", required=True,
              help="Network pickle filename (for original img)")
@click.option("--network2", "network2_pkl", required=False, default=None,
              help="Network2 pickle filename (for generation)")
@click.option("--noise-mode", type=click.Choice(["const", "random", "none"]),
              default="const", show_default=True)
@click.option("--projected-w", "projected_w", type=str, default=None,
              help="Render full G(w) per image instead of S-space editing")
@click.option("--s_input", type=str, default=None, help="Styles npz")
@click.option("--use_mapper", type=int, default=0)
@click.option("--n", type=int, default=99999, help="generate first n results")
@click.option("--outdir", type=str, required=True)
@click.option("--text_prompt", type=str, required=True)
@click.option("--change_power", type=float, default=2.0, show_default=True)
@click.option("--mapper_neg_slope", type=float, default=0.01)
@click.option("--use_blending", type=int, default=0)
@click.option("--use_whitelist", type=int, default=0)
@click.option("--power_sweep", type=str, default=None,
              help="'start:end:steps' — render a change_power sweep per item "
                   "and save an animated GIF (video mode)")
@click.option("--from_video", is_flag=True, default=False,
              help="Reference README video mode (README.md:53-56): animate "
                   "the manipulation steps 0 → change_power as a GIF "
                   "(shorthand for --power_sweep '0:<change_power>:25')")
@click.option("--batch", type=int, default=8,
              help="TPU batching for the non-blending path")
def main(network_pkl, network2_pkl, noise_mode, projected_w, s_input,
         use_mapper, n, outdir, text_prompt, change_power, mapper_neg_slope,
         use_blending, use_whitelist, power_sweep, from_video, batch):
    import jax.numpy as jnp
    from PIL import Image
    from ..io import load_generator, load_state_dict_numpy
    from ..models.stylegan2.generator import synthesis
    from ..models.mapper import params_from_torch_state
    from ..edit import (apply_edit_batch, apply_edit_item_with_blending,
                        mapper_direction, mapper_directions_batched,
                        to_uint8_hwc)

    from ..models.stylegan2.generator import inference_cfg

    print(f'Loading networks from "{network_pkl}"...')
    cfg, params = load_generator(network_pkl)
    cfg = inference_cfg(cfg)  # render-only CLI: fastest pure-forward impl
    gen2 = None
    if network2_pkl and network2_pkl != network_pkl:
        print(f'Loading networks from "{network2_pkl}"...')
        gen2 = tuple(reversed(load_generator(network2_pkl)))  # (params, cfg)
        gen2 = (gen2[0], inference_cfg(gen2[1]))
    os.makedirs(outdir, exist_ok=True)

    # Branch A: render directly from projected W (generate_fromS.py:89-102).
    if projected_w is not None:
        from ..models.stylegan2.generator import w_to_s
        ws = np.load(projected_w)["w"].astype(np.float32)
        styles = w_to_s(params, cfg, jnp.asarray(ws))
        imgs = synthesis(params, cfg, styles, noise_mode=noise_mode)
        for idx, img in enumerate(to_uint8_hwc(imgs)):
            Image.fromarray(img, "RGB").save(f"{outdir}/proj{idx:02d}.png")
        return

    t1 = time.time()
    styles = np.load(s_input)["s"][:n].astype(np.float32)
    styles = jnp.asarray(styles)
    print(f"loaded {len(styles)} styles")

    prompt_tag = text_prompt.replace(" ", "_")
    mapper_params = None
    global_direction = None
    if use_mapper:
        sd = load_state_dict_numpy(f"{outdir}/mapper_{prompt_tag}.pth")
        mapper_params = params_from_torch_state(sd)
    else:
        global_direction = jnp.asarray(
            np.load(f"{outdir}/direction_{prompt_tag}.npz")["s"].astype(np.float32))

    segmenter = None
    if use_blending:
        print("Using blending... Loading segmentation model")
        from ..models.deeplab import default_segmenter
        segmenter = default_segmenter()

    def direction_for(i):
        if mapper_params is not None:
            return mapper_direction(mapper_params, styles[i],
                                    neg_slope=mapper_neg_slope,
                                    use_whitelist=bool(use_whitelist))
        return global_direction

    n_items = styles.shape[0]

    if from_video and not power_sweep:
        power_sweep = f"0:{change_power}:25"
    if power_sweep:
        # video mode: change_power sweep rendered as animated GIFs
        start, end, steps = power_sweep.split(":")
        powers = np.linspace(float(start), float(end), int(steps))
        for i in range(n_items):
            d = direction_for(i)
            frames = []
            for p_w in powers:
                _, edited = apply_edit_batch(params, cfg, styles[i:i + 1], d,
                                             float(p_w),
                                             noise_mode=noise_mode, gen2=gen2)
                frames.append(Image.fromarray(to_uint8_hwc(edited)[0], "RGB"))
            gif = f"{outdir}/{prompt_tag}_{i:03d}_sweep.gif"
            frames[0].save(gif, save_all=True, append_images=frames[1:],
                           duration=120, loop=0)
        print(f"saved {n_items} sweep GIFs")
        print("time passed:", time.time() - t1)
        return

    if use_blending:
        for i in range(n_items):
            orig_u8, edited_u8 = apply_edit_item_with_blending(
                params, cfg, styles[i], direction_for(i), change_power,
                segmenter, text_prompt=text_prompt, noise_mode=noise_mode,
                gen2=gen2)
            Image.fromarray(np.concatenate([orig_u8, edited_u8], axis=1),
                            "RGB").save(f"{outdir}/{prompt_tag}_{i:03d}.jpeg",
                                        quality=95)
    else:
        for lo in range(0, n_items, batch):
            hi = min(lo + batch, n_items)
            chunk = styles[lo:hi]
            if mapper_params is not None:
                dirs = mapper_directions_batched(
                    mapper_params, chunk, neg_slope=mapper_neg_slope,
                    use_whitelist=bool(use_whitelist))
            else:
                dirs = global_direction
            orig, edited = apply_edit_batch(params, cfg, chunk, dirs,
                                            change_power,
                                            noise_mode=noise_mode, gen2=gen2)
            orig_u8, edited_u8 = to_uint8_hwc(orig), to_uint8_hwc(edited)
            for j in range(hi - lo):
                Image.fromarray(
                    np.concatenate([orig_u8[j], edited_u8[j]], axis=1),
                    "RGB").save(f"{outdir}/{prompt_tag}_{lo + j:03d}.jpeg",
                                quality=95)
    print("time passed:", time.time() - t1)


if __name__ == "__main__":
    main()
