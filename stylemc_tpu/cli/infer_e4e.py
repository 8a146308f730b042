"""Real-image → W+ inversion (the e4e infer entry point).

CLI contract: /root/reference/encoder4editing/infer.py:19-134 — load the
e4e checkpoint, (optionally) FFHQ-align each image, encode at 256², save
all latents to projected_w.npz (key 'w') for w_s_converter to consume.
"""

from __future__ import annotations

import os
import time

import click
import numpy as np


@click.command()
@click.option("--images_dir", type=str, required=True)
@click.option("--ckpt", "checkpoint_path", type=str, required=True,
              help="e4e checkpoint (e4e_ffhq_encode.pt)")
@click.option("--save_dir", type=str, default="encoder4editing")
@click.option("--align/--no-align", default=False,
              help="FFHQ-align faces before encoding (needs MTCNN weights)")
@click.option("--stylegan_size", type=int, default=1024)
@click.option("--batch", type=int, default=4)
@click.option("--save_images", is_flag=True, default=False,
              help="also save the inverted reconstructions "
                   "(scripts/inference.py parity)")
def main(images_dir, checkpoint_path, save_dir, align, stylegan_size, batch,
         save_images):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from ..models.e4e.psp import load_psp_from_checkpoint
    from ..data.images import make_dataset, load_image

    from ..models.stylegan2.generator import inference_cfg

    psp = load_psp_from_checkpoint(checkpoint_path, stylegan_size)
    # inversion is forward-only; decode with the fastest pure-forward impl
    import dataclasses
    psp = dataclasses.replace(psp,
                              decoder_cfg=inference_cfg(psp.decoder_cfg))
    paths = make_dataset(images_dir)
    print(f"inverting {len(paths)} images")
    os.makedirs(save_dir, exist_ok=True)

    import dataclasses as _dc

    def _encode(enc_params, x):
        return _dc.replace(psp, encoder_params=enc_params).encode(x)

    _encode_jit = jax.jit(_encode)

    def encode(x):
        return _encode_jit(psp.encoder_params, x)

    def _decode_u8(dec_params, codes):
        # one jit graph: decode + uint8 NHWC conversion ON DEVICE (4x fewer
        # host-link bytes than fetching fp32 NCHW, and no eager dispatch)
        from ..edit import to_u8_nhwc
        img = _dc.replace(psp, decoder_params=dec_params).decode(codes)
        return to_u8_nhwc(img)

    _decode_u8_jit = jax.jit(_decode_u8)

    latents = []
    t0 = time.time()
    for lo in range(0, len(paths), batch):
        chunk_paths = paths[lo:lo + batch]
        imgs = [load_image(p, 256) for p in chunk_paths]
        if align:
            from ..cv.align import align_face_file
            imgs = [np.asarray(align_face_file(p, output_size=256),
                               np.float32).transpose(2, 0, 1) / 127.5 - 1.0
                    for p in chunk_paths]
        x = jnp.asarray(np.stack(imgs))
        pad = 0
        if x.shape[0] < batch:
            pad = batch - x.shape[0]
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        codes = encode(x)
        latents.append(np.asarray(codes[:batch - pad]))
        if save_images:
            from PIL import Image
            imgs_dir = os.path.join(save_dir, "inversions")
            os.makedirs(imgs_dir, exist_ok=True)
            # decode the full (padded) batch — a static shape for the jit —
            # and drop the pad rows host-side
            recon_u8 = np.asarray(_decode_u8_jit(psp.decoder_params, codes))
            for k in range(len(chunk_paths)):
                name = os.path.basename(chunk_paths[k])
                Image.fromarray(recon_u8[k], "RGB").save(
                    os.path.join(imgs_dir, name))
        print(f"Inference took {time.time() - t0:.4f} seconds")
        t0 = time.time()

    w = np.concatenate(latents, axis=0)
    out = os.path.join(save_dir, "projected_w.npz")
    np.savez(out, w=w)
    print(f"saved {w.shape} to {out}")


if __name__ == "__main__":
    main()
