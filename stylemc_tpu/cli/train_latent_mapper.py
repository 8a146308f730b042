"""Train a per-image latent Mapper for a text prompt.

CLI contract: /root/reference/train_latent_mapper.py:43-209 (flags, defaults,
output: {outdir}/mapper_{prompt}.pth torch state dict, periodic
mapper_last.pth, console log format)."""

from __future__ import annotations

import os
import time

import click
import numpy as np


@click.command()
@click.option("--network", "network_pkl", required=True)
@click.option("--network2", "network2_pkl", required=False, default=None)
@click.option("--noise-mode", type=click.Choice(["const", "random", "none"]),
              default="const", show_default=True)
@click.option("--s_input", type=str, required=True)
@click.option("--outdir", type=str, required=True)
@click.option("--text_prompt", type=str, required=True,
              default="a photo of a face of a feminine woman with no makeup")
@click.option("--negative_text_prompt", type=str, required=False,
              default="a photo of a face of a masculine man")
@click.option("--clip_type", type=str, default="double", show_default=True)
@click.option("--clip_loss_type", type=str, default="default", show_default=True)
@click.option("--resolution", type=int, default=512, show_default=True)
@click.option("--batch_size", type=int, default=2, show_default=True)
@click.option("--learning_rate", type=float, default=0.0005, show_default=True)
@click.option("--n_epochs", type=int, default=10, show_default=True)
@click.option("--resume", type=str, default=None)
@click.option("--mapper_neg_slope", type=float, default=0.01, show_default=True)
@click.option("--identity_loss_coef", type=float, default=0.3, show_default=True)
@click.option("--landmarks_loss_coef", type=float, default=0.0, show_default=True)
@click.option("--l2_reg_coef", type=float, default=0.8, show_default=True)
@click.option("--clip_loss_coef", type=float, default=2.0, show_default=True)
@click.option("--arcface_weights", type=str, default=None)
@click.option("--allow_random_init", is_flag=True, default=False)
@click.option("--data_parallel/--no-data_parallel", default=True)
@click.option("--bf16", is_flag=True, default=False,
              help="bfloat16 synthesis on the top num_fp16_res blocks")
@click.option("--remat", is_flag=True, default=False,
              help="Rematerialize synthesis blocks in the backward pass "
                   "(jax.checkpoint) — the mapper default renders 512px, "
                   "where activation memory dominates")
def main(network_pkl, network2_pkl, noise_mode, s_input, outdir, text_prompt,
         negative_text_prompt, clip_type, clip_loss_type, resolution,
         batch_size, learning_rate, n_epochs, resume, mapper_neg_slope,
         identity_loss_coef, landmarks_loss_coef, l2_reg_coef, clip_loss_coef,
         arcface_weights, allow_random_init, data_parallel, bf16, remat):
    from ..io import load_generator, load_state_dict_numpy
    from ..models.mapper import params_from_torch_state, params_to_torch_state
    from ..train.latent_mapper import MapperTrainConfig, train_latent_mapper
    from ..utils.model_zoo import load_clip_models, load_arcface
    from ..parallel.mesh import data_mesh

    from ..utils.logging import RunLogger
    logger = RunLogger("stylegan2_latent_mapper", config=dict(
        text_prompt=text_prompt, negative_text_prompt=negative_text_prompt,
        resolution=resolution, batch_size=batch_size,
        learning_rate=learning_rate, n_epochs=n_epochs), outdir=outdir)

    print(f'Loading networks from "{network_pkl}"...')
    cfg, params = load_generator(network_pkl)
    if bf16 or remat:
        import dataclasses as _dc
        cfg = _dc.replace(
            cfg, remat=remat,
            low_precision_dtype="bfloat16" if bf16 else cfg.low_precision_dtype)
    gen2 = None
    if network2_pkl and network2_pkl != network_pkl:
        print("using 2 generators")
        c2, p2 = load_generator(network2_pkl)
        if bf16 or remat:
            import dataclasses as _dc
            c2 = _dc.replace(
                c2, remat=remat,
                low_precision_dtype="bfloat16" if bf16 else c2.low_precision_dtype)
        gen2 = (p2, c2)
    os.makedirs(outdir, exist_ok=True)

    mtc = MapperTrainConfig(
        text_prompt=text_prompt, negative_text_prompt=negative_text_prompt,
        resolution=resolution, batch_size=batch_size,
        learning_rate=learning_rate, n_epochs=n_epochs,
        identity_loss_coef=identity_loss_coef,
        landmarks_loss_coef=landmarks_loss_coef,
        l2_reg_coef=l2_reg_coef, clip_loss_coef=clip_loss_coef,
        clip_type=clip_type, clip_loss_type=clip_loss_type,
        noise_mode=noise_mode, mapper_neg_slope=mapper_neg_slope)

    clip_models, tokenizer = load_clip_models(
        mtc.clip_type, allow_random_init=allow_random_init)
    arcface_params = load_arcface(arcface_weights,
                                  allow_random_init=allow_random_init)

    styles_array = np.load(s_input)["s"].astype(np.float32)
    mesh = data_mesh(max_size=batch_size) if data_parallel else None

    resume_params = None
    if resume:
        resume_params = params_from_torch_state(load_state_dict_numpy(resume))
        print(f"Loaded mapper from {resume}")

    prompt_tag = text_prompt.replace(" ", "_")

    def save_mapper(mp, path):
        import torch
        torch.save({k: torch.from_numpy(np.array(v)) for k, v in
                    params_to_torch_state(mp).items()}, path)

    def callback(it, loss, aux, lr, grad_norm, mp):
        logger.log({"loss": loss, "lr": lr, "grad_norm": grad_norm, **aux},
                   step=it)
        print(f"Iteration {it}, gradient norm: {grad_norm:.4f}, lr {lr:.4f}")
        print(f"Total loss: {loss:.4f}, clip loss: {aux['clip_loss']:.4f}, "
              f"identity loss: {aux['identity_loss']:.4f}, "
              f"l2 loss: {aux['l2_loss']:.4f}")
        if it % 1000 == 990:
            save_mapper(mp, f"{outdir}/mapper_last.pth")

    t1 = time.time()
    mapper_params, info = train_latent_mapper(
        params, cfg, styles_array, clip_models, arcface_params, mtc,
        tokenizer=tokenizer, mesh=mesh, gen2=gen2,
        resume_params=resume_params, callback=callback)

    save_mapper(mapper_params, f"{outdir}/mapper_{prompt_tag}.pth")
    print("time passed:", time.time() - t1)
    logger.finish()


if __name__ == "__main__":
    main()
