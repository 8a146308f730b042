"""Optimize a global S-space direction for a text prompt.

CLI contract: /root/reference/find_direction.py:203-353 (flags, defaults,
output layout: {outdir}/direction_{prompt}.npz with key 's', periodic
direction_last.npz, console logging format every 10 iterations).

Model weights: the generator comes from --network; CLIP weights resolve via
STYLEMC_CLIP_DIR (OpenAI .pt files), ArcFace via --arcface_weights or
STYLEMC_ARCFACE (model_ir_se50.pth). --allow_random_init substitutes random
weights for missing perception models (smoke tests only).
"""

from __future__ import annotations

import os
import time

import click
import numpy as np


def _resolve_zoo_resume(resume, prompts):
    """Per-prompt resume directions for --batch_prompts.

    `resume` may be a single .npz (reference semantics — every prompt
    resumes from it) or a directory: each prompt looks up
    direction_{tag}.npz, then direction_last_{tag}.npz; prompts with no
    file keep the fresh init. Returns None when nothing resolves.
    """
    if not resume:
        return None
    if os.path.isdir(resume):
        out = []
        for p in prompts:
            tag = p.replace(" ", "_")
            d = None
            for name in (f"direction_{tag}.npz", f"direction_last_{tag}.npz"):
                path = os.path.join(resume, name)
                if os.path.exists(path):
                    d = np.load(path)["s"].astype(np.float32)
                    print(f"Resuming {p!r} from {path}")
                    break
            out.append(d)
        return out if any(d is not None for d in out) else None
    d = np.load(resume)["s"].astype(np.float32)
    print(f"Resuming all {len(prompts)} prompts from {resume}")
    return [d] * len(prompts)


@click.command()
@click.option("--network", "network_pkl", required=True)
@click.option("--noise-mode", type=click.Choice(["const", "random", "none"]),
              default="const", show_default=True)
@click.option("--s_input", type=str, required=True)
@click.option("--outdir", type=str, required=True)
@click.option("--text_prompt", type=str, required=True,
              default="a photo of a face of a feminine woman with no makeup")
@click.option("--text_prompts", type=str, default=None,
              help="'|'-separated prompt sweep: the jitted step is built "
                   "ONCE (DirectionEngine) and every prompt after the first "
                   "runs at steady-state step time; one "
                   "direction_<prompt>.npz per prompt. Overrides "
                   "--text_prompt. Single-chip path (no --data_parallel).")
@click.option("--batch_prompts/--no-batch_prompts", default=False,
              show_default=True,
              help="With --text_prompts: train ALL prompts simultaneously "
                   "in one vmapped graph (P-fold effective batch per "
                   "dispatch; with --data_parallel the prompt axis shards "
                   "over the mesh, zero cross-chip collectives). Large "
                   "P × batch_size may need --remat or a smaller batch.")
@click.option("--negative_text_prompt", type=str, required=False,
              default="a photo of a face of a masculine man")
@click.option("--negative_text_prompts", type=str, default=None,
              help="With --text_prompts: '|'-separated per-prompt negative "
                   "anchors (must match the prompt count). Default: "
                   "--negative_text_prompt for every prompt.")
@click.option("--clip_type", type=str, default="double", show_default=True)
@click.option("--clip_loss_type", type=str, default="default", show_default=True)
@click.option("--resolution", type=int, default=256, show_default=True)
@click.option("--batch_size", type=int, default=4, show_default=True)
@click.option("--learning_rate", type=float, default=1.5, show_default=True)
@click.option("--n_epochs", type=int, default=4, show_default=True)
@click.option("--resume", type=str, default=None)
@click.option("--identity_loss_coef", type=float, default=0.6, show_default=True)
@click.option("--landmarks_loss_coef", type=float, default=25.0, show_default=True)
@click.option("--landmarks_grad", is_flag=True, default=False,
              help="BEYOND-REFERENCE: backpropagate the landmarks loss "
                   "(differentiable crop + MobileNet in the jit graph). "
                   "Default keeps reference parity: the term is "
                   "logging-only because the reference computes it under "
                   "no_grad. Requires MTCNN+MobileNet weights.")
@click.option("--l2_reg_coef", type=float, default=0.1, show_default=True)
@click.option("--clip_loss_coef", type=float, default=1.0, show_default=True)
@click.option("--arcface_weights", type=str, default=None)
@click.option("--allow_random_init", is_flag=True, default=False,
              help="Random-init missing perception weights (smoke test only)")
@click.option("--data_parallel/--no-data_parallel", default=True,
              help="Shard the batch over all local devices")
@click.option("--split_step", is_flag=True, default=False,
              help="Per-model jits chained via image cotangents (bounds "
                   "compile size on remote-TPU toolchains; same numerics)")
@click.option("--bf16", is_flag=True, default=False,
              help="bfloat16 synthesis on the top num_fp16_res blocks "
                   "(the reference's fp16 policy; ~1.5x step speed)")
@click.option("--perception_bf16", is_flag=True, default=False,
              help="Run CLIP/ArcFace in bfloat16 (the TPU analogue of the "
                   "reference's fp16 CLIP on CUDA)")
@click.option("--remat", is_flag=True, default=False,
              help="Rematerialize synthesis blocks in the backward pass "
                   "(jax.checkpoint) — fits 1024px / large batches in HBM "
                   "at the cost of one extra forward; identical numerics")
@click.option("--steps_per_dispatch", type=str, default="1",
              show_default=True,
              help="Batch K optimizer steps into one device dispatch "
                   "(lax.scan) — amortizes dispatch latency; same math. "
                   "'epoch' batches one full epoch per dispatch — the "
                   "measured knee, 1.6x faster warm on a tunneled chip "
                   "(docs/performance.md)")
@click.option("--trace_dir", type=str, default=None,
              help="Capture a jax.profiler trace of the optimization into "
                   "this directory (view in TensorBoard/Perfetto)")
def main(network_pkl, noise_mode, s_input, outdir, text_prompt, text_prompts,
         batch_prompts, negative_text_prompt, negative_text_prompts,
         clip_type, clip_loss_type, resolution,
         batch_size, learning_rate, n_epochs, resume, identity_loss_coef,
         landmarks_loss_coef, landmarks_grad, l2_reg_coef, clip_loss_coef, arcface_weights,
         allow_random_init, data_parallel, split_step, bf16,
         perception_bf16, remat, steps_per_dispatch, trace_dir):
    import contextlib

    from ..io import load_generator
    from ..train.find_direction import FindDirectionConfig, find_direction
    from ..utils.model_zoo import load_clip_models, load_arcface
    from ..utils.profiling import trace
    from ..parallel.mesh import data_mesh

    tracing = trace(trace_dir) if trace_dir else contextlib.nullcontext()

    from ..utils.logging import RunLogger
    logger = RunLogger("stylegan2_latent_mapper", config=dict(
        text_prompt=text_prompt, negative_text_prompt=negative_text_prompt,
        resolution=resolution, batch_size=batch_size,
        learning_rate=learning_rate, n_epochs=n_epochs), outdir=outdir)

    if negative_text_prompts and not text_prompts:
        raise click.BadParameter(
            "--negative_text_prompts requires --text_prompts")
    if negative_text_prompts and len(negative_text_prompts.split("|")) != \
            len(text_prompts.split("|")):
        raise click.BadParameter(
            "--negative_text_prompts count must match --text_prompts")
    if text_prompts and landmarks_grad:
        raise click.BadParameter(
            "--landmarks_grad is not supported with --text_prompts (the "
            "prompt-sweep DirectionEngine builds a fused step without the "
            "in-graph landmarks loss) — run per-prompt find_direction "
            "instead")
    if resume and os.path.isdir(resume) and not (text_prompts and
                                                 batch_prompts):
        raise click.BadParameter(
            "--resume as a directory (per-prompt direction_<tag>.npz "
            "lookup) requires --text_prompts --batch_prompts; pass a "
            "single .npz otherwise")
    if steps_per_dispatch != "epoch":
        try:
            steps_per_dispatch = int(steps_per_dispatch)
        except ValueError:
            raise click.BadParameter(
                "--steps_per_dispatch must be an integer or 'epoch'")

    print(f'Loading networks from "{network_pkl}"...')
    cfg, params = load_generator(network_pkl)
    if bf16 or remat:
        import dataclasses as _dc
        cfg = _dc.replace(
            cfg, remat=remat,
            low_precision_dtype="bfloat16" if bf16 else cfg.low_precision_dtype)
    os.makedirs(outdir, exist_ok=True)

    fdc = FindDirectionConfig(
        text_prompt=text_prompt, negative_text_prompt=negative_text_prompt,
        resolution=resolution, batch_size=batch_size,
        learning_rate=learning_rate, n_epochs=n_epochs,
        identity_loss_coef=identity_loss_coef,
        landmarks_loss_coef=landmarks_loss_coef,
        landmarks_in_graph=landmarks_grad,
        l2_reg_coef=l2_reg_coef, clip_loss_coef=clip_loss_coef,
        clip_type=clip_type, clip_loss_type=clip_loss_type,
        noise_mode=noise_mode, split_step=split_step,
        perception_dtype="bfloat16" if perception_bf16 else "float32",
        steps_per_dispatch=1 if steps_per_dispatch == "epoch"
        else steps_per_dispatch)

    clip_models, tokenizer = load_clip_models(
        fdc.clip_type, allow_random_init=allow_random_init)
    arcface_params = load_arcface(arcface_weights,
                                  allow_random_init=allow_random_init)

    styles_array = np.load(s_input)["s"].astype(np.float32)
    n_items = styles_array.shape[0]
    if steps_per_dispatch == "epoch":
        import dataclasses as _dc
        import math as _math
        fdc = _dc.replace(
            fdc, steps_per_dispatch=_math.ceil(n_items / batch_size))
        print(f"steps_per_dispatch=epoch -> {fdc.steps_per_dispatch} "
              f"steps per dispatch")

    mesh = data_mesh(max_size=batch_size) if data_parallel else None

    resume_direction = None
    if resume and not os.path.isdir(resume):
        resume_direction = np.load(resume)["s"].astype(np.float32)
        print(f"Loaded direction from {resume}")

    prompt_tag = text_prompt.replace(" ", "_")
    t1 = time.time()

    def callback(it, loss, aux, lr, grad_norm, direction):
        logger.log({"loss": loss, "lr": lr, "grad_norm": grad_norm, **aux},
                   step=it)
        print(f"Iteration {it}, gradient norm: {grad_norm:.4f}, lr {lr:.4f}")
        print(f"Total loss: {loss:.4f}, clip loss: {aux['clip_loss']:.4f}, "
              f"identity loss: {aux['identity_loss']:.4f}, "
              f"landmarks loss: {aux.get('landmarks_loss', 0.0):.4f}, "
              f"l2 loss: {aux['l2_loss']:.4f}")
        if it % 1000 == 990:
            np.savez(f"{outdir}/direction_last.npz", s=np.asarray(direction))

    # landmarks: logging-only metric (zero-gradient reference parity) or,
    # with --landmarks_grad, the in-graph differentiable loss
    landmarks_metric_fn = None
    landmarker = None
    if text_prompts and landmarks_loss_coef != 0:
        print("note: the landmarks metric is not computed on the "
              "--text_prompts sweep path (it is logging-only and carries "
              "no gradient; see --landmarks_grad)")
    elif landmarks_loss_coef != 0:
        try:
            from ..cv.landmarks import default_landmarker
            landmarker = default_landmarker()
            if not landmarks_grad:
                from ..train.find_direction import make_landmarks_metric_fn
                landmarks_metric_fn = make_landmarks_metric_fn(
                    params, cfg, fdc, landmarker)
        except FileNotFoundError:
            if landmarks_grad:
                raise
            print("landmark model weights unavailable — landmarks metric "
                  "reported as 0 (it carries no gradient either way)")

    if text_prompts:
        from ..train.find_direction import DirectionEngine

        engine = DirectionEngine(params, cfg, styles_array, clip_models,
                                 arcface_params, fdc, tokenizer=tokenizer)
        prompts = [p.strip() for p in text_prompts.split("|")]
        # count already validated at the top of main()
        negatives = [p.strip() for p in negative_text_prompts.split("|")] \
            if negative_text_prompts else None
        if batch_prompts:
            # best mesh for the zoo: prompt task-parallelism first, leftover
            # devices become per-prompt batch DP (2-axis zoo mesh)
            from ..parallel.mesh import best_zoo_mesh

            bmesh = best_zoo_mesh(len(prompts), batch_size) \
                if data_parallel else None

            def zoo_callback(it, losses, auxs, lr, dirs):
                logger.log({"loss_mean": float(np.mean(losses)), "lr": lr},
                           step=it)
                if it % 1000 == 990:
                    for p, pr in enumerate(prompts):
                        np.savez(f"{outdir}/direction_last_"
                                 f"{pr.replace(' ', '_')}.npz", s=dirs[p])

            with tracing:
                directions, info = engine.optimize_batch(
                    prompts, negative_text_prompts=negatives, mesh=bmesh,
                    resume_directions=_resolve_zoo_resume(resume, prompts),
                    callback=zoo_callback)
            for p, prompt in enumerate(prompts):
                tag = prompt.replace(" ", "_")
                np.savez(f"{outdir}/direction_{tag}.npz",
                         s=np.asarray(directions[p]))
            steady = info.get("steady_ms_per_step")
            print(f"{len(prompts)} prompts in one vmapped run: "
                  f"{info['time']:.1f} s"
                  + (f" ({steady:.0f} ms/step steady)" if steady else "")
                  + (f", mesh {dict(bmesh.shape)}"
                     if bmesh is not None else ""))
        else:
            for i, prompt in enumerate(prompts):
                tp = time.time()
                with tracing if i == 0 else contextlib.nullcontext():
                    direction, info = engine.optimize(
                        prompt,
                        negative_text_prompt=(negatives[i] if negatives
                                              else None),
                        resume_direction=resume_direction)
                tag = prompt.replace(" ", "_")
                np.savez(f"{outdir}/direction_{tag}.npz",
                         s=np.asarray(direction))
                steady = info.get("steady_ms_per_step")
                print(f"{prompt!r}: {time.time() - tp:.1f} s"
                      + (f" ({steady:.0f} ms/step steady)" if steady else ""))
        print("time passed:", time.time() - t1)
        logger.finish()
        return

    with tracing:
        direction, info = find_direction(
            params, cfg, styles_array, clip_models, arcface_params, fdc,
            tokenizer=tokenizer, mesh=mesh, resume_direction=resume_direction,
            callback=callback, landmarks_metric_fn=landmarks_metric_fn,
            landmarker=landmarker if landmarks_grad else None)

    np.savez(f"{outdir}/direction_{prompt_tag}.npz", s=np.asarray(direction))
    steady = info.get("steady_ms_per_step")
    if steady:
        print(f"steady step time: {steady:.0f} ms/step "
              f"(first step {info['first_step_time']:.1f} s: trace + "
              "compile/cache-load)")
    print("time passed:", time.time() - t1)
    logger.finish()


if __name__ == "__main__":
    main()
