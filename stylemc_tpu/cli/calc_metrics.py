"""Evaluate GAN metrics on a generator checkpoint.

CLI contract: the stylegan2-ada calc_metrics surface behind the registry in
/root/reference/metrics/metric_main.py (fid50k_full, kid50k_full,
pr50k3_full, ppl2_wend, is50k, ...). Dataset features come from an image
directory; the Inception detector loads from STYLEMC_INCEPTION (a
torchvision-layout state dict; pytorch-fid's pt_inception-2015-12-05
weights use those names) and the PPL LPIPS-VGG bundle from
STYLEMC_LPIPS_VGG.

Detector variants (--detector_variant, recorded in every result line):
  fid2015 (default) — the Inception-2015 TF graph the reference detector
      encodes (metric_utils.py:21-22): 1008-way logits, TF pooling quirks.
      Numbers are comparable to reference/stylegan2-ada-published FIDs when
      the ported Inception-2015 weights are supplied.
  tv — plain torchvision inception_v3; NOT comparable to reference FIDs.
"""

from __future__ import annotations

import json
import os

import click
import numpy as np


@click.command()
@click.option("--network", "network_pkl", required=True)
@click.option("--metrics", type=str, default="fid50k_full",
              help="comma-separated registered metric names")
@click.option("--data", "data_dir", type=str, default=None,
              help="real-image directory (required for FID/KID/PR)")
@click.option("--num_gen", type=int, default=50000)
@click.option("--batch", type=int, default=16)
@click.option("--inception", "inception_path", type=str, default=None)
@click.option("--detector_variant", type=click.Choice(["fid2015", "tv"]),
              default="fid2015",
              help="fid2015 = reference Inception-2015 TF graph "
                   "(FID comparable to the reference); tv = torchvision")
@click.option("--allow_random_init", is_flag=True, default=False)
@click.option("--data_parallel", is_flag=True, default=False,
              help="shard generator + detector feature extraction over all "
                   "local devices (1-axis data mesh; the TPU-native "
                   "equivalent of the reference's num_gpus rank striding)")
def main(network_pkl, metrics, data_dir, num_gen, batch, inception_path,
         detector_variant, allow_random_init, data_parallel):
    import jax
    import jax.numpy as jnp
    from ..io import load_generator, load_state_dict_numpy
    from ..metrics import MetricOptions, calc_metric, is_valid_metric
    from ..metrics.feature_stats import FeatureStats
    from ..metrics import inception as inc

    from ..models.stylegan2.generator import inference_cfg

    cfg, params = load_generator(network_pkl)
    cfg = inference_cfg(cfg)  # metric feature loops are forward-only

    inception_path = inception_path or os.environ.get("STYLEMC_INCEPTION")
    if inception_path and os.path.exists(inception_path):
        inc_params = inc.params_from_torch_state(
            load_state_dict_numpy(inception_path))
    elif allow_random_init:
        inc_params = inc.init_inception_params(jax.random.PRNGKey(0))
    else:
        raise FileNotFoundError(
            "set STYLEMC_INCEPTION to a torchvision inception_v3 state dict "
            "or pass --allow_random_init")

    _feat_jit = jax.jit(inc.inception_features,
                        static_argnames=("return_logits", "variant"))

    def features_fn(x):
        return _feat_jit(inc_params, x, variant=detector_variant)

    def probs_fn(x):
        return _feat_jit(inc_params, x, return_logits=True,
                         variant=detector_variant)

    def dataset_features_fn(opts, max_items, _probs=False):
        from ..data.images import make_dataset
        from PIL import Image
        assert data_dir, "--data is required for this metric"
        stats = FeatureStats(capture_all=True, capture_mean_cov=True,
                             max_items=max_items)
        paths = make_dataset(data_dir)
        fn = probs_fn if _probs else features_fn
        for lo in range(0, len(paths), batch):
            imgs = np.stack([
                np.asarray(Image.open(p).convert("RGB"), np.uint8)
                for p in paths[lo:lo + batch]])
            stats.append(np.asarray(fn(jnp.asarray(imgs))))
            if stats.is_full():
                break
        return stats

    lpips_params = None
    lpips_path = os.environ.get("STYLEMC_LPIPS_VGG")
    if lpips_path and os.path.exists(lpips_path):
        import pickle
        with open(lpips_path, "rb") as f:
            lpips_params = pickle.load(f)
    elif allow_random_init:
        from ..losses.lpips import init_lpips_params
        lpips_params = init_lpips_params(jax.random.PRNGKey(1), "vgg")

    mesh = None
    if data_parallel:
        from ..parallel.mesh import data_mesh
        mesh = data_mesh(max_size=batch)
        if mesh.devices.size <= 1:
            mesh = None
        else:
            print(f"data-parallel feature extraction over "
                  f"{mesh.devices.size} devices")

    opts = MetricOptions(
        gen_params=params, gen_cfg=cfg,
        inception_features_fn=features_fn, inception_probs_fn=probs_fn,
        dataset_features_fn=dataset_features_fn,
        lpips_params=lpips_params, num_gen=num_gen, batch_size=batch,
        mesh=mesh)

    for name in metrics.split(","):
        name = name.strip()
        assert is_valid_metric(name), f"unknown metric {name}"
        out = calc_metric(name, opts=opts)
        print(json.dumps({"metric": name, **out.results,
                          "detector": detector_variant,
                          "total_time": out.total_time}))


if __name__ == "__main__":
    main()
