"""End-to-end CLI pipeline smoke: fabricated .pkl → generate_w →
w_s_converter → generate_fromS (direction + mapper paths), exercising the
reference's three inference CLIs (SURVEY.md §7 milestone 1)."""

import os

import numpy as np
import pytest
import jax
from click.testing import CliRunner

from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, N_STYLE_CHANNELS,
)
from test_pickle_loader import fabricate_pkl


@pytest.fixture(scope="module")
def pkl_path(tmp_path_factory):
    cfg = GeneratorConfig(img_resolution=32, channel_base=1024, channel_max=64,
                          mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    return fabricate_pkl(tmp_path_factory.mktemp("net"), cfg, params)


def test_full_pipeline(pkl_path, tmp_path):
    from stylemc_tpu.cli.generate_w import main as generate_w
    from stylemc_tpu.cli.w_s_converter import main as w_s_converter
    from stylemc_tpu.cli.generate_fromS import main as generate_fromS

    runner = CliRunner()
    w_file = os.path.join(str(tmp_path), "projected_w.npz")
    s_file = os.path.join(str(tmp_path), "input.npz")
    outdir = os.path.join(str(tmp_path), "out")

    r = runner.invoke(generate_w, ["--network", pkl_path, "--seeds", "1-4",
                                   "--trunc", "0.7", "--out_file", w_file],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    w = np.load(w_file)["w"]
    assert w.shape == (4, 8, 512)  # res 32 → num_ws 8

    r = runner.invoke(w_s_converter, ["--network", pkl_path,
                                      "--projected-w", w_file,
                                      "--out_file", s_file],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    s = np.load(s_file)["s"]
    assert s.shape == (4, N_STYLE_CHANNELS, 512)

    # save a small handmade direction under the expected filename
    os.makedirs(outdir, exist_ok=True)
    prompt = "test prompt"
    direction = np.zeros((1, N_STYLE_CHANNELS, 512), np.float32)
    direction[:, 2, :64] = 0.2
    np.savez(os.path.join(outdir, f"direction_{prompt.replace(' ', '_')}.npz"),
             s=direction)

    r = runner.invoke(generate_fromS,
                      ["--network", pkl_path, "--s_input", s_file,
                       "--outdir", outdir, "--text_prompt", prompt,
                       "--change_power", "2.0"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    outs = [f for f in os.listdir(outdir) if f.endswith(".jpeg")]
    assert len(outs) == 4
    from PIL import Image
    img = np.asarray(Image.open(os.path.join(outdir, sorted(outs)[0])))
    assert img.shape == (32, 64, 3)  # [orig | edited] side by side
    left, right = img[:, :32], img[:, 32:]
    assert np.abs(left.astype(int) - right.astype(int)).max() > 0


def test_generate_w_seed_stream_matches_reference_convention(pkl_path, tmp_path):
    # The z for seed k must be np.random.RandomState(k).randn(1, z_dim)
    # (reference generate_w.py:48) — verify via mapping determinism.
    from stylemc_tpu.cli.generate_w import main as generate_w
    runner = CliRunner()
    f1 = os.path.join(str(tmp_path), "a.npz")
    f2 = os.path.join(str(tmp_path), "b.npz")
    for f in (f1, f2):
        r = runner.invoke(generate_w, ["--network", pkl_path, "--seeds", "7",
                                       "--out_file", f], catch_exceptions=False)
        assert r.exit_code == 0, r.output
    np.testing.assert_array_equal(np.load(f1)["w"], np.load(f2)["w"])


def test_generate_fromS_projected_w_branch(pkl_path, tmp_path):
    from stylemc_tpu.cli.generate_w import main as generate_w
    from stylemc_tpu.cli.generate_fromS import main as generate_fromS
    runner = CliRunner()
    w_file = os.path.join(str(tmp_path), "w.npz")
    outdir = os.path.join(str(tmp_path), "proj_out")
    r = runner.invoke(generate_w, ["--network", pkl_path, "--seeds", "1,2",
                                   "--out_file", w_file], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    r = runner.invoke(generate_fromS,
                      ["--network", pkl_path, "--projected-w", w_file,
                       "--outdir", outdir, "--text_prompt", "x"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert sorted(os.listdir(outdir)) == ["proj00.png", "proj01.png"]


def test_legacy_cli_and_native_load(pkl_path, tmp_path):
    from stylemc_tpu.cli.legacy import main as legacy
    from stylemc_tpu.cli.generate_w import main as generate_w
    runner = CliRunner()
    out_npz = os.path.join(str(tmp_path), "converted.npz")
    r = runner.invoke(legacy, ["--source", pkl_path, "--dest", out_npz],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    # the converted .npz loads transparently as --network
    w_file = os.path.join(str(tmp_path), "w.npz")
    r = runner.invoke(generate_w, ["--network", out_npz, "--seeds", "3",
                                   "--out_file", w_file],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    # identical output to the .pkl path
    w_file2 = os.path.join(str(tmp_path), "w2.npz")
    r = runner.invoke(generate_w, ["--network", pkl_path, "--seeds", "3",
                                   "--out_file", w_file2],
                      catch_exceptions=False)
    np.testing.assert_array_equal(np.load(w_file)["w"], np.load(w_file2)["w"])


def test_compare_directions_cli(tmp_path):
    from stylemc_tpu.cli.compare_directions import main as compare
    import json
    a = np.zeros((1, 26, 512), np.float32)
    a[:, 2, :64] = 1.0
    b = a * 2.0            # same direction, different magnitude → cosine 1
    pa = os.path.join(str(tmp_path), "a.npz")
    pb = os.path.join(str(tmp_path), "b.npz")
    np.savez(pa, s=a)
    np.savez(pb, s=b)
    runner = CliRunner()
    r = runner.invoke(compare, [pa, pb], catch_exceptions=False)
    assert r.exit_code == 0
    out = json.loads(r.output.strip().split("\n")[-1])
    assert out["pass"] is True
    assert out["min_active_cosine"] == 1.0
    # orthogonal direction → fail
    c = np.zeros_like(a)
    c[:, 3, 64:128] = 1.0
    pc = os.path.join(str(tmp_path), "c.npz")
    np.savez(pc, s=c)
    r = runner.invoke(compare, [pa, pc], catch_exceptions=False)
    out = json.loads(r.output.strip().split("\n")[-1])
    assert out["pass"] is False


def test_power_sweep_video_mode(pkl_path, tmp_path):
    from stylemc_tpu.cli.generate_w import main as generate_w
    from stylemc_tpu.cli.w_s_converter import main as w_s_converter
    from stylemc_tpu.cli.generate_fromS import main as generate_fromS
    runner = CliRunner()
    w_file = os.path.join(str(tmp_path), "w.npz")
    s_file = os.path.join(str(tmp_path), "s.npz")
    outdir = os.path.join(str(tmp_path), "sweep_out")
    runner.invoke(generate_w, ["--network", pkl_path, "--seeds", "1",
                               "--out_file", w_file], catch_exceptions=False)
    runner.invoke(w_s_converter, ["--network", pkl_path, "--projected-w",
                                  w_file, "--out_file", s_file],
                  catch_exceptions=False)
    os.makedirs(outdir, exist_ok=True)
    d = np.zeros((1, 26, 512), np.float32)
    d[:, 2, :32] = 0.3
    np.savez(os.path.join(outdir, "direction_sweepy.npz"), s=d)
    r = runner.invoke(generate_fromS,
                      ["--network", pkl_path, "--s_input", s_file,
                       "--outdir", outdir, "--text_prompt", "sweepy",
                       "--power_sweep", "0:2:4"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    gifs = [f for f in os.listdir(outdir) if f.endswith(".gif")]
    assert len(gifs) == 1
    from PIL import Image
    gif = Image.open(os.path.join(outdir, gifs[0]))
    assert getattr(gif, "n_frames", 1) == 4
    # --from_video (reference README.md:53-56) = shorthand sweep 0→power
    outdir2 = os.path.join(str(tmp_path), "video_out")
    os.makedirs(outdir2, exist_ok=True)
    np.savez(os.path.join(outdir2, "direction_sweepy.npz"), s=d)
    r = runner.invoke(generate_fromS,
                      ["--network", pkl_path, "--s_input", s_file,
                       "--outdir", outdir2, "--text_prompt", "sweepy",
                       "--from_video", "--change_power", "2"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    gifs = [f for f in os.listdir(outdir2) if f.endswith(".gif")]
    assert len(gifs) == 1
    gif = Image.open(os.path.join(outdir2, gifs[0]))
    assert getattr(gif, "n_frames", 1) == 25


def test_all_clis_help():
    """Every registered CLI must import and render --help (catches broken
    imports / decorator signatures without running any model code)."""
    import importlib
    from click.testing import CliRunner

    names = ["generate_w", "w_s_converter", "find_direction",
             "train_latent_mapper", "generate_fromS", "run_deeplab",
             "align_faces", "warp_images", "infer_e4e", "train_e4e", "legacy",
             "calc_metrics", "calc_losses_on_images", "clip_filter",
             "compare_directions", "serve"]
    for name in names:
        mod = importlib.import_module(f"stylemc_tpu.cli.{name}")
        res = CliRunner().invoke(mod.main, ["--help"])
        assert res.exit_code == 0, f"{name}: {res.output}"


def test_warp_images_cli(tmp_path, monkeypatch):
    """warp_images splits [orig|edited] pairs, overlays landmarks on both
    halves, and appends the piecewise warp (reference warp_images.py body).
    The landmark pipeline is stubbed — its own parity tests live in
    test_cv.py / test_reference_parity.py."""
    from PIL import Image
    import stylemc_tpu.cli.warp_images as wi

    indir = os.path.join(str(tmp_path), "pairs")
    outdir = os.path.join(str(tmp_path), "warped")
    os.makedirs(indir)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 128, 3), np.uint8)).save(
        os.path.join(indir, "pair0.jpeg"))

    # Non-collinear FRACTIONAL landmarks (real detector output is float):
    # an 8x8 jittered grid plus corner-adjacent points, dst shifted so some
    # destination triangles spill past the image edge (bounds-clip path).
    gx, gy = np.meshgrid(np.linspace(8, 56, 8), np.linspace(8, 56, 8))
    lm = np.stack([gx.ravel(), gy.ravel()], 1)[:64]
    lm = np.concatenate([lm, [[4.3, 4.7], [59.2, 4.1], [4.6, 59.8],
                              [59.4, 59.1]]], 0)
    lm = lm + np.random.RandomState(1).uniform(-1.5, 1.5, lm.shape)
    dst = lm + [6.0, 3.0]

    class FakeLandmarker:
        def detect_batch(self, images):
            assert len(images) == 2
            assert images[0].shape == (64, 64, 3)
            return np.stack([lm, dst])

    monkeypatch.setattr("stylemc_tpu.cv.landmarks.default_landmarker",
                        lambda **kw: FakeLandmarker())
    r = CliRunner().invoke(wi.main, ["--indir", indir, "--outdir", outdir],
                           catch_exceptions=False)
    assert r.exit_code == 0, r.output
    out = np.asarray(Image.open(os.path.join(outdir, "pair0_warp.jpeg")))
    assert out.shape == (64, 192, 3)  # overlay | overlay | warp

    # The warp panel must actually move pixels: with every landmark shifted
    # +6px in x, the warped half differs from the raw left half on a large
    # fraction of pixels (this was a silent no-op before the float/int
    # triangle-vertex matching fix in cv/warp.py).
    left = np.asarray(
        Image.open(os.path.join(indir, "pair0.jpeg")).convert("RGB")
    )[:, :64]
    warp_panel = out[:, 128:]
    frac_diff = np.mean(
        np.abs(warp_panel.astype(int) - left.astype(int)).max(-1) > 8)
    assert frac_diff > 0.2, f"warp panel barely differs ({frac_diff:.3f})"


def test_find_direction_arg_validation(tmp_path):
    """The zoo/landmarks flag combinations that used to crash deep inside
    the run (IsADirectoryError / bare AssertionError) must fail fast as
    UsageErrors before any model loads."""
    from stylemc_tpu.cli.find_direction import main as fd

    runner = CliRunner()
    base = ["--network", "x.pkl", "--s_input", "s.npz",
            "--outdir", str(tmp_path), "--text_prompt", "a face"]

    r = runner.invoke(fd, base + ["--text_prompts", "a|b",
                                  "--landmarks_grad"])
    assert r.exit_code != 0
    assert "--landmarks_grad is not supported with --text_prompts" in r.output

    resume_dir = tmp_path / "zoo"
    resume_dir.mkdir()
    r = runner.invoke(fd, base + ["--resume", str(resume_dir)])
    assert r.exit_code != 0
    assert "requires --text_prompts --batch_prompts" in r.output

    r = runner.invoke(fd, base + ["--text_prompts", "a|b",
                                  "--resume", str(resume_dir)])
    assert r.exit_code != 0
    assert "requires --text_prompts --batch_prompts" in r.output

    r = runner.invoke(fd, base + ["--steps_per_dispatch", "fast"])
    assert r.exit_code != 0
    assert "must be an integer or 'epoch'" in r.output
