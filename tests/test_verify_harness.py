"""End-to-end drive of the real-weights verification harness
(cli/verify_weights.py) on fabricated files — so the single command that
proves BASELINE parity the day real weights appear is itself proven now.

Fabricates every weight format the harness ingests (NVIDIA .pkl, e4e .pt,
OpenAI-namespace CLIP .pt + BPE gz, model_ir_se50.pth via the reference
torch Backbone, pytorch-fid inception .pth), runs the full command, and
checks the report: every check present, every check ok, exit code 0.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from fabricate import (fabricate_arcface_pth, fabricate_clip_dir,
                       fabricate_e4e_pt)
from test_pickle_loader import fabricate_pkl

from stylemc_tpu.models.stylegan2.generator import (GeneratorConfig,
                                                    init_generator_params)

RES = 32


@pytest.fixture(scope="module")
def weight_files(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("verify_weights"))
    cfg = GeneratorConfig(img_resolution=RES, channel_base=2048,
                          channel_max=64, mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    pkl = fabricate_pkl(d, cfg, params)

    import torch
    from test_inception_tv_oracle import _randomized

    minc = _randomized(seed=9)
    minc.fc = torch.nn.Linear(2048, 1008)
    inception = os.path.join(d, "pt_inception_fabricated.pth")
    torch.save(minc.state_dict(), inception)

    # TF1 legacy pickle (the one importer format the harness didn't cover
    # through r4 — VERDICT r4 item 6)
    import pickle

    from test_tf_legacy import (_install_fake_tflib, fabricate_tf_generator,
                                fabricate_tf_discriminator)
    from stylemc_tpu.models.stylegan2.discriminator import (
        init_discriminator_params)

    Network = _install_fake_tflib()
    tf_cfg = GeneratorConfig(img_resolution=RES, channel_base=2048,
                             channel_max=64, mapping_layers=2,
                             conv_clamp=None, num_fp16_res=0)
    tf_params = init_generator_params(jax.random.PRNGKey(4), tf_cfg)
    tf_G = fabricate_tf_generator(Network, tf_cfg, tf_params)
    tf_D = fabricate_tf_discriminator(
        Network, RES, init_discriminator_params(jax.random.PRNGKey(5),
                                                size=RES))
    tf_pkl = os.path.join(d, "tf_net.pkl")
    with open(tf_pkl, "wb") as f:
        pickle.dump((tf_G, tf_D, tf_G), f)

    return {
        "dir": d,
        "network": pkl,
        "tf_network": tf_pkl,
        "e4e": fabricate_e4e_pt(os.path.join(d, "e4e.pt"),
                                stylegan_size=RES),
        "clip_dir": fabricate_clip_dir(os.path.join(d, "clip"),
                                       resolution=64),
        "arcface": fabricate_arcface_pth(os.path.join(d, "ir_se50.pth")),
        "inception": inception,
    }


@pytest.mark.nightly
def test_verify_harness_end_to_end(weight_files):
    from click.testing import CliRunner

    from stylemc_tpu.cli.verify_weights import main as verify

    w = weight_files
    report_path = os.path.join(w["dir"], "report.json")
    golden = os.path.join(w["dir"], "golden_renders.npz")
    env = dict(STYLEMC_CLIP_BPE=os.path.join(
        w["clip_dir"], "bpe_simple_vocab_16e6.txt.gz"))

    runner = CliRunner()
    r = runner.invoke(verify, [
        "--network", w["network"], "--tf_network", w["tf_network"],
        "--e4e", w["e4e"],
        "--clip_dir", w["clip_dir"], "--arcface", w["arcface"],
        "--inception", w["inception"],
        "--seeds", "0-3", "--fid_samples", "8",
        "--write_golden_renders", golden,
        "--report", report_path,
    ], env=env, catch_exceptions=False)
    assert r.exit_code == 0, r.output

    with open(report_path) as f:
        report = json.load(f)
    assert report["all_ok"], report
    for check in ("generator", "tf_generator", "clip", "arcface", "e4e",
                  "inception", "fid_sanity"):
        assert check in report["checks"], sorted(report["checks"])
        assert report["checks"][check]["ok"], report["checks"][check]
    assert os.path.exists(golden)

    # second pass: golden render comparison against our own renders must
    # pass at PSNR=inf (identical bytes), proving the comparison plumbing
    r2 = runner.invoke(verify, [
        "--network", w["network"], "--seeds", "0-3",
        "--golden_renders", golden,
        "--report", report_path,
    ], env=env, catch_exceptions=False)
    assert r2.exit_code == 0, r2.output
    with open(report_path) as f:
        rep2 = json.load(f)
    assert rep2["checks"]["golden_renders"]["ok"], rep2
    assert rep2["checks"]["golden_renders"]["details"]["max_abs"] == 0


@pytest.mark.nightly
def test_verify_direction_cosine_check(weight_files):
    """The BASELINE acceptance path: --torch_direction compared against a
    direction produced by the SAME deterministic run must read cosine 1.0;
    against an sign-flipped recording the check must FAIL (exit 1)."""
    from click.testing import CliRunner

    from stylemc_tpu.cli.verify_weights import main as verify

    w = weight_files
    env = dict(STYLEMC_CLIP_BPE=os.path.join(
        w["clip_dir"], "bpe_simple_vocab_16e6.txt.gz"))
    report_path = os.path.join(w["dir"], "report_dir.json")

    # produce the "recorded torch" direction with the same config the
    # harness uses (deterministic → cosine 1.0)
    from stylemc_tpu.io import load_generator
    from stylemc_tpu.models.clip.load import load_clip
    from stylemc_tpu.models.clip.tokenizer import SimpleTokenizer
    from stylemc_tpu.models.stylegan2.generator import (inference_cfg,
                                                        mapping_jit,
                                                        w_to_s_jit)
    from stylemc_tpu.train.find_direction import (FindDirectionConfig,
                                                  find_direction)
    from stylemc_tpu.utils.model_zoo import load_arcface

    cfg, params = load_generator(w["network"])
    icfg = inference_cfg(cfg)
    zs = np.concatenate([np.random.RandomState(s).randn(1, cfg.z_dim)
                         for s in range(4)]).astype(np.float32)
    ws = mapping_jit(params, icfg, zs, truncation_psi=0.7)
    styles = np.asarray(w_to_s_jit(params, icfg, ws))
    clip_models = {name: load_clip(name, w["clip_dir"])
                   for name in ("ViT-B/32", "ViT-B/16")}
    tokenizer = SimpleTokenizer(os.path.join(
        w["clip_dir"], "bpe_simple_vocab_16e6.txt.gz"))
    arcface = load_arcface(w["arcface"])
    fdc = FindDirectionConfig(resolution=min(256, cfg.img_resolution))
    d, _ = find_direction(params, cfg, styles, clip_models, arcface, fdc,
                          tokenizer=tokenizer)
    rec = os.path.join(w["dir"], "direction_recorded.npz")
    np.savez(rec, s=np.asarray(d))

    runner = CliRunner()
    r = runner.invoke(verify, [
        "--network", w["network"], "--clip_dir", w["clip_dir"],
        "--arcface", w["arcface"], "--seeds", "0-3",
        "--torch_direction", rec, "--report", report_path,
    ], env=env, catch_exceptions=False)
    assert r.exit_code == 0, r.output
    with open(report_path) as f:
        rep = json.load(f)
    det = rep["checks"]["direction_vs_torch"]
    assert det["ok"], det
    assert det["details"]["cosine_mean"] >= 0.999, det

    # a flipped recording must fail the threshold → nonzero exit
    np.savez(rec, s=-np.asarray(d))
    r2 = runner.invoke(verify, [
        "--network", w["network"], "--clip_dir", w["clip_dir"],
        "--arcface", w["arcface"], "--seeds", "0-3",
        "--torch_direction", rec, "--report", report_path,
    ], env=env, catch_exceptions=False)
    assert r2.exit_code == 1, r2.output
