"""Utility-layer tests: native npz format, dnnlib helpers, profiling,
training stats, misc."""

import io
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemc_tpu.io.native import save_native, load_native
from stylemc_tpu.io import load_generator
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, generate,
)
from stylemc_tpu.utils.dnnlib import (
    EasyDict, Logger, is_url, open_url, get_obj_by_name,
    construct_class_by_name,
)
from stylemc_tpu.utils.profiling import (
    profiled_function, record_function, count_params, print_params_summary,
)
from stylemc_tpu.utils.misc import num_range, assert_shape, unravel_index
from stylemc_tpu.parallel import stats


@pytest.mark.slow
def test_native_format_roundtrip(tmp_path):
    cfg = GeneratorConfig(img_resolution=16, channel_base=512, channel_max=32,
                          mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "g.npz")
    save_native(path, cfg, params)
    cfg2, params2 = load_native(path)
    assert cfg2 == cfg
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    np.testing.assert_allclose(np.asarray(generate(params, cfg, z)),
                               np.asarray(generate(params2, cfg2, z)),
                               rtol=1e-6)
    # load_generator dispatches on extension
    cfg3, _ = load_generator(path)
    assert cfg3 == cfg


def test_easydict():
    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    del d.a
    with pytest.raises(AttributeError):
        _ = d.a


def test_logger_tee(tmp_path):
    path = str(tmp_path / "log.txt")
    with Logger(path):
        print("hello-tee")
    assert "hello-tee" in open(path).read()
    print("after")  # stdout restored


def test_is_url_and_local_passthrough(tmp_path):
    assert is_url("https://example.com/x.pkl")
    assert not is_url("/tmp/foo.pkl")
    p = tmp_path / "f.bin"
    p.write_bytes(b"data")
    with open_url(str(p)) as f:
        assert f.read() == b"data"


def test_construct_class_by_name():
    od = construct_class_by_name([("a", 1)], class_name="collections.OrderedDict")
    assert od["a"] == 1
    fn = get_obj_by_name("numpy.sum")
    assert fn is np.sum


def test_profiled_function_and_scope():
    @profiled_function
    def f(x):
        return x * 2

    assert float(f(jnp.asarray(3.0))) == 6.0
    with record_function("scope"):
        pass


def test_params_summary(capsys):
    cfg = GeneratorConfig(img_resolution=8, channel_base=256, channel_max=16,
                          mapping_layers=1)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    total = print_params_summary(params, max_depth=2)
    out = capsys.readouterr().out
    assert "TOTAL" in out
    assert total == count_params(params)
    assert total > 0


def test_training_stats():
    stats._counters.clear()
    stats.report("loss", jnp.asarray([1.0, 2.0, 3.0]))
    stats.report("loss", jnp.asarray([5.0]))
    c = stats.Collector(regex="loss")
    c.update()
    assert c.num("loss") == 4
    np.testing.assert_allclose(c.mean("loss"), 2.75)
    assert c.std("loss") > 0
    d = c.as_dict()
    assert d["loss"]["num"] == 4


def test_misc_helpers():
    assert num_range("3-6") == [3, 4, 5, 6]
    assert num_range("1,5,9") == [1, 5, 9]
    assert_shape(np.zeros((2, 3)), [None, 3])
    with pytest.raises(AssertionError):
        assert_shape(np.zeros((2, 3)), [None, 4])
    assert unravel_index(5, (2, 3)) == (1, 2)


# ------------------------------------------------------------------ RunLogger

def test_run_logger_jsonl_backend(tmp_path):
    import json
    from stylemc_tpu.utils.logging import RunLogger

    lg = RunLogger("proj", config={"a": 1}, outdir=str(tmp_path),
                   use_wandb=False)
    lg.log({"loss": 0.5, "note": "txt"}, step=1)
    lg.log({"loss": np.float32(0.25),
            "grid": np.zeros((8, 8, 3), np.uint8)}, step=2)
    lg.finish()

    lines = [json.loads(l) for l in
             open(tmp_path / "wandb_log.jsonl").read().splitlines()]
    assert lines[0]["event"] == "init" and lines[0]["config"] == {"a": 1}
    assert lines[1] == {"step": 1, "loss": 0.5, "note": "txt"}
    assert lines[2]["loss"] == 0.25
    assert (tmp_path / "images" / "grid_000002.png").exists()


# ------------------------------------------------------------ clip_filter CLI

def test_clip_filter_cli_partitions_dataset(tmp_path, monkeypatch):
    """keep_class=0 and keep_class=1 runs must partition the image set
    (argmax over two prompts is total), and the styles subset must align
    with the kept indices (male2female.ipynb cells 7-10 contract)."""
    from click.testing import CliRunner
    from PIL import Image

    from stylemc_tpu.models.clip.model import CLIPConfig, init_clip_params
    from stylemc_tpu.models.clip.tokenizer import FallbackTokenizer
    from stylemc_tpu.utils import model_zoo
    from stylemc_tpu.cli.clip_filter import main as clip_filter

    tiny = CLIPConfig(embed_dim=16, image_resolution=32, vision_layers=1,
                      vision_width=64, vision_patch_size=16,
                      transformer_width=32, transformer_heads=2,
                      transformer_layers=1)
    tiny_params = init_clip_params(jax.random.PRNGKey(0), tiny)
    monkeypatch.setattr(
        model_zoo, "load_clip_models",
        lambda kind, allow_random_init=False: (
            {"ViT-B/32": (tiny, tiny_params)}, FallbackTokenizer()))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    n = 6
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(img_dir / f"im_{i:03d}.png")
    styles = rng.randn(n, 26, 512).astype(np.float32)
    np.savez(tmp_path / "s.npz", s=styles)

    kept = {}
    for cls in (0, 1):
        out = tmp_path / f"out{cls}.npz"
        res = CliRunner().invoke(clip_filter, [
            "--images_dir", str(img_dir), "--s_input", str(tmp_path / "s.npz"),
            "--prompts", "a photo of a man|a photo of a woman",
            "--keep_class", str(cls), "--out_file", str(out), "--batch", "4"])
        assert res.exit_code == 0, res.output
        data = np.load(out, allow_pickle=True)
        kept[cls] = list(data["indices"])
        np.testing.assert_array_equal(data["s"], styles[data["indices"]])
        assert len(data["paths"]) == len(data["indices"])

    assert sorted(kept[0] + kept[1]) == list(range(n))
