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
