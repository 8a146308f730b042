"""Safe .pkl ingestion: fabricate checkpoints in the NVIDIA persistence
on-disk format (without using any reference code) and verify (a) parameters
round-trip into the pytree, (b) embedded code is never executed."""

import io
import os
import pickle
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stylemc_tpu.io import load_network_pkl, load_generator, PersistentStub
from stylemc_tpu.models.stylegan2.generator import (
    GeneratorConfig, init_generator_params, generate,
)


# --------------------------------------------------------------- fabrication

def _install_fake_persistence_module():
    """Register a fake torch_utils.persistence module so pickle.dump can
    reference `_reconstruct_persistent_obj` by name, reproducing the on-disk
    format of NVIDIA checkpoints for the loader to parse."""
    def _reconstruct_persistent_obj(meta):  # never called by our loader
        raise AssertionError("must not be called")

    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    mod = types.ModuleType("torch_utils.persistence")
    mod._reconstruct_persistent_obj = _reconstruct_persistent_obj
    pkg = types.ModuleType("torch_utils")
    # keep real submodules importable through the fake package (the
    # reference-parity tests import torch_utils.ops.* in the same session)
    ref_pkg_dir = "/root/reference/torch_utils"
    if os.path.isdir(ref_pkg_dir):
        pkg.__path__ = [ref_pkg_dir]
    pkg.persistence = mod
    sys.modules.setdefault("torch_utils", pkg)
    sys.modules["torch_utils.persistence"] = mod
    return mod


class _FakePersistentObj:
    """Pickles exactly like a persistence-decorated network object."""

    def __init__(self, class_name, state):
        self.class_name = class_name
        self.state = state

    def __reduce__(self):
        mod = sys.modules["torch_utils.persistence"]
        meta = {
            "type": "class",
            "version": 2,
            "module_src": "# embedded source that must never run\nraise RuntimeError('executed embedded source')\n",
            "class_name": self.class_name,
            "state": self.state,
        }
        return (mod._reconstruct_persistent_obj, (meta,))


class _FakeModule:
    """Mimics a pickled nn.Module: plain object with _parameters/_buffers/
    _modules in __dict__."""

    def __init__(self, params=None, buffers=None, modules=None):
        self._parameters = dict(params or {})
        self._buffers = dict(buffers or {})
        self._modules = dict(modules or {})


def _t(arr):
    return torch.from_numpy(np.asarray(arr, dtype=np.float32))


def _fc_mod(w, b):
    return _FakeModule(params={"weight": _t(w), "bias": _t(b)})


def fabricate_pkl(tmp_path, cfg: GeneratorConfig, params) -> str:
    """Build a .pkl with the reference's {'G_ema': persistent_obj} layout from
    our pytree."""
    _install_fake_persistence_module()

    def conv_mod(lp):
        return _FakeModule(
            params={
                "weight": _t(lp["weight"]),
                "bias": _t(lp["bias"]),
                "noise_strength": _t(np.array(lp["noise_strength"])),
            },
            buffers={
                "noise_const": _t(lp["noise_const"]),
                "resample_filter": _t(np.ones((4, 4)) / 16),
            },
            modules={"affine": _fc_mod(lp["affine"]["weight"], lp["affine"]["bias"])},
        )

    def torgb_mod(lp):
        return _FakeModule(
            params={"weight": _t(lp["weight"]), "bias": _t(lp["bias"])},
            modules={"affine": _fc_mod(lp["affine"]["weight"], lp["affine"]["bias"])},
        )

    map_modules = {}
    for i in range(cfg.mapping_layers):
        lp = params["mapping"][f"fc{i}"]
        map_modules[f"fc{i}"] = _fc_mod(lp["weight"], lp["bias"])
    mapping_mod = _FakeModule(
        buffers={"w_avg": _t(params["mapping"]["w_avg"])},
        modules=map_modules,
    )

    syn_modules = {}
    for res in cfg.block_resolutions:
        bp = params["synthesis"][f"b{res}"]
        mods = {}
        bparams = {}
        if res == 4:
            bparams["const"] = _t(bp["const"])
        else:
            mods["conv0"] = conv_mod(bp["conv0"])
        mods["conv1"] = conv_mod(bp["conv1"])
        mods["torgb"] = torgb_mod(bp["torgb"])
        syn_modules[f"b{res}"] = _FakeModule(params=bparams, modules=mods)
    synthesis_mod = _FakeModule(modules=syn_modules)

    g_state = {
        "init_args": (),
        "init_kwargs": {
            "z_dim": cfg.z_dim, "c_dim": cfg.c_dim, "w_dim": cfg.w_dim,
            "img_resolution": cfg.img_resolution, "img_channels": cfg.img_channels,
            "mapping_kwargs": {"num_layers": cfg.mapping_layers},
            "synthesis_kwargs": {
                "channel_base": cfg.channel_base, "channel_max": cfg.channel_max,
                "num_fp16_res": cfg.num_fp16_res, "conv_clamp": cfg.conv_clamp,
            },
        },
        "_parameters": {},
        "_buffers": {},
        "_modules": {"mapping": mapping_mod, "synthesis": synthesis_mod},
    }
    gobj = _FakePersistentObj("Generator", g_state)
    path = os.path.join(str(tmp_path), "fake_network.pkl")
    with open(path, "wb") as f:
        pickle.dump({"G_ema": gobj, "G": gobj, "D": None,
                     "training_set_kwargs": None, "augment_pipe": None}, f)
    return path


# --------------------------------------------------------------------- tests

@pytest.fixture(scope="module")
def fabricated(tmp_path_factory):
    cfg = GeneratorConfig(img_resolution=16, channel_base=512, channel_max=64,
                          mapping_layers=2)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    path = fabricate_pkl(tmp_path_factory.mktemp("pkl"), cfg, params)
    return cfg, params, path


def test_load_returns_stub(fabricated):
    _, _, path = fabricated
    data = load_network_pkl(path)
    assert isinstance(data["G_ema"], PersistentStub)
    assert data["G_ema"].class_name == "Generator"


def test_params_roundtrip(fabricated):
    cfg0, params0, path = fabricated
    cfg, params = load_generator(path)
    assert cfg == cfg0
    leaves0 = jax.tree_util.tree_leaves_with_path(params0)
    leaves1_map = dict(jax.tree_util.tree_leaves_with_path(params))
    assert len(leaves0) == len(leaves1_map)
    for path_, leaf in leaves0:
        np.testing.assert_allclose(np.array(leaf), np.array(leaves1_map[path_]),
                                   rtol=1e-6, err_msg=str(path_))


def test_loaded_generator_runs(fabricated):
    cfg0, params0, path = fabricated
    cfg, params = load_generator(path)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    img0 = np.array(generate(params0, cfg0, z))
    img1 = np.array(generate(params, cfg, z))
    np.testing.assert_allclose(img0, img1, rtol=1e-5, atol=1e-6)


def test_embedded_source_never_executed(fabricated):
    # The fake module_src raises if exec'd; loading must succeed anyway.
    _, _, path = fabricated
    data = load_network_pkl(path)
    assert "raise RuntimeError" in data["G_ema"].meta["module_src"]


def test_malicious_reduce_neutralized(tmp_path):
    canary = os.path.join(str(tmp_path), "pwned")

    class Evil:
        def __reduce__(self):
            return (os.system, (f"touch {canary}",))

    path = os.path.join(str(tmp_path), "evil.pkl")
    with open(path, "wb") as f:
        pickle.dump({"G_ema": Evil()}, f)
    load_network_pkl(path)  # must not execute os.system
    assert not os.path.exists(canary)


def test_allowlisted_module_gadgets_neutralized(tmp_path):
    """Round-1 advisor PoC: gadget callables living INSIDE formerly
    prefix-allowlisted modules (numpy.testing.runstring, torch.serialization
    .load, numpy.ctypeslib.load_library) must resolve to inert stubs under
    the exact (module, name) allowlist."""
    canary = os.path.join(str(tmp_path), "pwned")

    class _Gadget:
        def __init__(self, module, name, args):
            self.module, self.name, self.args = module, name, args

        def __reduce__(self):
            import importlib
            fn = getattr(importlib.import_module(self.module), self.name)
            return (fn, self.args)

    gadgets = [
        _Gadget("numpy.testing", "runstring",
                (f"import os; os.system('touch {canary}')", {})),
    ]
    path = os.path.join(str(tmp_path), "gadgets.pkl")
    with open(path, "wb") as f:
        pickle.dump({"G_ema": gadgets}, f)
    load_network_pkl(path)
    assert not os.path.exists(canary)


def test_storage_load_from_bytes_nested_pickle_rejected(tmp_path):
    """torch.storage._load_from_bytes is replaced by a weights_only=True
    loader, so a nested malicious torch.load payload cannot execute."""
    import torch

    canary = os.path.join(str(tmp_path), "pwned")

    class EvilInner:
        def __reduce__(self):
            return (os.system, (f"touch {canary}",))

    inner = io.BytesIO()
    torch.save({"x": EvilInner()}, inner, _use_new_zipfile_serialization=False)

    import torch.storage as ts
    path = os.path.join(str(tmp_path), "nested.pkl")

    class Carrier:
        def __reduce__(self):
            return (ts._load_from_bytes, (inner.getvalue(),))

    with open(path, "wb") as f:
        pickle.dump({"G_ema": Carrier()}, f)
    try:
        load_network_pkl(path)
    except Exception:
        pass  # rejection (UnpicklingError) is the expected outcome
    assert not os.path.exists(canary)


def test_real_torch_tensors_still_load(tmp_path):
    """The exact allowlist must still reconstruct genuinely pickled torch
    tensors (storage via _load_from_bytes) and numpy arrays/scalars."""
    import collections
    import torch

    d = collections.OrderedDict(
        w=torch.nn.Parameter(torch.randn(2, 3)),
        h=torch.randn(3).half(),
        a=np.random.randn(2).astype(np.float32),
        s=np.float32(1.5),
    )
    path = os.path.join(str(tmp_path), "tensors.pkl")
    with open(path, "wb") as f:
        pickle.dump({"G_ema": d}, f)
    out = load_network_pkl(path)["G_ema"]
    assert out["w"].shape == (2, 3)
    assert out["h"].dtype == torch.float16
    np.testing.assert_allclose(np.asarray(out["a"]), np.asarray(d["a"]))
    assert float(out["s"]) == 1.5


# ------------------------------------------------------------------ export


@pytest.mark.slow
def test_rosinality_pt_export_roundtrip(tmp_path):
    """save_rosinality_pt → load_generator(.pt): params and synthesis match
    (the export direction of io/rosinality.py's name map)."""
    from stylemc_tpu.io.export import save_rosinality_pt
    from stylemc_tpu.io.rosinality import config_for_rosinality
    from stylemc_tpu.models.stylegan2.generator import (
        mapping, synthesis, w_to_s)

    cfg = config_for_rosinality(16, n_mlp=2)
    params = init_generator_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "g.pt")
    save_rosinality_pt(path, cfg, params)

    cfg2, params2 = load_generator(path)
    assert cfg2.img_resolution == cfg.img_resolution
    assert cfg2.mapping_layers == cfg.mapping_layers

    z = jnp.asarray(np.random.RandomState(0).randn(2, 512), jnp.float32)
    a = synthesis(params, cfg, w_to_s(params, cfg, mapping(params, cfg, z)),
                  noise_mode="const")
    b = synthesis(params2, cfg2,
                  w_to_s(params2, cfg2, mapping(params2, cfg2, z)),
                  noise_mode="const")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    # latent_avg defaults to the mapping's w_avg
    np.testing.assert_allclose(
        np.asarray(params2["mapping"]["w_avg"]),
        np.asarray(params["mapping"]["w_avg"]), rtol=1e-6)


def test_legacy_cli_pt_dest(tmp_path, fabricated):
    """legacy CLI: NVIDIA .pkl in → rosinality .pt out → loads back."""
    from click.testing import CliRunner

    from stylemc_tpu.cli.legacy import main as legacy_main

    cfg, params, pkl_path = fabricated
    dest = str(tmp_path / "converted.pt")
    r = CliRunner().invoke(legacy_main,
                           ["--source", pkl_path, "--dest", dest])
    assert r.exit_code == 0, r.output
    cfg2, params2 = load_generator(dest)
    assert cfg2.img_resolution == cfg.img_resolution
