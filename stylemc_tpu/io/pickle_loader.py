"""Safe ingestion of NVIDIA StyleGAN2-ADA `.pkl` checkpoints.

The reference loads these by exec()-ing Python source embedded in the pickle
(/root/reference/torch_utils/persistence.py:179-227 via legacy.py:21-68).
This loader never executes embedded code: a restricted Unpickler rebuilds
tensors through an allowlist and replaces every persistent network object
with an inert stub carrying its `state`/`init_kwargs`, from which the
parameter pytree is assembled by name (canonical layout documented by the
conversion table in /root/reference/legacy.py:172-203).

Entry points:
  load_network_pkl(f)         → {'G': Stub, 'D': Stub, 'G_ema': Stub, ...}
  generator_from_stub(stub)   → (GeneratorConfig, params pytree)
  load_generator(path)        → (GeneratorConfig, params) for G_ema
"""

from __future__ import annotations

import collections
import io as _io
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.stylegan2.generator import GeneratorConfig


class EasyDict(dict):
    """Attribute-access dict (API compat with dnnlib.EasyDict, util.py:40)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


class PersistentStub:
    """Inert stand-in for a pickle-embedded network module.

    Exposes the recorded constructor args and the module state tree without
    ever executing the embedded source code.
    """

    def __init__(self, meta: dict):
        self.meta = meta
        self.class_name = meta.get("class_name")
        self.init_args = tuple(meta.get("state", {}).get("init_args", ()))
        self.init_kwargs = dict(meta.get("state", {}).get("init_kwargs", {}))
        self.state = meta.get("state", {})

    def named_tensors(self) -> Dict[str, np.ndarray]:
        """Flatten `_parameters`/`_buffers`/`_modules` into dotted names →
        numpy arrays, the same namespace torch's state_dict would produce."""
        out: Dict[str, np.ndarray] = {}
        _walk_module_state(self.state, "", out)
        return out

    def __repr__(self):
        return f"PersistentStub({self.class_name})"


def _to_numpy(t) -> Optional[np.ndarray]:
    if isinstance(t, np.ndarray):
        return t
    if type(t).__module__.startswith("torch"):
        try:
            return t.detach().cpu().numpy()
        except Exception:
            return None
    return None


def _walk_module_state(state: Any, prefix: str, out: Dict[str, np.ndarray]):
    if isinstance(state, PersistentStub):
        _walk_module_state(state.state, prefix, out)
        return
    if isinstance(state, _StubBase):
        _walk_module_state(state.__dict__, prefix, out)
        return
    if not isinstance(state, dict):
        return
    for key in ("_parameters", "_buffers"):
        for name, val in (state.get(key) or {}).items():
            if val is None:
                continue
            arr = _to_numpy(val)
            if arr is not None:
                out[prefix + name] = arr
    for name, sub in (state.get("_modules") or {}).items():
        if sub is None:
            continue
        _walk_module_state(sub, prefix + name + ".", out)


class _StubBase:
    """Generic stand-in for any non-allowlisted class found in the pickle."""

    def __new__(cls, *args, **kwargs):
        obj = object.__new__(cls)
        obj.__dict__["_stub_init_args"] = args
        return obj

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_stub_state"] = state

    # Some pickles call methods during reconstruction (e.g. OrderedDict
    # subclass update); be permissive but inert.
    def __call__(self, *args, **kwargs):
        return None


def _reconstruct_persistent_stub(meta) -> PersistentStub:
    return PersistentStub(dict(meta))


def _safe_storage_from_bytes(b):
    """Replacement for torch.storage._load_from_bytes.

    The stock implementation calls torch.load(..., weights_only=False) on
    attacker-controlled bytes — an arbitrary-code gadget. The inner payload
    for a legitimately pickled Storage is torch's legacy serialization
    format, which weights_only=True handles; anything else is rejected.
    """
    import torch
    return torch.load(_io.BytesIO(b), weights_only=True)


# Exact (module, name) allowlist of reconstruction callables actually needed
# to rebuild tensors/arrays/containers from NVIDIA-style network pickles.
# Prefix allowlists are NOT used: whole-module trees (numpy, torch.*) contain
# REDUCE-callable exec gadgets (e.g. numpy.testing.runstring,
# numpy.ctypeslib.load_library, torch.serialization.load).
_SAFE_EXACT = {
    ("builtins", "set"), ("builtins", "frozenset"), ("builtins", "list"),
    ("builtins", "dict"), ("builtins", "tuple"), ("builtins", "complex"),
    ("builtins", "bytearray"), ("builtins", "slice"), ("builtins", "range"),
    ("collections", "OrderedDict"),
    ("_codecs", "encode"),
    # numpy arrays/scalars (both the 1.x and 2.x module spellings)
    ("numpy", "ndarray"), ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "scalar"),
    # torch tensor reconstruction
    ("torch._utils", "_rebuild_tensor"),
    ("torch._utils", "_rebuild_tensor_v2"),
    ("torch._utils", "_rebuild_parameter"),
    ("torch", "Size"), ("torch", "device"), ("torch", "dtype"),
}
_TORCH_DTYPE_NAMES = {
    "float32", "float64", "float16", "bfloat16", "int64", "int32", "int16",
    "int8", "uint8", "bool",
}
# Untyped/typed storage classes referenced by _rebuild_tensor* arguments.
_TORCH_STORAGE_NAMES = {
    "FloatStorage", "DoubleStorage", "HalfStorage", "BFloat16Storage",
    "LongStorage", "IntStorage", "ShortStorage", "CharStorage",
    "ByteStorage", "BoolStorage", "UntypedStorage",
}


class _SafeUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        if module.startswith("torch_utils.persistence") and name == "_reconstruct_persistent_obj":
            return _reconstruct_persistent_stub
        if module == "dnnlib.tflib.network" and name == "Network":
            # legacy TF pickle (reference legacy.py:65-72): inert stub, the
            # embedded build source is never executed
            from .tf_legacy import TFNetworkStub
            return TFNetworkStub
        if module.startswith("dnnlib") and name == "EasyDict":
            return EasyDict
        if module == "torch.storage" and name == "_load_from_bytes":
            return _safe_storage_from_bytes
        if (module, name) in _SAFE_EXACT:
            return super().find_class(module, name)
        if module == "torch" and (name in _TORCH_DTYPE_NAMES
                                  or name in _TORCH_STORAGE_NAMES):
            return super().find_class(module, name)
        # Everything else (nn.Module subclasses, random classes): inert stub
        # preserving the recorded type name.
        return type(f"Stub_{name}", (_StubBase,), {"_pickle_type": (module, name)})


def load_network_pkl(f) -> Dict[str, Any]:
    """Parse an NVIDIA network pickle without executing embedded code.

    Accepts a path or binary file object. Returns the raw pickle dict with
    network objects replaced by `PersistentStub`s.
    """
    if isinstance(f, (str, bytes)):
        with open(f, "rb") as fh:
            data = _SafeUnpickler(fh).load()
    else:
        data = _SafeUnpickler(f).load()

    # Legacy TensorFlow pickle => convert (reference legacy.py:24-30).
    from .tf_legacy import (is_tf_network_tuple, convert_tf_generator,
                            convert_tf_discriminator)
    if is_tf_network_tuple(data):
        tf_G, tf_D, tf_Gs = data
        data = {"G": convert_tf_generator(tf_G),
                "D": convert_tf_discriminator(tf_D),
                "G_ema": convert_tf_generator(tf_Gs),
                "training_set_kwargs": None, "augment_pipe": None}

    assert isinstance(data, dict), f"unexpected pickle payload: {type(data)}"
    return data


# ------------------------------------------------------------ param assembly


def _config_from_stub(stub: PersistentStub) -> GeneratorConfig:
    kw = stub.init_kwargs
    syn_kw = dict(kw.get("synthesis_kwargs", {}))
    map_kw = dict(kw.get("mapping_kwargs", {}))
    return GeneratorConfig(
        z_dim=int(kw.get("z_dim", 512)),
        c_dim=int(kw.get("c_dim", 0)),
        w_dim=int(kw.get("w_dim", 512)),
        img_resolution=int(kw.get("img_resolution", 1024)),
        img_channels=int(kw.get("img_channels", 3)),
        channel_base=int(syn_kw.get("channel_base", 32768)),
        channel_max=int(syn_kw.get("channel_max", 512)),
        num_fp16_res=int(syn_kw.get("num_fp16_res", 4)),
        conv_clamp=syn_kw.get("conv_clamp", 256),
        mapping_layers=int(map_kw.get("num_layers", 8)),
    )


def generator_from_stub(stub: PersistentStub,
                        force_fp16: bool = False) -> Tuple[GeneratorConfig, Dict]:
    """Assemble (config, params pytree) from a G/G_ema stub.

    Name mapping (torch state_dict namespace → pytree):
      mapping.fc{i}.{weight,bias}            → mapping.fc{i}.{weight,bias}
      mapping.w_avg                          → mapping.w_avg
      synthesis.b{res}.const                 → synthesis.b{res}.const
      synthesis.b{res}.{conv0,conv1}.affine.{weight,bias}
      synthesis.b{res}.{conv0,conv1}.{weight,bias,noise_strength,noise_const}
      synthesis.b{res}.torgb.{affine.*,weight,bias}
    resample_filter buffers are derived, not imported.
    """
    import dataclasses

    import jax.numpy as jnp

    cfg = _config_from_stub(stub)
    if force_fp16:
        # reference legacy.py:39-55: force num_fp16_res=4 + conv_clamp=256
        # on networks saved without mixed precision
        cfg = dataclasses.replace(cfg, num_fp16_res=4, conv_clamp=256)
    tensors = stub.named_tensors()

    def get(name, required=True):
        if name not in tensors:
            if required:
                raise KeyError(
                    f"missing tensor {name!r}; available: "
                    f"{sorted(tensors)[:8]}...")
            return None
        return jnp.asarray(np.ascontiguousarray(tensors[name]), jnp.float32)

    mapping = {}
    for i in range(cfg.mapping_layers):
        mapping[f"fc{i}"] = {
            "weight": get(f"mapping.fc{i}.weight"),
            "bias": get(f"mapping.fc{i}.bias"),
        }
    w_avg = get("mapping.w_avg", required=False)
    mapping["w_avg"] = w_avg if w_avg is not None else jnp.zeros((cfg.w_dim,))
    if cfg.c_dim > 0:
        mapping["embed"] = {"weight": get("mapping.embed.weight"),
                            "bias": get("mapping.embed.bias")}

    def conv_layer(pfx, res):
        return {
            "affine": {"weight": get(f"{pfx}.affine.weight"),
                       "bias": get(f"{pfx}.affine.bias")},
            "weight": get(f"{pfx}.weight"),
            "bias": get(f"{pfx}.bias"),
            "noise_strength": get(f"{pfx}.noise_strength").reshape(()),
            "noise_const": get(f"{pfx}.noise_const"),
        }

    def torgb_layer(pfx):
        return {
            "affine": {"weight": get(f"{pfx}.affine.weight"),
                       "bias": get(f"{pfx}.affine.bias")},
            "weight": get(f"{pfx}.weight"),
            "bias": get(f"{pfx}.bias"),
        }

    synthesis = {}
    for res in cfg.block_resolutions:
        b = f"synthesis.b{res}"
        block = {}
        if res == 4:
            block["const"] = get(f"{b}.const")
        else:
            block["conv0"] = conv_layer(f"{b}.conv0", res)
        block["conv1"] = conv_layer(f"{b}.conv1", res)
        block["torgb"] = torgb_layer(f"{b}.torgb")
        synthesis[f"b{res}"] = block
    return cfg, {"mapping": mapping, "synthesis": synthesis}


def load_generator(path, key: str = "G_ema",
                   force_fp16: bool = False) -> Tuple[GeneratorConfig, Dict]:
    if isinstance(path, str) and path.endswith(".npz"):
        from .native import load_native
        return load_native(path)
    if isinstance(path, str) and path.endswith((".pt", ".pth")):
        from .rosinality import load_rosinality_pt
        return load_rosinality_pt(path)
    data = load_network_pkl(path)
    stub = data[key]
    assert isinstance(stub, PersistentStub), f"{key} is not a persistent network"
    return generator_from_stub(stub, force_fp16=force_fp16)
