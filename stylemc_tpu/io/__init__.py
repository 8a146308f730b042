from .pickle_loader import (
    EasyDict,
    PersistentStub,
    load_network_pkl,
    generator_from_stub,
    load_generator,
)
from .torch_state import load_state_dict_numpy, strip_prefix

__all__ = [
    "EasyDict",
    "PersistentStub",
    "load_network_pkl",
    "generator_from_stub",
    "load_generator",
    "load_state_dict_numpy",
    "strip_prefix",
]
