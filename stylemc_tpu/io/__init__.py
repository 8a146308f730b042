from .pickle_loader import (
    EasyDict,
    PersistentStub,
    load_network_pkl,
    generator_from_stub,
    load_generator,
)
from .torch_state import load_state_dict_numpy, strip_prefix
from .tf_legacy import (TFNetworkStub, convert_tf_generator,
                        convert_tf_discriminator, discriminator_from_stub)

__all__ = [
    "EasyDict",
    "PersistentStub",
    "load_network_pkl",
    "generator_from_stub",
    "load_generator",
    "load_state_dict_numpy",
    "strip_prefix",
    "TFNetworkStub",
    "convert_tf_generator",
    "convert_tf_discriminator",
    "discriminator_from_stub",
]
