"""Named-module registry.

Parity with the reference's plugin loader (``utils/utils.py:177-193``): every
model family / criterion / dataloader is a python module named after its
config string, exposing a ``Wrapper`` class with:

- ``Wrapper.get_args(parser)``  — register the plugin's own CLI args
- ``Wrapper.get_net(args)``     — build the (flax) module / criterion object

Comma-separated lists are supported for criterions and metrics.
"""

from __future__ import annotations

import importlib

# config-kind -> package that hosts its plugins
_KIND_TO_PACKAGE = {
    "embedders": "latentpose_tpu.models.embedders",
    "generators": "latentpose_tpu.models.generators",
    "discriminators": "latentpose_tpu.models.discriminators",
    "criterions": "latentpose_tpu.losses",
    "metrics": "latentpose_tpu.metrics",
    "dataloaders": "latentpose_tpu.data",
    "runners": "latentpose_tpu.runners",
}


def load_module(kind: str, name: str):
    """Import the plugin module ``<package for kind>.<name>``."""
    if kind not in _KIND_TO_PACKAGE:
        raise ValueError(f"Unknown module kind {kind!r}; expected one of "
                         f"{sorted(_KIND_TO_PACKAGE)}")
    return importlib.import_module(f"{_KIND_TO_PACKAGE[kind]}.{name}")


def load_wrapper(kind: str, name: str):
    """Return the plugin's ``Wrapper`` class."""
    module = load_module(kind, name)
    if not hasattr(module, "Wrapper"):
        raise AttributeError(f"Plugin {kind}/{name} has no Wrapper class")
    return module.Wrapper


def load_wrappers_for_module_list(csv_names: str, kind: str):
    """Load a comma-separated list of plugins (criterions/metrics).

    Mirrors reference ``utils/utils.py:186-193``.
    """
    names = [n.strip() for n in csv_names.split(",") if n.strip()]
    return [load_wrapper(kind, n) for n in names]
