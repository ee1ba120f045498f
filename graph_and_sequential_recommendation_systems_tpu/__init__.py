"""Long-name alias for the `gsrs_tpu` package.

`graph_and_sequential_recommendation_systems_tpu` is the full framework
name (TPU-native rebuild of the capabilities of
saamiya225/Graph-and-sequential-recommendation-systems); `gsrs_tpu` is the
canonical short import the code itself uses. This module makes
``import graph_and_sequential_recommendation_systems_tpu`` and
``from graph_and_sequential_recommendation_systems_tpu import models``
resolve to the same module objects as the short name (no duplicate
loading)."""

import importlib as _importlib
import sys as _sys

import gsrs_tpu as _pkg

# Re-export the top-level API.
from gsrs_tpu import *  # noqa: F401,F403
from gsrs_tpu import __version__  # noqa: F401


def __getattr__(name):
    mod = _importlib.import_module(f"gsrs_tpu.{name}")
    _sys.modules[f"{__name__}.{name}"] = mod
    return mod


# Pre-register the subpackages so the statement form
# ``import graph_and_sequential_recommendation_systems_tpu.models`` also
# resolves (the import system consults sys.modules, not __getattr__,
# for dotted imports).
for _sub in (
    "data", "models", "ops", "parallel", "train", "utils", "native",
    "cli", "config", "seq_cli", "serve", "serve_seq",
):
    try:
        _sys.modules[f"{__name__}.{_sub}"] = _importlib.import_module(
            f"gsrs_tpu.{_sub}"
        )
    except ImportError:  # optional heavy deps may be absent in odd envs
        pass
del _sub
