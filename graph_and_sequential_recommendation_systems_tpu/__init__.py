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
