"""Device mesh construction for tensor/data parallel inference.

The reference has no distributed execution at all (SURVEY §2.12); this module
is the TPU-native scaling layer required by BASELINE.json: a
jax.sharding.Mesh over ICI with named axes
  - "dp": data parallel (batch / request sharding, continuous batching)
  - "tp": tensor parallel (attention heads + FFN hidden dim + vocab)
Collectives are inserted by XLA GSPMD from NamedSharding annotations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(tp: int | None = None, dp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // dp
    assert dp * tp <= n, f"need {dp * tp} devices, have {n}"
    devs = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
