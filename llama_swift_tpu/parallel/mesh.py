"""Device mesh construction.

The reference has no distribution at all — its "communication backend" is a
pthread spin-barrier on one host (SURVEY.md §5.8).  Here the mesh is the
first-class scaling construct: axes

* ``dp`` — data/batch parallel (continuous-batching slots sharded),
* ``tp`` — tensor parallel (the Megatron col/row split latent in the GGML
  multi-part format, ``LlamaPredictOperation.mm:358-388``).

XLA inserts all-reduce/all-gather over ICI from sharding annotations; no
hand-written collectives needed for the standard path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    tp: Optional[int] = None,
    dp: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Defaults: all devices on the tp axis (weights sharded, batch replicated)
    — the right default for big-model inference on one slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != device count {n}")
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(tp=1, dp=1, devices=jax.devices()[:1])
