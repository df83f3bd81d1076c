"""Device-mesh construction helpers.

The reference is single-process with no distributed code at all (SURVEY.md
§2.3); all scaling here is new, built on ``jax.sharding.Mesh`` + GSPMD.
The graph analog of sequence parallelism is *node/edge partitioning*: the
``nodes`` axis shards node-indexed arrays (features, embeddings) and the
edge list; XLA inserts the boundary-feature collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("nodes",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    1D ``('nodes',)`` by default; pass ``shape`` + ``axis_names`` for 2D
    (e.g. ``('nodes', 'model')``) layouts.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,)
    assert int(np.prod(shape)) == n_devices, (shape, n_devices)
    dev_array = np.asarray(devs).reshape(shape)
    return Mesh(dev_array, axis_names)
