"""Device mesh helpers.

The reference's only parallelism is OS pipes + SSE lanes (SURVEY.md §2.5);
here parallel structure is explicit: a 2-axis mesh with
``ch`` (channels — data-parallel demod/decode) and ``state`` (the 2**23
Viterbi state lattice — tensor-parallel ACS).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_channels_axis: int | None = None,
    n_state_axis: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Create a (ch, state) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_channels_axis is None:
        n_channels_axis = n // n_state_axis
    assert n_channels_axis * n_state_axis <= n
    dev = np.asarray(devices[: n_channels_axis * n_state_axis]).reshape(
        n_channels_axis, n_state_axis
    )
    return Mesh(dev, ("ch", "state"))


def channel_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (channel) axis, replicate the rest."""
    return NamedSharding(mesh, P("ch", *([None] * (ndim - 1))))
