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


def init_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed for multi-host meshes.

    The reference has no multi-node story (SURVEY.md §2.5); here a pod
    slice or multi-host DCN deployment just widens the device list that
    make_mesh draws from: channel data-parallelism needs no cross-host
    collectives at all (each host demodulates its own channels), and the
    Viterbi state axis should stay within one host/ICI domain — i.e.
    build the mesh with the 'state' axis inside a host's devices and
    'ch' spanning hosts.  Call this before make_mesh on each host.
    """
    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
