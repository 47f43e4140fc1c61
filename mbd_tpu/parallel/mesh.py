"""Device-mesh helpers: sample-axis data parallelism over ICI.

The one cross-sample coupling in MBD/MPPI is the softmax-weighted barycenter
plus reward mean/std standardization (reference mbd_planner.py:110-128). We
shard the Nsample axis over a 1-D mesh; XLA/GSPMD turns those reductions into
``psum``-style collectives over ICI while each chip rolls out its own shard
of samples. Multi-host DCN is reserved for embarrassingly-parallel multi-seed
fan-out (the reference's run_mbd.py harness).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SAMPLE_AXIS = "sample"


def sample_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or given) devices with a single 'sample' axis."""
    import numpy as np

    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (SAMPLE_AXIS,))


def sample_sharding(mesh: Mesh, batch_ndim_at: int = 0) -> NamedSharding:
    """Sharding that splits leading (sample) axis across the mesh."""
    spec = [None] * batch_ndim_at + [SAMPLE_AXIS]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
