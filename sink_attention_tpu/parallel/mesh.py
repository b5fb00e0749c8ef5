"""Device-mesh helpers.

The reference's distributed layer is torch.distributed process groups over
NCCL (/root/reference/sink_attention/sp_utils.py); the TPU-native equivalent
is a named ``jax.sharding.Mesh`` whose axes ride ICI, with lax collectives
inside ``shard_map``. "Accept a process group" becomes "accept an axis name".
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a mesh. Default: all devices on ('data', 'seq', 'model') with
    sizes (n, 1, 1) — callers override, e.g. {'data': 2, 'model': 4}."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {DATA_AXIS: len(devices), SEQ_AXIS: 1, MODEL_AXIS: 1}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    assert int(np.prod(sizes)) == len(devices), (axis_sizes, len(devices))
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
