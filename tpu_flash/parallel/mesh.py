"""Device-mesh construction (ICI/DCN-aware axis ordering).

Axes (core/config.py MeshConfig):
  data  — batch/request parallelism (outermost: tolerates DCN)
  seq   — sequence/context parallelism (ring attention: wants ICI ring)
  model — attention-head tensor parallelism (innermost: most latency
          sensitive, placed on the fastest ICI dimension)

``jax.experimental.mesh_utils.create_device_mesh`` maps the logical mesh to
the physical topology so nearest-neighbour ``ppermute`` on ``seq`` rides ICI
links; for multi-host slices initialize with ``jax.distributed`` first
(engine-level init in tpu_flash.parallel.multihost).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from tpu_flash.core.config import MeshConfig

AXIS_ORDER = ("data", "seq", "model")


def build_mesh(
    config: MeshConfig, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if config.num_devices > len(devices):
        raise ValueError(
            f"mesh needs {config.num_devices} devices; {len(devices)} present"
        )
    devices = devices[: config.num_devices]
    shape = (config.data, config.seq, config.model)
    try:
        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        # CPU / virtual devices: no physical topology to optimize.
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXIS_ORDER)


def mesh_for(num_devices: int) -> Mesh:
    """A reasonable default factorization for n devices: ring-friendly seq
    axis when n allows, model innermost, data outermost."""
    n = num_devices
    seq = 2 if n % 2 == 0 and n >= 4 else 1
    rem = n // seq
    data = 2 if rem % 2 == 0 and rem >= 4 else 1
    model = rem // data
    return build_mesh(MeshConfig(data=data, model=model, seq=seq))


def shard_head_slice(vals, num_local: int, axis_name: str):
    """Slice a per-head array (sinks/ALiBi slopes, [num_heads_global]) to
    this shard's contiguous head range inside a shard_map over
    ``axis_name``. Shared by ring/Ulysses (models/transformer.py keeps its
    own model-facing variant, alibi_for)."""
    import jax

    if vals is None:
        return None
    if vals.shape[0] == num_local:
        return vals
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice(vals, (idx * num_local,), (num_local,))
