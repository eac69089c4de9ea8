"""Device-mesh construction.

The reference has no multi-device support of any kind (SURVEY.md §2.3: no
torch.distributed / NCCL / MPI anywhere). The TPU build scales through
``jax.sharding.Mesh`` + jit/shard_map: pick a mesh, annotate shardings, let
XLA emit the collectives over ICI (intra-slice) / DCN (multi-slice).

Axis conventions used across the framework:
  'data'     — batch-axis data parallelism (the primary scaling axis);
  'ensemble' — the stacked leave-one-specimen-out fold axis
               (util.py:293-377's sequential per-net loop, parallelized);
  'spatial'  — image-row sharding for large-resolution (2x/full-res) frames;
               convolution halo exchange is emitted by the GSPMD partitioner
               (or explicitly via parallel/halo.py's shard_map variant).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    axes: dict[str, int] | None = None,
    devices=None,
) -> Mesh:
    """Build a Mesh from {axis_name: size}.

    Defaults to a 1-D 'data' mesh over all local devices. Sizes must multiply
    to the device count; pass e.g. {'data': 4, 'spatial': 2} on 8 devices.
    For multi-slice (DCN-connected) topologies put the slowest-varying axis
    first — jax orders ``jax.devices()`` slice-major, so leading mesh axes
    map to DCN and trailing axes ride ICI.
    """
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    assert int(np.prod(sizes)) == len(devices), (
        "mesh axes {} must cover {} devices".format(axes, len(devices))
    )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)
