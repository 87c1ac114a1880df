"""Device-mesh construction helpers.

The reference is strictly single-device (SURVEY.md §2: no collectives of any
kind); multi-chip contraction is an additive capability of this framework.
The mesh model follows the standard JAX recipe: named axes, shardings
annotated at function boundaries, XLA/shard_map inserting collectives that
ride the ICI.
"""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes, devices=None):
    """Build a :class:`jax.sharding.Mesh` from ``{"axis": size}`` specs.

    Args:
        axis_sizes: ordered mapping of axis name to size, e.g.
            ``{"dp": 4, "sp": 2}``.  The product must equal the device count.
        devices: optional explicit device list (defaults to all devices).

    Returns:
        A Mesh with the requested named axes.
    """
    if devices is None:
        devices = jax.devices()
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(
            f"Mesh axes {dict(axis_sizes)} need {total} devices, "
            f"got {len(devices)}"
        )
    grid = np.asarray(devices).reshape(sizes)
    return Mesh(grid, names)
