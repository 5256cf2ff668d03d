"""Device-mesh helpers for multi-chip runs."""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_names=('x',), shape=None, devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    :param axis_names: mesh axis names, e.g. ('x',) or ('data', 'x').
    :param shape: per-axis sizes; None -> all devices on the first axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f'mesh shape {shape} does not use all {n} devices')
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def factor_devices(n: int):
    """Factor n into a near-square 2-D mesh shape (rows, cols)."""
    best = (n, 1)
    for rows in range(1, int(np.sqrt(n)) + 1):
        if n % rows == 0:
            best = (n // rows, rows)
    return best
