"""Device-mesh construction for spatial decomposition.

The reference chooses its 3-D processor grid by minimizing subdomain
surface area over all factorizations of nprocs (ref/comm.cpp:86-126). We
reproduce that to shape the `jax.sharding.Mesh`; halo traffic then rides
ICI neighbor links exactly like the MPI swap plan rode the Cartesian
communicator.
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh


def min_surface_grid(nprocs: int, prd) -> tuple[int, int, int]:
    """Factorize nprocs into (px, py, pz) minimizing subdomain surface
    (comm.cpp:86-126)."""
    prd = np.asarray(prd, dtype=float)
    area = (prd[0] * prd[1], prd[0] * prd[2], prd[1] * prd[2])
    best = None
    best_surf = np.inf
    for px in range(1, nprocs + 1):
        if nprocs % px:
            continue
        rem = nprocs // px
        for py in range(1, rem + 1):
            if rem % py:
                continue
            pz = rem // py
            surf = area[0] / px / py + area[1] / px / pz + area[2] / py / pz
            if surf < best_surf:
                best_surf = surf
                best = (px, py, pz)
    return best


def make_mesh(devices, prd, grid: tuple[int, int, int] | None = None) -> Mesh:
    """3-D mesh over `devices` shaped by min-surface factorization.

    Axis names ('x', 'y', 'z') correspond to the box dimensions the axis
    decomposes.
    """
    n = len(devices)
    if grid is None:
        grid = min_surface_grid(n, prd)
    px, py, pz = grid
    assert px * py * pz == n, (grid, n)
    dev = np.asarray(devices).reshape(pz, py, px)
    return Mesh(dev, axis_names=("z", "y", "x"))
