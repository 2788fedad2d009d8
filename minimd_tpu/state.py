"""The MD state pytree (the reference's Atom class, ref/atom.h:47, recast
as fixed-capacity functional state)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .cells import CellGeometry, rebin, sentinel_positions


class MDState(NamedTuple):
    """Cell-major padded atom state, SoA layout (coordinate-major: the
    lane axis is the long slot axis, which is what the TPU wants).
    Slot i belongs to cell i // C."""

    x: jax.Array       # (3, M) positions; sentinels in empty slots
    v: jax.Array       # (3, M) velocities; zero in empty slots
    f: jax.Array       # (3, M) forces; zero in empty slots
    typ: jax.Array     # (M,)  int32 atom types
    valid: jax.Array   # (M,)  bool occupancy mask
    overflow: jax.Array  # () int32: cumulative cell-capacity overflows


def init_state(x_np: np.ndarray, v_np: np.ndarray, typ_np: np.ndarray,
               geom: CellGeometry, dtype=jnp.float32) -> MDState:
    """Pad host arrays to capacity and sort into the cell layout."""
    n = len(x_np)
    M = geom.nslots
    if n > M:
        raise ValueError(f"{n} atoms exceed cell layout capacity {M}")

    x = sentinel_positions(M, dtype)
    x = x.at[:, :n].set(jnp.asarray(np.asarray(x_np).T, dtype=dtype))
    v = jnp.zeros((3, M), dtype).at[:, :n].set(jnp.asarray(np.asarray(v_np).T, dtype=dtype))
    typ = jnp.zeros((M,), jnp.int32).at[:n].set(jnp.asarray(typ_np, dtype=jnp.int32))
    valid = jnp.zeros((M,), bool).at[:n].set(True)

    x, v, typ, valid, ovf = rebin(x, v, typ, valid, geom)
    f = jnp.zeros((3, M), dtype)
    return MDState(x=x, v=v, f=f, typ=typ, valid=valid, overflow=ovf)
