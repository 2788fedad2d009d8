"""Halo-padded cell-grid machinery shared by the pair-force kernels.

The force kernels operate on a (Z+2h, Y+2h, X+2h, C) per-coordinate SoA grid
("padded grid"): interior cells hold the atoms, halo cells hold periodic
images (single device) or remote neighbors' border cells (multi-chip, via
ppermute — same kernel either way). This is the reference's ghost-atom
machinery (ref/comm.cpp:700-883) recast as dense slab copies: filling the
halo IS `borders`/`communicate`, and it happens dim-by-dim so corner images
are produced exactly like the reference's swap ordering (comm.cpp:739-867).

With the halo in place, every stencil lookup is a *static slice* — no
gathers, no wraps, no scatter anywhere in the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..cells import CellGeometry

# Candidate-pack lowering idiom (read at trace time; module-level so perf
# experiments can A/B both programs in one session — scripts/exp_pack.py).
# "slices": left/right rows are built as two x-axis concats, then
#   lane-concatenated — the inner concats are materialized intermediates
#   in tile-padded (minor dim C=40 -> 3.2x bytes) layout.
# "padded": pad the x axis ONCE (gp = [wrap_l | g | wrap_r], +2 columns),
#   then one 4-part lane concat of plain static slices of gp — the slices
#   are fusible views, so the only materialized arrays are gp and the
#   packed output. Bit-identical values either way (same elements, same
#   shift arithmetic, different lowering; tests/test_lj_trace.py asserts).
# "flat": same as "padded" but the x padding happens in a COLLAPSED
#   (nbz, nby, nbx*C) view — that layout tile-pads to ~1.3x bytes where
#   the 4D (…, nbx, C) forms pad to ~3.7x, so the materialized seg array
#   is ~3x smaller than gp; the per-part minor-dim split reshapes are the
#   gamble (they fuse into the lane concat, or they materialize and lose).
#   MEASURED NEGATIVE: -2.1% vs "padded" at 864k (46.13 vs 47.14,
#   same-session 3-way, 2026-08-20) — the reshapes materialize; the
#   smaller seg does not pay for three relayout copies. Kept as a
#   bit-parity-tested option so the idea isn't re-walked.
# "padded" is the production default: measured same-session A/B
# (scripts/exp_pack.py, 2026-08-19 r5 toolchain) +2.4% whole-step at 131k
# (52.96 -> 54.25 Matom-steps/s) and +0.3% at 864k (46.89 -> 47.04) —
# the intermediates it removes are a larger fraction of the smaller step.
PACK_SRC = "padded"


def halo_extent(geom: CellGeometry) -> int:
    """Stencil reach in cells (1 when binsize >= cutneigh)."""
    return int(np.abs(geom.stencil).max())


def to_padded_soa(x, geom: CellGeometry, h: int, nb_local=None, exchanges=None):
    """(3, M) flat cell-major positions -> 3 padded (Z+2h, Y+2h, X+2h, C)
    coordinate grids with halo images.

    Fills dim-by-dim (x, then y, then z) so edge/corner halos are composed
    images, mirroring the reference's swap ordering (comm.cpp:739-867).

    Single device: every dim is a periodic self-wrap. Multi-chip (spatial
    decomposition): pass `nb_local` = the device's local grid shape and
    `exchanges[grid_axis] = fn(g, coord_dim) -> (lo_halo, hi_halo)` for
    each decomposed axis; the hook receives the (partially padded) local
    grid, slices its own boundary slabs, and trades them with mesh
    neighbors (ppermute) — the reference's borders/communicate
    (comm.cpp:276-317,700-883) as dense slab swaps, including the
    multi-hop plan when the halo is wider than a device's span
    (comm.cpp:150-180 need[]>1). Grid axes are indexed (0=z, 1=y, 2=x).
    """
    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    C = geom.capacity
    prd = geom.prd
    out = []
    for d in range(3):
        g = x[d].reshape(nbz, nby, nbx, C)
        out.append(_pad_halo(g, h, float(prd[d]), d, exchanges))
    return out


def _pad_halo(g, h: int, prd_d: float, coord_dim: int, exchanges=None):
    """Pad a (Z, Y, X, C) scalar grid of coordinate `coord_dim` with a halo
    of width h; periodic image copies along the grid's own spatial axis are
    shifted by ±prd. Axis order in g is (z, y, x, C): spatial axis for
    coordinate d is 2 - d."""
    own_axis = 2 - coord_dim
    for axis in (2, 1, 0):  # x first, then y, then z (reference swap order)
        if exchanges is not None and axis in exchanges:
            # halos come from mesh neighbors (possibly multiple hops); the
            # hook slices what it needs and applies any boundary-crossing
            # coordinate shift itself
            lo, hi = exchanges[axis](g, coord_dim)
        else:
            lo = jnp.take(g, jnp.arange(g.shape[axis] - h, g.shape[axis]),
                          axis=axis)
            hi = jnp.take(g, jnp.arange(0, h), axis=axis)
            if axis == own_axis:
                # python-float shift: weak type preserves the grid dtype
                lo = lo - prd_d
                hi = hi + prd_d
        g = jnp.concatenate([lo, g, hi], axis=axis)
    return g


def pad_grid_int(t, geom: CellGeometry, h: int, nb_local=None, exchanges=None):
    """Pad a (M,) per-slot cell-major array (types, EAM fp, cell ids) with
    a halo: periodic self-copies, or neighbor slabs via `exchanges` hooks
    on decomposed axes (no coordinate shift — these are not positions).
    This is the reference's scalar forward-comm (EAM fp halo,
    force_eam.cpp:851-914) in slab form."""
    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    C = geom.capacity
    g = t.reshape(nbz, nby, nbx, C)
    for axis in (2, 1, 0):
        if exchanges is not None and axis in exchanges:
            lo, hi = exchanges[axis](g, None)
        else:
            lo = jnp.take(g, jnp.arange(g.shape[axis] - h, g.shape[axis]),
                          axis=axis)
            hi = jnp.take(g, jnp.arange(0, h), axis=axis)
        g = jnp.concatenate([lo, g, hi], axis=axis)
    return g


def stencil_slice(Ypad, off, h: int, nb):
    """Static interior-aligned slice of a padded grid at stencil offset
    (ox, oy, oz): result[c] = padded[c + off] for every interior cell c."""
    nbx, nby, nbz = nb
    ox, oy, oz = int(off[0]), int(off[1]), int(off[2])
    return Ypad[h + oz: h + oz + nbz,
                h + oy: h + oy + nby,
                h + ox: h + ox + nbx]


def fused_lane_pack(nb_local, C: int, LANE: int, prd, exchanges, big: float):
    """Shared trace-time machinery of the fused Pallas pair kernels
    (ops/lj_pallas, ops/eam_pallas): per-axis halo-mode selection, the
    lane-packed candidate prologue, and the wrapped/halo'd BlockSpec
    builder. Trace-time only — nothing here runs per step beyond the
    slice-concats XLA compiles from pack_candidates.

    Per-axis halo mode: grid ARRAY axes (0=z, 1=y, 2=x) present in
    `exchanges` are mesh-decomposed -> materialized neighbor halo; absent
    -> periodic wrap in the BlockSpec index maps with in-kernel ±prd
    shifts (the kernels consume the returned dec flags for that).

    Returns (dec, pack_candidates, wrapped_specs):

    - dec = (dec_z, dec_y, dec_x) booleans.
    - pack_candidates(g, c): raw (nbz, nby, nbx, C) grid -> packed
      candidates [x-1 | x | x+1], lane-padded to LANE with `big`
      sentinels, decomposed-axis halos appended. c == 0 gets the
      x-boundary ±prd image fix; c < 0 none (scalar fields, e.g. the EAM
      fp halo — the exchange hooks also key their shift on c).
      Undecomposed x: periodic wrap columns; decomposed x: the two
      columns come from mesh neighbors (the hook applies any boundary
      shift). Then decomposed y/z axes concatenate ppermuted rows OF THE
      PACKED array (y before z, composing corner ghosts like the
      reference's dim-ordered swaps, comm.cpp:739-867). Pure
      slice-concats: a roll+select formulation made XLA spend ~3-4
      ops/element on what is a copy (measured 0.47 ms of the 864k step).
    - wrapped_specs(n_arrays): the nine (dz, dy) single-row BlockSpec
      views of each of n_arrays packed arrays — per-program blocks are
      single rows, so VMEM stays constant at any system size. Wrapped
      axes index ((z+dz-1) % nbz) into the raw-extent array; halo'd axes
      index (z+dz) into the one-row-padded extent.
    """
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbx, nby, nbz = nb_local
    prx = float(prd[0])
    exchanges = exchanges or {}
    dec_z, dec_y, dec_x = (0 in exchanges), (1 in exchanges), (2 in exchanges)

    def pack_candidates(g, c):
        if dec_x:
            wrap_l, wrap_r = exchanges[2](g, c)
        else:
            wrap_l = g[:, :, nbx - 1:]
            wrap_r = g[:, :, :1]
            if c == 0:
                wrap_l = wrap_l - prx
                wrap_r = wrap_r + prx
        if PACK_SRC == "padded":
            gp = jnp.concatenate([wrap_l, g, wrap_r], axis=2)
            parts = [gp[:, :, 0:nbx], gp[:, :, 1:nbx + 1],
                     gp[:, :, 2:nbx + 2]]
        elif PACK_SRC == "flat":
            r2 = g.reshape(nbz, nby, nbx * C)
            seg = jnp.concatenate(
                [wrap_l.reshape(nbz, nby, C), r2,
                 wrap_r.reshape(nbz, nby, C)], axis=2)
            parts = [seg[:, :, k * C: k * C + nbx * C]
                     .reshape(nbz, nby, nbx, C) for k in (0, 1, 2)]
        else:
            left = jnp.concatenate([wrap_l, g[:, :, :nbx - 1]], axis=2)
            right = jnp.concatenate([g[:, :, 1:], wrap_r], axis=2)
            parts = [left, g, right]
        if LANE > 3 * C:
            parts.append(jnp.full((nbz, nby, nbx, LANE - 3 * C), big,
                                  g.dtype))
        j = jnp.concatenate(parts, axis=-1)
        for axis in (1, 0):   # y then z: corner ghosts compose dim-by-dim
            if axis in exchanges:
                lo, hi = exchanges[axis](j, c)
                j = jnp.concatenate([lo, j, hi], axis=axis)
        return j

    zmap = ((lambda z, dz: z + dz) if dec_z
            else (lambda z, dz: (z + dz - 1) % nbz))
    ymap = ((lambda y, dy: y + dy) if dec_y
            else (lambda y, dy: (y + dy - 1) % nby))

    def wrapped_specs(n_arrays: int):
        return [
            pl.BlockSpec((1, 1, nbx, LANE),
                         functools.partial(
                             lambda dz, dy, z, y: (zmap(z, dz), ymap(y, dy),
                                                   0, 0),
                             dz, dy),
                         memory_space=pltpu.VMEM)
            for _a in range(n_arrays) for dz in (0, 1, 2) for dy in (0, 1, 2)
        ]

    return (dec_z, dec_y, dec_x), pack_candidates, wrapped_specs
