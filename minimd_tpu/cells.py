"""Cell (bin) geometry and the sort-based binning pipeline.

This replaces the reference's Neighbor class (ref/neighbor.cpp) with a
TPU-native design:

- Atoms live in a fixed-capacity, cell-major padded layout: slot
  `cell*C + r` holds the r-th atom of `cell`; empty slots hold far-away
  sentinel positions so they fall out of every cutoff test naturally.
- "Binning" is a stable sort by cell id + scatter (the Kokkos variant's
  scan-based binning, kokkos/neighbor.cpp:415-456, recast as lax.sort) —
  and doubles as the reference's `Atom::sort` locality sort for free.
- The neighbor *stencil* (which cells can contain interaction partners,
  ref/neighbor.cpp:405-440 + bindist :456-482) becomes a per-cell candidate
  table `cand_cell` plus periodic image shifts `cand_shift`, computed once
  on the host. Single-device runs need no ghost atoms at all: periodicity
  is folded into the shifts.

The skin guarantee is identical to the reference's: as long as no atom moves
more than skin/2 between rebinnings, the frozen cell assignment covers the
exact same pair set as a frozen Verlet list built with cutneigh
(ref/neighbor.cpp:79-213).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_FACTOR = 0.999  # stencil safety factor (ref/neighbor.cpp:36 FACTOR)

# Sentinel coordinates for empty slots: far from the box and from each other,
# so empty-empty and empty-real pairs always fail the cutoff test.
_SENTINEL_BASE = 1.0e6
_SENTINEL_SPACING = 1.0e3


@dataclasses.dataclass(frozen=True)
class CellGeometry:
    """Static (host-side) cell decomposition of a periodic box."""

    nb: tuple[int, int, int]          # cells per dimension
    binsize: tuple[float, float, float]
    capacity: int                     # C: max atoms per cell (padded)
    stencil: np.ndarray               # (S, 3) int offsets
    cand_cell: np.ndarray             # (ncells, S) int32 candidate cell ids
    cand_shift: np.ndarray            # (ncells, S, 3) int8 periodic wrap counts
    prd: tuple[float, float, float]
    # Grid-origin offset: crystal planes can align exactly with cell
    # boundaries (the default FCC deck does), which doubles the max cell
    # occupancy. The offset de-aligns them; atoms that fall left of the
    # offset are stored "unfolded" at x+prd so each cell's contents stay
    # spatially contiguous and the stencil shifts remain valid.
    offset: tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def ncells(self) -> int:
        return self.nb[0] * self.nb[1] * self.nb[2]

    @property
    def nslots(self) -> int:
        return self.ncells * self.capacity

    @property
    def nstencil(self) -> int:
        return self.stencil.shape[0]


def _bindist_sq(off: np.ndarray, binsize: np.ndarray) -> np.ndarray:
    """Closest distance² between cell (0,0,0) and cell at integer offset.

    (ref/neighbor.cpp:456-482)
    """
    d = (np.abs(off) - 1).clip(min=0) * binsize
    return (d * d).sum(axis=-1)


def build_stencil(binsize: np.ndarray, cutneigh: float) -> np.ndarray:
    """Integer cell offsets whose closest corner is within cutneigh.

    (full-list stencil, ref/neighbor.cpp:405-440; we always build full
    stencils — Newton half-lists are a scatter optimization that does not
    pay on TPU, see SURVEY.md §2.4 P7.)
    """
    nxt = (cutneigh / binsize).astype(int)
    nxt += (nxt * binsize < _FACTOR * cutneigh).astype(int)
    rng = [np.arange(-n, n + 1) for n in nxt]
    dz, dy, dx = np.meshgrid(rng[2], rng[1], rng[0], indexing="ij")
    off = np.stack([dx.ravel(), dy.ravel(), dz.ravel()], axis=1)
    keep = _bindist_sq(off, binsize) < cutneigh * cutneigh
    return off[keep].astype(np.int32)


def choose_grid(prd, cutneigh: float, nbins=None) -> tuple[int, int, int]:
    """Default: largest grid with binsize >= cutneigh (27-cell stencil),
    which maximizes density of useful pairs in the dense kernel."""
    if nbins is not None:
        return tuple(int(max(1, b)) for b in nbins)
    return tuple(int(max(1, np.floor(p / cutneigh))) for p in prd)


def autotune_grid(prd, cutneigh: float, positions: np.ndarray,
                  solid: bool = False, multiple_of=None):
    """Pick the cell grid minimizing the dense-kernel cost model
    ncells * nstencil * C^2 over a few candidate resolutions.

    Coarser grids can win when they are commensurate with the data's
    structure (lower padded capacity C); the cost is evaluated with the
    actual initial occupancy, so the choice is data-driven.

    multiple_of: per-dim divisibility constraint (the mesh grid of a
    spatial decomposition — each device must own a whole number of
    cells). Candidates snap DOWN to the nearest multiple (binsize only
    grows, so binsize >= cutneigh is preserved); on a 1-device mesh this
    is the identity and the sharded loop rides exactly the single-device
    grid (the pre-r5 choose_grid default cost the sharded-on-1-chip path
    ~25% at 131k: 19^3 vs the autotuned 17^3). Caveat: snapping can
    surface marginal candidates the coarse frac sweep skips on purpose
    (the nb=32 864k trap in the NOTE below); the rebin overflow counter +
    grow-and-replay keep such a choice correct, just slower."""
    prd = np.asarray(prd, dtype=np.float64)
    base = np.maximum(1, np.floor(prd / cutneigh).astype(int))
    mult = (np.maximum(1, np.asarray(multiple_of, dtype=int))
            if multiple_of is not None else None)
    best, best_cost = None, np.inf
    tried = set()
    # NOTE (measured negative): a dense sweep hitting EVERY integer grid
    # found nb=32 at 864k (vs 33 here) with 9% lower model cost at C=40 —
    # but the capacity-fluctuation tail is real: the liquid overflowed
    # C=40 within ~500 steps, grow-and-retry went to C=50, LANE jumped
    # 128 -> 256 and throughput HALVED (24.3 vs 48.2 Matom-steps/s).
    # Grids whose expected occupancy need sits within ~1 atom of the
    # 128-lane capacity boundary are traps the cost model cannot see
    # (the t=0 crystal counts underestimate liquid transients), so the
    # coarse sweep's skipping of marginal intermediate grids is kept.
    for frac in (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65, 0.6):
        nb = tuple(int(max(1, np.floor(b * frac))) for b in base)
        if mult is not None:
            nb = tuple(int(max(m, (b // m) * m)) for b, m in zip(nb, mult))
        if nb in tried:
            continue
        tried.add(nb)
        nbv = np.array(nb)
        binsize = prd / nbv
        stencil = build_stencil(binsize, cutneigh)
        offs = _best_offsets(np.asarray(positions), prd, nbv)
        ids = _coords_to_cell_np(positions, prd, nbv, binsize, offs)
        ncells = int(nbv.prod())
        counts = np.bincount(ids, minlength=ncells)
        cap = pick_capacity(counts, len(positions) / ncells, solid=solid)
        # cost = dense pair work including the VPU lane padding of the
        # Pallas kernel (the candidate lane block is 3*C rounded up to 128)
        lane = -(-3 * cap // 128) * 128
        cost = ncells * len(stencil) * cap * lane / 3.0
        if cost < best_cost:
            best, best_cost = nb, cost
    return best


def pick_capacity(counts: np.ndarray, mean_density_per_cell: float,
                  nsamples: float = 4e6, solid: bool = False) -> int:
    """Cell capacity with headroom for density fluctuations over the run.

    Extreme-value model calibrated on the equilibrated LJ benchmark (cell
    occupancy sigma ~ sqrt(0.1*mean); observed running max = mean + 9 at
    mean 32 over ~1e5 cell-rebin samples): expected running max over
    ~nsamples cell-rebin draws plus a 2-sigma guard. Every rebin still
    counts overflows and the run fails loudly if one occurs.
    """
    mean = mean_density_per_cell
    base = int(counts.max())
    if solid and base == int(counts.min()):
        # Perfectly uniform occupancy on a lattice-commensurate grid, and
        # the caller vouches the system stays crystalline (the EAM deck's
        # case: solid Cu at 600 K, cells an integer number of unit cells).
        # Occupancy is then pinned by the lattice — vibrations move at most
        # a few boundary atoms per cell — so the liquid fluctuation model
        # below would over-allocate past the 3C <= 128 lane boundary and
        # double the kernel cost. If the vouch is wrong the rebin overflow
        # counter still fails the run loudly.
        cap = base + max(4, base // 8)
    else:
        sigma = np.sqrt(max(mean, 1.0) * 0.1)
        expected_max = mean + sigma * np.sqrt(2.0 * np.log(nsamples))
        cap = int(np.ceil(max(base + 4, expected_max + 2.0 * sigma)))
    return ((cap + 7) // 8) * 8  # round to sublane multiple


# Capacity-growth policy shared by every overflow-recovery path
# (Simulation.run / Simulation.run_timed / ShardedSimulation.run — the
# reference's neighbor-bin resize semantics, neighbor.cpp:186-208,241-261).
MAX_CAPACITY = 4 * 128

# Grid-size threshold (total cell slots M) above which the step-glue
# relayout idioms pay: the per-coordinate output stack (ops/lj_pallas
# OUT_STACK), the statically-noev plain step, and the per-coordinate
# (M,) scan carry (sim NOEV_FASTPATH / TRIPLE_CARRY). All three are
# bit-identical reformulations measured BOTH ways on the chip
# (2026-08-19, same-session A/B, scripts/exp_carry.py): at 864k
# (M=1.44M) they add up to +2.9% (45.43 -> 46.75 Matom-steps/s); at
# 131k (M=135k) EACH costs ~5% (53.4 -> 50.2-51.2) — small steps sit
# on a scheduling/fusion path the restructured programs fall off.
LARGE_GRID_SLOTS = 500_000


def next_capacity(capacity: int) -> int:
    """Geometric growth: each retry recompiles the fused scan (minutes on
    the remote TPU toolchain), so grow ~25% per retry rather than +8."""
    return capacity + max(8, capacity // 4)


def _best_offsets(x: np.ndarray, prd: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """Per-dimension grid offsets maximizing every atom's clearance from the
    nearest cell boundary.

    Crystal planes that sit exactly on a cell boundary make the assignment
    dtype-dependent (f32 rounds different planes to different sides) and
    unbalance the occupancy, which inflates the padded capacity. Maximizing
    the minimum boundary clearance fixes both at once.
    """
    offs = np.zeros(3)
    n = len(x)
    sample = x if n <= 65536 else x[:: n // 65536 + 1]
    for d in range(3):
        bs = prd[d] / nb[d]
        best, bestclear = 0.0, -1.0
        for frac in np.arange(16) / 16.0:
            off = frac * bs
            r = np.mod(sample[:, d] - off, bs)
            clear = np.minimum(r, bs - r).min()
            if clear > bestclear:
                best, bestclear = off, clear
        offs[d] = best
    return offs


def build_geometry(
    prd,
    cutneigh: float,
    positions: np.ndarray,
    nbins=None,
    capacity: int | None = None,
    solid: bool = False,
) -> CellGeometry:
    """Construct the static cell geometry for a box and initial positions.

    solid=True vouches the system stays crystalline (see pick_capacity) —
    set by the EAM path, whose shipped decks are solid Cu."""
    prd = np.asarray(prd, dtype=np.float64)
    if nbins is None:
        nb = autotune_grid(prd, cutneigh, positions, solid=solid)
    else:
        nb = choose_grid(prd, cutneigh, nbins)
    nbx, nby, nbz = nb
    binsize = prd / np.array(nb, dtype=np.float64)
    stencil = build_stencil(binsize, cutneigh)
    S = stencil.shape[0]
    ncells = nbx * nby * nbz

    # candidate cell table + wrap shifts (vectorized over cells x stencil)
    cx = np.arange(nbx)
    cz, cy, cx = np.meshgrid(np.arange(nbz), np.arange(nby), np.arange(nbx), indexing="ij")
    centers = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], axis=1)  # (ncells,3) x,y,z
    tgt = centers[:, None, :] + stencil[None, :, :]                    # (ncells,S,3)
    nbv = np.array(nb)
    wraps = np.floor_divide(tgt, nbv)                                  # image count
    cell_xyz = tgt - wraps * nbv
    cand_cell = (cell_xyz[..., 2] * nby + cell_xyz[..., 1]) * nbx + cell_xyz[..., 0]
    offset = _best_offsets(np.asarray(positions), prd, nbv)
    if capacity is None:
        ids = _coords_to_cell_np(positions, prd, nbv, binsize, offset)
        counts = np.bincount(ids, minlength=ncells)
        mean_per_cell = len(positions) / ncells
        capacity = pick_capacity(counts, mean_per_cell, solid=solid)

    return CellGeometry(
        nb=(nbx, nby, nbz),
        binsize=tuple(binsize),
        capacity=int(capacity),
        stencil=stencil,
        cand_cell=cand_cell.astype(np.int32),
        cand_shift=wraps.astype(np.int8),
        prd=tuple(prd),
        offset=tuple(offset),
    )


def _coords_to_cell_np(x: np.ndarray, prd, nbv, binsize, offset=(0.0, 0.0, 0.0)) -> np.ndarray:
    xw = x - np.floor(x / prd) * prd
    g = xw - np.asarray(offset)
    g = np.where(g < 0, g + prd, g)
    idx = np.minimum((g / binsize).astype(np.int64), nbv - 1)
    return (idx[:, 2] * nbv[1] + idx[:, 1]) * nbv[0] + idx[:, 0]


# --------------------------------------------------------------------------
# jittable pieces
# --------------------------------------------------------------------------

def sentinel_positions(nslots: int, dtype) -> jax.Array:
    """(3, nslots) SoA sentinel coordinates for empty slots."""
    base = jnp.arange(nslots, dtype=dtype) * _SENTINEL_SPACING + _SENTINEL_BASE
    return jnp.stack([base, jnp.zeros_like(base), jnp.zeros_like(base)], axis=0)


def pbc_wrap(x: jax.Array, prd) -> jax.Array:
    """Wrap (3, M) coordinates into [0, prd) with the reference's two-test
    ordering guarantee (ref/atom.cpp:102-122)."""
    prd = jnp.asarray(prd, dtype=x.dtype)[:, None]
    x = jnp.where(x < 0.0, x + prd, x)
    x = jnp.where(x >= prd, x - prd, x)
    return x


def coord_to_cell(xw: jax.Array, geom: CellGeometry) -> tuple[jax.Array, jax.Array]:
    """Cell id (row-major, x-fastest) + storage ("unfolded") coordinates.

    Coordinates left of the grid offset belong to the last cell of the
    dimension and are stored at x+prd so the cell's contents are spatially
    contiguous (see CellGeometry.offset)."""
    nb = jnp.asarray(geom.nb, dtype=jnp.int32)
    prd = jnp.asarray(geom.prd, dtype=xw.dtype)[:, None]
    off = jnp.asarray(geom.offset, dtype=xw.dtype)[:, None]
    inv = jnp.asarray(1.0 / np.asarray(geom.binsize), dtype=xw.dtype)[:, None]
    g = xw - off
    xs = jnp.where(g < 0, xw + prd, xw)
    g = jnp.where(g < 0, g + prd, g)
    idx = jnp.clip((g * inv).astype(jnp.int32), 0, nb[:, None] - 1)
    return (idx[2] * nb[1] + idx[1]) * nb[0] + idx[0], xs


def rebin_lean(x, v, typ, geom: CellGeometry):
    """Sentinel-derived rebin for the hot loop: validity is recovered from
    the sentinel coordinates instead of being carried (empty slots always
    hold sentinels by construction). Returns (x, v, typ, overflow)."""
    M = geom.nslots
    ncells = geom.ncells
    C = geom.capacity
    dtype = x.dtype

    valid = x[0] < 0.5 * _SENTINEL_BASE
    xw = pbc_wrap(x, geom.prd)
    cid, xs = coord_to_cell(xw, geom)
    cid = jnp.where(valid, cid, jnp.int32(ncells))

    order = jnp.argsort(cid, stable=True)
    sort_cid = cid[order]
    starts = jnp.searchsorted(sort_cid, jnp.arange(ncells + 1, dtype=jnp.int32))
    rank = jnp.arange(M, dtype=jnp.int32) - starts[jnp.clip(sort_cid, 0, ncells)]
    ok = (sort_cid < ncells) & (rank < C)
    dest = jnp.where(ok, sort_cid * C + rank, M)

    new_x = sentinel_positions(M, dtype).at[:, dest].set(xs[:, order], mode="drop")
    new_v = jnp.zeros((3, M), dtype).at[:, dest].set(v[:, order], mode="drop")
    new_t = jnp.zeros((M,), jnp.int32).at[dest].set(typ[order], mode="drop")
    overflow = jnp.sum((sort_cid < ncells) & (rank >= C))
    return new_x, new_v, new_t, overflow


def rebin(x, v, typ, valid, geom: CellGeometry):
    """Wrap PBC, sort atoms into the cell-major padded layout.

    Returns (x, v, typ, valid, overflow) with every array rebuilt in cell
    order. `overflow` counts atoms that did not fit in their cell (tests
    assert it stays 0; the capacity headroom makes this astronomically rare,
    mirroring the reference's retry-grow loop in spirit).
    """
    M = geom.nslots
    ncells = geom.ncells
    C = geom.capacity
    dtype = x.dtype

    xw = pbc_wrap(x, geom.prd)
    cid, xs = coord_to_cell(xw, geom)
    cid = jnp.where(valid, cid, jnp.int32(ncells))

    order = jnp.argsort(cid, stable=True)
    sort_cid = cid[order]
    starts = jnp.searchsorted(sort_cid, jnp.arange(ncells + 1, dtype=jnp.int32))
    rank = jnp.arange(M, dtype=jnp.int32) - starts[jnp.clip(sort_cid, 0, ncells)]

    ok = (sort_cid < ncells) & (rank < C)
    dest = jnp.where(ok, sort_cid * C + rank, M)  # M == out-of-range -> drop

    new_x = sentinel_positions(M, dtype).at[:, dest].set(xs[:, order], mode="drop")
    new_v = jnp.zeros((3, M), dtype).at[:, dest].set(v[:, order], mode="drop")
    new_t = jnp.zeros((M,), jnp.int32).at[dest].set(typ[order], mode="drop")
    new_valid = jnp.zeros((M,), bool).at[dest].set(valid[order], mode="drop")

    overflow = jnp.sum((sort_cid < ncells) & (rank >= C))
    return new_x, new_v, new_t, new_valid, overflow


def rebin_pull(cid, chans, geom: CellGeometry, nb_local=None,
               pad_exchanges=None):
    """One-hot pull placement core (rebin_local's inner loop, shared with
    the sharded migration's local placement, parallel/comm.py).

    cid: (M,) int32 per-slot cell id in this grid's row-major numbering
    (-1 marks empty/leaver slots); chans: list of (M,) float channels to
    relocate. The pull window is the ±1-cell neighborhood: periodic
    self-wrap by default, or per-axis `pad_exchanges` hooks (the sharded
    caller pads decomposed axes with DEAD cells — cross-device movers
    travel as migration buffers, never through the pull, and self-wrap
    would alias cells on spans < 3).

    Returns (outs, counts, cap_overflow): outs is one (ncells, C) array
    per channel in (stencil-offset, slot) lexicographic within-cell
    order, counts the per-cell occupancies, cap_overflow the number of
    atoms that did not fit their cell.
    """
    from .ops.pairgrid import pad_grid_int, stencil_slice

    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    nb = (nbx, nby, nbz)
    C = geom.capacity
    ncells = nbx * nby * nbz
    dtype = chans[0].dtype

    cid_pad = pad_grid_int(cid, geom, 1, nb_local=nb,
                           exchanges=pad_exchanges)
    chan_pad = [pad_grid_int(c, geom, 1, nb_local=nb,
                             exchanges=pad_exchanges) for c in chans]

    cell_ids = jnp.arange(ncells, dtype=jnp.int32).reshape(nbz, nby, nbx)
    offsets = [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
               for dx in (-1, 0, 1)]

    out = [jnp.full((ncells, C), 0.0, dtype) for _ in chans]
    base = jnp.zeros((ncells, 1), jnp.int32)
    rank_row = jnp.arange(C, dtype=jnp.int32)

    for off in offsets:
        cand_cid = stencil_slice(cid_pad, off, 1, nb).reshape(ncells, C)
        sel = cand_cid == cell_ids.reshape(ncells, 1)
        rank = base + jnp.cumsum(sel, axis=-1, dtype=jnp.int32) - 1
        onehot = (sel[:, None, :]
                  & (rank[:, None, :] == rank_row[None, :, None])).astype(dtype)
        for i, cp in enumerate(chan_pad):
            vals = stencil_slice(cp, off, 1, nb).reshape(ncells, C)
            out[i] = out[i] + jax.lax.dot_general(
                onehot, vals,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dtype,
            )
        base = base + jnp.sum(sel, axis=-1, dtype=jnp.int32)[:, None]

    counts = base[:, 0]
    cap_ovf = jnp.sum(jnp.maximum(counts - C, 0)).astype(jnp.int32)
    return out, counts, cap_ovf


def rebin_local(x, v, typ, geom: CellGeometry):
    """Locality-aware rebin: pull each cell's new occupants from its 27-cell
    neighborhood with exact one-hot contractions — no global sort, no
    gathers, no scatters (all three are slow on TPU; the sort-based rebin
    cost ~276 ms at 864k atoms, dominated by M-sized permutations).

    Correctness rests on the same skin guarantee as the force kernels: an
    atom moves at most one cell between rebinnings. Atoms that moved
    further are counted in `overflow` (the run fails loudly), as are cells
    whose new occupancy exceeds the capacity.

    Returns (x, v, typ, overflow) like rebin_lean; the within-cell atom
    order is (stencil-offset, slot) lexicographic — a different (equally
    valid) order than the global sort produces.
    """
    nbx, nby, nbz = geom.nb
    C = geom.capacity
    M = geom.nslots
    dtype = x.dtype

    valid = x[0] < 0.5 * _SENTINEL_BASE
    xw = pbc_wrap(x, geom.prd)
    cid, xs = coord_to_cell(xw, geom)
    cid = jnp.where(valid, cid, jnp.int32(-1))

    # movement guard: new cell within +-1 (with wrap) of the slot's cell
    old = jnp.arange(M, dtype=jnp.int32) // C
    def cxyz(c):
        return c % nbx, (c // nbx) % nby, c // (nbx * nby)
    ox_, oy_, oz_ = cxyz(old)
    nx_, ny_, nz_ = cxyz(jnp.maximum(cid, 0))
    def near(a, b, n):
        d = jnp.abs(a - b)
        return jnp.minimum(d, n - d) <= 1
    ok_near = near(ox_, nx_, nbx) & near(oy_, ny_, nby) & near(oz_, nz_, nbz)
    overflow = jnp.sum(valid & ~ok_near).astype(jnp.int32)

    # channels to relocate: stored coords, velocities, type (exact in f32
    # for the int range we use), validity
    chans = [xs[0], xs[1], xs[2], v[0], v[1], v[2],
             typ.astype(dtype)]

    out, counts, cap_ovf = rebin_pull(cid, chans, geom)
    overflow = overflow + cap_ovf

    rank_row = jnp.arange(C, dtype=jnp.int32)
    # sentinel placement for unoccupied slots is restored here
    occ = (rank_row[None, :] < counts[:, None]).reshape(M)
    sent = sentinel_positions(M, dtype)
    new_x = jnp.stack([jnp.where(occ, out[d].reshape(M), sent[d])
                       for d in range(3)], axis=0)
    new_v = jnp.stack([jnp.where(occ, out[3 + d].reshape(M), 0.0)
                       for d in range(3)], axis=0)
    new_t = jnp.where(occ, out[6].reshape(M).astype(jnp.int32), 0)
    return new_x, new_v, new_t, overflow
