"""Pallas TPU kernel for the LJ cell-grid force.

Layout strategy (the whole point of hand-writing this):

- XLA pre-packs, per cell row (z, y), the candidate block J[z,y] =
  [row shifted by dx=-1 | dx=0 | dx=+1] of shape (nbx, 3C), lane-padded to
  a 128 multiple with far-away sentinels. With the benchmark deck's
  natural C=40 this gives 120/128 = 94% lane occupancy, vs ~31% for the
  XLA (C_i, C_j) pair layout.
- Grid = (nbz, nby). Each program sees just the three z-slabs it needs
  (the same padded array bound through three BlockSpecs at dz=-1/0/+1), so
  VMEM holds a few slabs, not the whole box — Pallas double-buffers the
  slab DMAs across grid steps and the kernel scales to arbitrary system
  sizes.
- The pair tensor per (dy, dz) stencil row is (nbx, C_i, LANE): i atoms on
  sublanes, candidates on lanes, fully fused in VMEM.

Kernel math is unchanged from the reference (force_lj.cpp:420-430);
parameters must be type-uniform (the shipped decks' case — the XLA grid
path handles per-type tables).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cells import CellGeometry
from .lj import LJParams
from .pairgrid import halo_extent, to_padded_soa

_BIG = 5.0e5  # sentinel coordinate for masked lane padding


def _round_up(n, m):
    return (n + m - 1) // m * m


def make_lj_force_pallas(geom: CellGeometry, params: LJParams,
                         dtype=jnp.float32, interpret: bool = False,
                         nb_local=None, exchanges=None):
    """(force_ev, force_noev) closures: (x, typ) -> (f, eng, virial).

    Single device: the fused kernel (periodic z/y wrap in the BlockSpec
    index maps, candidates roll-packed straight from the raw grid — no
    halo-padded grid in HBM). Sharded (nb_local/exchanges given): halos
    come from mesh neighbors via the exchange hooks, so the padded-grid +
    packed-candidate XLA prologue remains (same contract as
    ops/lj_grid.make_lj_force_grid)."""
    if nb_local is None and exchanges is None:
        return _make_lj_force_pallas_fused(geom, params, dtype=dtype,
                                           interpret=interpret)
    return _make_lj_force_pallas_packed(geom, params, dtype=dtype,
                                        interpret=interpret,
                                        nb_local=nb_local, exchanges=exchanges)


def _make_lj_force_pallas_fused(geom: CellGeometry, params: LJParams,
                                dtype=jnp.float32, interpret: bool = False):
    """Single-device kernel with the periodic halo folded out of the data
    path. Two pieces:

    - XLA prologue: lane-pack candidates [x-1 | x | x+1] straight from the
      raw (nbz, nby, nbx, C) grid via jnp.roll (one fused elementwise pass;
      the x-boundary ±prd image fix rides the same pass). No halo-padded
      grid is ever materialized — the reference's ghost-atom machinery
      (comm.cpp:700-883) has no analog left in HBM.
    - Kernel: the (dz, dy) stencil rows are fetched at wrapped grid rows
      ((z+dz) % nbz in the BlockSpec index map) and the matching ±prd
      coordinate shifts are added in-kernel as program-id-derived scalars
      (the reference's PBC flags on boundary ranks, comm.cpp:208-269).

    An earlier variant packed candidates fully in-kernel from (nbx, C)
    rows (rolls + lane concats in VMEM): measured SLOWER than the XLA
    prologue (45.7 vs 52.6 Matom-steps/s at 131k) — narrow 40-lane row
    loads triple the vreg traffic and tpu.concatenate at unaligned lane
    offsets costs more than the HBM pass it saves. Negative result kept
    here so it isn't re-walked.

    Second negative: deferring the cross-lane reductions (accumulate
    fc*d in (nbx, C, LANE) lane space across the 9 stencil rows, reduce
    ONCE per coordinate at the end — 27 -> 3 reductions/program) measured
    41.0 vs 58.7 Matom-steps/s at 131k. The three loop-carried full-width
    accumulators become VMEM spill traffic every row, while Mosaic's
    per-row lane reduction costs about one op per element — cheaper than
    the full-width add that replaces it. Keep the per-row `jnp.sum`s.
    """
    assert params.uniform, "pallas LJ path requires type-uniform parameters"
    assert dtype == jnp.float32, "pallas LJ kernel is f32"
    h = halo_extent(geom)
    assert h == 1, "pallas LJ kernel assumes binsize >= cutneigh (h == 1)"

    nbx, nby, nbz = geom.nb
    C = geom.capacity
    M = nbx * nby * nbz * C
    LANE = _round_up(3 * C, 128)
    cutsq = float(params.cutforcesq[0])
    eps = float(params.epsilon[0])
    sig6 = float(params.sigma6[0])
    prx, pry, prz = (float(p) for p in geom.prd)

    def kernel(*refs, evflag: bool):
        # refs: 27 packed-candidate rows (coord-major, then (dz, dy)
        # row-major), each (1, 1, nbx, LANE) fetched at the wrapped
        # (z+dz, y+dy) grid row; 3 xi rows (1, 1, nbx, C); outputs
        # f (3, 1, 1, nbx, C) and the eng/vir accumulators (8, 128).
        j_refs = refs[0:27]
        xi_refs = refs[27:30]
        f_ref, eng_ref, vir_ref = refs[30], refs[31], refs[32]
        z = pl.program_id(0)
        y = pl.program_id(1)

        @pl.when((z == 0) & (y == 0))
        def _init():
            eng_ref[...] = jnp.zeros((8, 128), jnp.float32)
            vir_ref[...] = jnp.zeros((8, 128), jnp.float32)

        xi0 = xi_refs[0][0, 0]   # (nbx, C)
        xi1 = xi_refs[1][0, 0]
        xi2 = xi_refs[2][0, 0]

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 1)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 0)
        self_mask = (lane_i // C == 1) & (lane_i % C == sub_i) & (lane_i < 3 * C)
        # self pairs have rsq == 0; a compile-time epsilon on just those
        # lanes (the dz=dy=0 row) keeps m/rsq well-defined without the
        # (1-m) denominator blend on every lane — 2 fewer VPU ops per
        # candidate, bit-identical results (masked lanes: 0/rsq == 0)
        self_eps = self_mask.astype(jnp.float32)

        facc0 = jnp.zeros((nbx, C), jnp.float32)
        facc1 = jnp.zeros((nbx, C), jnp.float32)
        facc2 = jnp.zeros((nbx, C), jnp.float32)
        eng = jnp.zeros((), jnp.float32)
        vir = jnp.zeros((), jnp.float32)

        for dz in (-1, 0, 1):
            # the fetched row is a periodic image iff z+dz (y+dy) crosses
            # the boundary: shift its coordinates by ±prd
            zs = jnp.where(z + dz < 0, -prz,
                           jnp.where(z + dz >= nbz, prz, 0.0)).astype(jnp.float32)
            for dy in (-1, 0, 1):
                ys = jnp.where(y + dy < 0, -pry,
                               jnp.where(y + dy >= nby, pry, 0.0)).astype(jnp.float32)
                k = (dz + 1) * 3 + (dy + 1)
                j0 = j_refs[0 * 9 + k][0, 0][:, None, :]    # (nbx, 1, LANE)
                j1 = j_refs[1 * 9 + k][0, 0][:, None, :] + ys
                j2 = j_refs[2 * 9 + k][0, 0][:, None, :] + zs
                d0 = xi0[:, :, None] - j0                   # (nbx, C, LANE)
                d1 = xi1[:, :, None] - j1
                d2 = xi2[:, :, None] - j2
                rsq = d0 * d0 + d1 * d1 + d2 * d2
                mask = rsq < cutsq
                if dz == 0 and dy == 0:
                    mask = mask & ~self_mask[None, :, :]
                    rsq_den = rsq + self_eps[None, :, :]
                else:
                    rsq_den = rsq
                # mask arithmetic instead of selects: sr2 == 0 for masked
                # pairs, so sr6/fc/eng terms vanish on their own
                m = mask.astype(jnp.float32)
                sr2 = m / rsq_den
                sr6 = sr2 * sr2 * sr2 * sig6
                fc = 48.0 * sr6 * (sr6 - 0.5) * sr2 * eps
                facc0 = facc0 + jnp.sum(fc * d0, axis=-1)
                facc1 = facc1 + jnp.sum(fc * d1, axis=-1)
                facc2 = facc2 + jnp.sum(fc * d2, axis=-1)
                if evflag:
                    eng = eng + jnp.sum(sr6 * (sr6 - 1.0) * m)
                    vir = vir + jnp.sum(rsq * fc)

        f_ref[0, 0, 0] = facc0
        f_ref[1, 0, 0] = facc1
        f_ref[2, 0, 0] = facc2

        if evflag:
            # scatter each program's partial to its own accumulator cell —
            # keeps the cross-program sum tree-shaped (f32 accuracy); the
            # final (8, 128) reduction happens in XLA
            cell = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == z % 8) & (
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == y % 128)
            eng_ref[...] += jnp.where(cell, eng * (4.0 * eps), 0.0)
            vir_ref[...] += jnp.where(cell, vir * 0.5, 0.0)

    def pack_candidates(g, c):
        """Raw (nbz, nby, nbx, C) coordinate grid -> (nbz, nby, nbx, LANE)
        packed candidates [x-1 | x | x+1]; coord 0 gets the x-boundary
        periodic image fix. Written as pure slice-concats with the ±prd
        fix on just the thin wrap column: a roll+select formulation made
        XLA spend ~3-4 ops/element on what is a copy (measured 0.47 ms of
        the 864k step in maximum_maximum/DUS fusions)."""
        wrap_l = g[:, :, nbx - 1:]
        wrap_r = g[:, :, :1]
        if c == 0:
            wrap_l = wrap_l - prx
            wrap_r = wrap_r + prx
        left = jnp.concatenate([wrap_l, g[:, :, :nbx - 1]], axis=2)
        right = jnp.concatenate([g[:, :, 1:], wrap_r], axis=2)
        parts = [left, g, right]
        if LANE > 3 * C:
            parts.append(jnp.full((nbz, nby, nbx, LANE - 3 * C), _BIG,
                                  g.dtype))
        return jnp.concatenate(parts, axis=-1)

    def build(evflag: bool):
        kfn = functools.partial(kernel, evflag=evflag)
        out_shape = (
            jax.ShapeDtypeStruct((3, nbz, nby, nbx, C), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        # nine (dz, dy) views of each packed array, wrapped periodically in
        # the index map; per-program blocks are single rows, so VMEM stays
        # constant at any system size
        j_specs = [
            pl.BlockSpec((1, 1, nbx, LANE),
                         functools.partial(
                             lambda dz, dy, z, y:
                             ((z + dz - 1) % nbz, (y + dy - 1) % nby, 0, 0),
                             dz, dy),
                         memory_space=pltpu.VMEM)
            for _coord in range(3) for dz in (0, 1, 2) for dy in (0, 1, 2)
        ]
        xi_spec = pl.BlockSpec((1, 1, nbx, C), lambda z, y: (z, y, 0, 0),
                               memory_space=pltpu.VMEM)
        fspec = pl.BlockSpec((3, 1, 1, nbx, C), lambda z, y: (0, z, y, 0, 0),
                             memory_space=pltpu.VMEM)
        # eng/vir revisit block (0, 0) every step: the accumulator lives in
        # VMEM across the whole grid and flushes once
        sspec = pl.BlockSpec((8, 128), lambda z, y: (0, 0),
                             memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kfn,
            grid=(nbz, nby),
            in_specs=j_specs + [xi_spec] * 3,
            out_specs=(fspec, sspec, sspec),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

        def force(x, typ):
            del typ
            g = [x[c].reshape(nbz, nby, nbx, C) for c in range(3)]
            J = [pack_candidates(g[c], c) for c in range(3)]
            args = [J[c] for c in range(3) for _off in range(9)] + g
            f, eng, vir = call(*args)
            return f.reshape(3, M), jnp.sum(eng), jnp.sum(vir)

        return force

    return build(True), build(False)


def _make_lj_force_pallas_packed(geom: CellGeometry, params: LJParams,
                                 dtype=jnp.float32, interpret: bool = False,
                                 nb_local=None, exchanges=None):
    """Packed-candidate variant (XLA halo fill + lane packing prologue) —
    the sharded path, where halos come from mesh neighbors via the
    exchange hooks rather than periodic self-wrap."""
    assert params.uniform, "pallas LJ path requires type-uniform parameters"
    assert dtype == jnp.float32, "pallas LJ kernel is f32"
    h = halo_extent(geom)
    assert h == 1, "pallas LJ kernel assumes binsize >= cutneigh (h == 1)"

    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    C = geom.capacity
    M = nbx * nby * nbz * C
    Yp = nby + 2
    LANE = _round_up(3 * C, 128)
    cutsq = float(params.cutforcesq[0])
    eps = float(params.epsilon[0])
    sig6 = float(params.sigma6[0])

    # One y-row per program: the (dz, dy) view index maps shift by BLOCKS,
    # so a +-1 y-neighbor view is only expressible with single-row blocks;
    # YB > 1 would need overlapping (YB+2)-row windows, which BlockSpecs
    # cannot express (size == stride). Single rows also measured fastest.
    YB = 1

    def kernel(*refs, evflag: bool):
        # refs: 27 J blocks (coord-major, then (dz, dy) row-major), 3 Xi
        # blocks, then outputs f0 f1 f2, eng, vir. Each J block is (1, YB,
        # nbx, LANE) from the dy-shifted copy of the packed candidates.
        j_refs = refs[0:27]
        xi_refs = refs[27:30]  # (1, YB, nbx, C)
        f_refs = refs[30:33]
        eng_ref, vir_ref = refs[33], refs[34]

        # self-pair mask for the (dy,dz)=(0,0) row: lane block 1 (dx=0)
        # holds the row itself; self pair when lane%C == i sublane index.
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 1)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 0)
        self_mask = (lane_i // C == 1) & (lane_i % C == sub_i) & (lane_i < 3 * C)
        # compile-time epsilon on the self lanes only (see the fused
        # kernel): m/rsq needs no (1-m) blend anywhere else
        self_eps = self_mask.astype(jnp.float32)

        eng = jnp.zeros((), jnp.float32)
        vir = jnp.zeros((), jnp.float32)

        for yy in range(YB):
            xi0 = xi_refs[0][0, yy]    # (nbx, C)
            xi1 = xi_refs[1][0, yy]
            xi2 = xi_refs[2][0, yy]

            facc0 = jnp.zeros((nbx, C), jnp.float32)
            facc1 = jnp.zeros((nbx, C), jnp.float32)
            facc2 = jnp.zeros((nbx, C), jnp.float32)

            for dz in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    k = (dz + 1) * 3 + (dy + 1)
                    j0 = j_refs[0 * 9 + k][0, yy][:, None, :]    # (nbx,1,LANE)
                    j1 = j_refs[1 * 9 + k][0, yy][:, None, :]
                    j2 = j_refs[2 * 9 + k][0, yy][:, None, :]
                    d0 = xi0[:, :, None] - j0                    # (nbx,C,LANE)
                    d1 = xi1[:, :, None] - j1
                    d2 = xi2[:, :, None] - j2
                    rsq = d0 * d0 + d1 * d1 + d2 * d2
                    mask = rsq < cutsq
                    if dz == 0 and dy == 0:
                        mask = mask & ~self_mask[None, :, :]
                        rsq_den = rsq + self_eps[None, :, :]
                    else:
                        rsq_den = rsq
                    # mask arithmetic instead of selects: sr2 == 0 for
                    # masked pairs, so sr6/fc/eng terms vanish on their own
                    m = mask.astype(jnp.float32)
                    sr2 = m / rsq_den
                    sr6 = sr2 * sr2 * sr2 * sig6
                    fc = 48.0 * sr6 * (sr6 - 0.5) * sr2 * eps
                    facc0 = facc0 + jnp.sum(fc * d0, axis=-1)
                    facc1 = facc1 + jnp.sum(fc * d1, axis=-1)
                    facc2 = facc2 + jnp.sum(fc * d2, axis=-1)
                    if evflag:
                        eng = eng + jnp.sum(sr6 * (sr6 - 1.0) * m)
                        vir = vir + jnp.sum(rsq * fc)

            f_refs[0][0, yy] = facc0
            f_refs[1][0, yy] = facc1
            f_refs[2][0, yy] = facc2

        if evflag:
            cell00 = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0) & (
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
            eng_ref[0, 0] = jnp.where(cell00, eng * (4.0 * eps), 0.0)
            vir_ref[0, 0] = jnp.where(cell00, vir * 0.5, 0.0)
        else:
            eng_ref[0, 0] = jnp.zeros((8, 128), jnp.float32)
            vir_ref[0, 0] = jnp.zeros((8, 128), jnp.float32)

    def pack_candidates(Xp):
        """(Zp, Yp, Xp_cells, C) padded grid -> three y-shifted
        (Zp, nby, nbx, LANE) lane-packed candidate arrays, one per dy, so
        program blocks are plain y-aligned slices."""
        packed = []
        for g in Xp:
            j = jnp.concatenate(
                [g[:, :, 0:nbx], g[:, :, 1:nbx + 1], g[:, :, 2:nbx + 2]],
                axis=-1)
            if LANE > 3 * C:
                pad = jnp.full((*j.shape[:-1], LANE - 3 * C), _BIG, j.dtype)
                j = jnp.concatenate([j, pad], axis=-1)
            packed.append(j.reshape(nbz + 2, Yp, nbx, LANE))
        return packed

    # inside shard_map, pallas outputs must declare how they vary across
    # the mesh (check_vma); device-local outputs vary over every axis
    _vma = {"vma": frozenset(("z", "y", "x"))} if nb_local is not None else {}

    def build(evflag: bool):
        kfn = functools.partial(kernel, evflag=evflag)
        out_shape = (
            *(jax.ShapeDtypeStruct((nbz, nby, nbx, C), jnp.float32,
                                   **_vma),) * 3,
            jax.ShapeDtypeStruct((nbz, nby // YB, 8, 128), jnp.float32,
                                 **_vma),
            jax.ShapeDtypeStruct((nbz, nby // YB, 8, 128), jnp.float32,
                                 **_vma),
        )
        # nine (dz, dy)-offset views of each J array: per-program blocks are
        # single rows, so VMEM stays constant at any system size
        j_specs = [
            pl.BlockSpec((1, YB, nbx, LANE),
                         functools.partial(
                             lambda dz, dy, z, y: (z + dz, y + dy, 0, 0),
                             dz, dy),
                         memory_space=pltpu.VMEM)
            for _coord in range(3) for dz in (0, 1, 2) for dy in (0, 1, 2)
        ]
        xi_spec = pl.BlockSpec((1, YB, nbx, C), lambda z, y: (z, y, 0, 0),
                               memory_space=pltpu.VMEM)
        fspec = pl.BlockSpec((1, YB, nbx, C), lambda z, y: (z, y, 0, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((1, 1, 8, 128), lambda z, y: (z, y, 0, 0),
                             memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kfn,
            grid=(nbz, nby // YB),
            in_specs=j_specs + [xi_spec] * 3,
            out_specs=(fspec, fspec, fspec, sspec, sspec),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

        def force(x, typ):
            del typ
            Xp = to_padded_soa(x, geom, h, nb_local=(nbx, nby, nbz),
                               exchanges=exchanges)
            J = pack_candidates(Xp)
            Xi = [g[1:-1, 1:-1, 1:nbx + 1] for g in Xp]
            args = [J[c] for c in range(3) for _off in range(9)] + Xi
            f0, f1, f2, eng, vir = call(*args)
            f = jnp.stack([f0.reshape(M), f1.reshape(M), f2.reshape(M)],
                          axis=0)
            return f, jnp.sum(eng), jnp.sum(vir)

        return force

    return build(True), build(False)
