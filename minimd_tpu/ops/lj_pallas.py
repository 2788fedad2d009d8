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

from ..cells import LARGE_GRID_SLOTS, CellGeometry
from .lj import LJParams
from .pairgrid import fused_lane_pack, halo_extent

_BIG = 5.0e5  # sentinel coordinate for masked lane padding

# Output relayout idiom (read at trace time; module-level so A/B perf
# experiments can build both programs in one process — see force()
# below). "auto" = per-coordinate stack for large grids only
# (cells.LARGE_GRID_SLOTS: +0.9% at 864k, ~-5% at 131k — see the
# constant's comment); True/False force it.
OUT_STACK = "auto"


def _round_up(n, m):
    return (n + m - 1) // m * m


def make_lj_force_pallas(geom: CellGeometry, params: LJParams,
                         dtype=jnp.float32, interpret: bool = False,
                         nb_local=None, exchanges=None, recip: str | None = None,
                         xi_src: str = "grid"):
    """(force_ev, force_noev) closures: (x, typ) -> (f, eng, virial).

    One kernel for both the single-device and the sharded path, with a
    per-axis halo mode (see _make_lj_force_pallas_fused): axes the mesh
    does not decompose fold the periodic halo into the BlockSpec index
    maps (no halo in HBM at all); decomposed axes exchange LANE-PACKED
    boundary slabs with mesh neighbors through the `exchanges` ppermute
    hooks. On a 1-device mesh the sharded program therefore degenerates
    to exactly the single-device kernel."""
    return _make_lj_force_pallas_fused(geom, params, dtype=dtype,
                                       interpret=interpret,
                                       nb_local=nb_local, exchanges=exchanges,
                                       recip=recip, xi_src=xi_src)


def _make_lj_force_pallas_fused(geom: CellGeometry, params: LJParams,
                                dtype=jnp.float32, interpret: bool = False,
                                nb_local=None, exchanges=None,
                                recip: str | None = None,
                                xi_src: str = "grid"):
    """Kernel with the halo folded out of the data path. Two pieces:

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

    Sharded (nb_local + exchanges given): each axis independently keeps
    the fused scheme where it can. Axes the mesh does NOT decompose wrap
    periodically in the index maps exactly as above. Decomposed axes get
    their halo from mesh neighbors: the x-halo is two thin cell COLUMNS
    folded into the candidate pack, and decomposed z/y axes concatenate
    ppermuted LANE-PACKED slabs (one extra row each side). The reference's
    dim-ordered swap composition (comm.cpp:739-867) is preserved: x
    columns first, then y, then z, so corner ghosts compose.
    """
    assert params.uniform, "pallas LJ path requires type-uniform parameters"
    assert dtype == jnp.float32, "pallas LJ kernel is f32"
    if recip is None:
        # measured precision of the VPU approx reciprocal: ~1.6e-5 raw
        # ("nr0" — max force error 1.02e-4 of scale at the 131k deck),
        # 9.3e-7 (~f32 rounding) after ONE Newton step ("nr1"). The
        # Newton step costs 2 of the kernel's ~30 effective VPU slots
        # per candidate lane: nr0 measured +6.4% whole-step throughput
        # at 864k (45.39 vs 42.67 Matom-steps/s, 2026-08-19). nr0 is the
        # TPU production default: it passes the reference's own
        # statistical acceptance criterion (run_one_test:121-138, the
        # same bar the reference's f32 build is held to — see
        # scripts/run_tests.py --tpu) and the trajectory-level force
        # perturbation is far below the f32 chaos divergence the
        # criterion already absorbs. Pass recip="nr1" for f32-rounding
        # forces, "div" for the exact divide (debugging escape hatch).
        # The interpret emulation of the approx reciprocal is coarser
        # (~4e-3 raw), so CPU-mesh tests take two steps to land back at
        # f32 rounding.
        recip = "nr2" if interpret else "nr0"
    h = halo_extent(geom)
    assert h == 1, "pallas LJ kernel assumes binsize >= cutneigh (h == 1)"

    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    C = geom.capacity
    M = nbx * nby * nbz * C
    LANE = _round_up(3 * C, 128)
    cutsq = float(params.cutforcesq[0])
    eps = float(params.epsilon[0])
    sig6 = float(params.sigma6[0])
    _, pry, prz = (float(p) for p in geom.prd)

    # shared fused-halo machinery (per-axis mode flags, candidate pack,
    # wrapped BlockSpec builder) — see pairgrid.fused_lane_pack
    (dec_z, dec_y, dec_x), pack_candidates, wrapped_specs = fused_lane_pack(
        (nbx, nby, nbz), C, LANE, geom.prd, exchanges, _BIG)

    pack_xi = xi_src == "pack"

    def kernel(*refs, evflag: bool):
        # refs: 27 packed-candidate rows (coord-major, then (dz, dy)
        # row-major), each (1, 1, nbx, LANE) fetched at the wrapped or
        # halo-padded (z+dz, y+dy) row; then (xi_src == "grid") 3 xi rows
        # (1, 1, nbx, C); outputs f (3, 1, 1, nbx, C) and the eng/vir
        # accumulators (8, 128).
        j_refs = refs[0:27]
        if pack_xi:
            f_ref, eng_ref, vir_ref = refs[27], refs[28], refs[29]
        else:
            xi_refs = refs[27:30]
            f_ref, eng_ref, vir_ref = refs[30], refs[31], refs[32]
        z = pl.program_id(0)
        y = pl.program_id(1)

        @pl.when((z == 0) & (y == 0))
        def _init():
            eng_ref[...] = jnp.zeros((8, 128), jnp.float32)
            vir_ref[...] = jnp.zeros((8, 128), jnp.float32)

        if pack_xi:
            # own-row coordinates are the candidate pack's center block
            # (lanes [C, 2C)) of the (dz, dy) == (0, 0) row — the raw
            # grids never materialize in HBM and the three narrow
            # (nbx, C) xi DMAs disappear; cost is one static lane-offset
            # slice per coordinate per program
            xi0 = j_refs[0 * 9 + 4][0, 0][:, C:2 * C]
            xi1 = j_refs[1 * 9 + 4][0, 0][:, C:2 * C]
            xi2 = j_refs[2 * 9 + 4][0, 0][:, C:2 * C]
        else:
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

        zero = jnp.zeros((), jnp.float32)
        for dz in (-1, 0, 1):
            # wrapped axes: the fetched row is a periodic image iff z+dz
            # (y+dy) crosses the boundary — shift its coordinates by ±prd.
            # Decomposed axes: the halo slab arrived pre-shifted from the
            # neighbor (exchange hooks apply the boundary fix), zs = 0.
            zs = zero if dec_z else jnp.where(
                z + dz < 0, -prz,
                jnp.where(z + dz >= nbz, prz, 0.0)).astype(jnp.float32)
            for dy in (-1, 0, 1):
                ys = zero if dec_y else jnp.where(
                    y + dy < 0, -pry,
                    jnp.where(y + dy >= nby, pry, 0.0)).astype(jnp.float32)
                k = (dz + 1) * 3 + (dy + 1)
                j0 = j_refs[0 * 9 + k][0, 0][:, None, :]    # (nbx, 1, LANE)
                j1 = j_refs[1 * 9 + k][0, 0][:, None, :]
                j2 = j_refs[2 * 9 + k][0, 0][:, None, :]
                # the periodic image shift folds into the (nbx, C) xi row
                # instead of the (nbx, LANE) candidates — 2 fewer VPU ops
                # per candidate lane ((xi - s) - j vs xi - (j + s): one f32
                # rounding apart, physics-identical; self pairs sit on the
                # dz=dy=0 row where both shifts are exactly 0)
                xi1s = xi1 if dec_y else xi1 - ys
                xi2s = xi2 if dec_z else xi2 - zs
                d0 = xi0[:, :, None] - j0                   # (nbx, C, LANE)
                d1 = xi1s[:, :, None] - j1
                d2 = xi2s[:, :, None] - j2
                rsq = d0 * d0 + d1 * d1 + d2 * d2
                mask = rsq < cutsq
                if dz == 0 and dy == 0:
                    mask = mask & ~self_mask[None, :, :]
                    rsq_den = rsq + self_eps[None, :, :]
                else:
                    rsq_den = rsq
                if recip.startswith("nr"):
                    # approximate VPU reciprocal + Newton steps (see the
                    # recip default above) replaces the full-precision
                    # divide; select-masking replaces the m-cvt +
                    # multiply (masked lanes: sr2 == 0, so sr6/fc/eng
                    # terms still vanish on their own)
                    inv = pl.reciprocal(rsq_den, approx=True)
                    for _ in range(int(recip[2:])):
                        inv = inv * (2.0 - rsq_den * inv)
                    sr2 = jnp.where(mask, inv, 0.0)
                else:
                    m = mask.astype(jnp.float32)
                    sr2 = m / rsq_den
                # sigma == 1 in the shipped LJ decks: skip the sig6 mul
                # entirely rather than trusting Mosaic to fold *1.0
                sr6 = sr2 * sr2 * sr2
                if sig6 != 1.0:
                    sr6 = sr6 * sig6
                # constants folded at trace time: 48*eps and 24*eps are
                # python floats, so fc costs one FMA + two muls
                fc = (sr6 * (48.0 * eps) - (24.0 * eps)) * sr6 * sr2
                facc0 = facc0 + jnp.sum(fc * d0, axis=-1)
                facc1 = facc1 + jnp.sum(fc * d1, axis=-1)
                facc2 = facc2 + jnp.sum(fc * d2, axis=-1)
                if evflag:
                    eng = eng + jnp.sum(sr6 * (sr6 - 1.0))
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

    # inside shard_map, pallas outputs must declare how they vary across
    # the mesh (check_vma); device-local outputs vary over every axis
    _vma = {"vma": frozenset(("z", "y", "x"))} if nb_local is not None else {}

    def build(evflag: bool):
        kfn = functools.partial(kernel, evflag=evflag)
        out_shape = (
            jax.ShapeDtypeStruct((3, nbz, nby, nbx, C), jnp.float32, **_vma),
            jax.ShapeDtypeStruct((8, 128), jnp.float32, **_vma),
            jax.ShapeDtypeStruct((8, 128), jnp.float32, **_vma),
        )
        j_specs = wrapped_specs(3)
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
            in_specs=j_specs + ([] if pack_xi else [xi_spec] * 3),
            out_specs=(fspec, sspec, sspec),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

        def force(x, typ):
            del typ
            # x may be the (3, M) state array OR a 3-tuple of flat (M,)
            # coordinate arrays (sim.py's triple carry: a (3, M) f32 scan
            # carry tiles T(8,128) with the 3-row sublane dim padded to 8,
            # so every elementwise integrate op pays ~2.7x bandwidth;
            # per-coordinate (M,) carries tile densely). Both index the
            # same way; only the output relayout differs.
            triple = isinstance(x, (tuple, list))
            g = [x[c].reshape(nbz, nby, nbx, C) for c in range(3)]
            J = [pack_candidates(g[c], c) for c in range(3)]
            args = [J[c] for c in range(3) for _off in range(9)]
            if not pack_xi:
                args = args + g
            f, eng, vir = call(*args)
            # per-coordinate reshape + stack, NOT f.reshape(3, M): XLA
            # lowers a grid->flat reshape whose major (coordinate) dim
            # crosses the relayout as a 3-iteration while loop of
            # dynamic-update-slices; three plain per-coordinate relayout
            # copies plus one concat lower cleanly (the input side above
            # uses the same per-coordinate idiom for the same reason).
            # Measured +0.9% whole-step at 864k (45.43 -> 45.85
            # Matom-steps/s, same-session A/B, scripts/exp_glue.py
            # 2026-08-19; +1.4% combined with sim.NOEV_FASTPATH)
            ostack = (M >= LARGE_GRID_SLOTS if OUT_STACK == "auto"
                      else OUT_STACK)
            if triple:
                f = tuple(f[c].reshape(M) for c in range(3))
            elif ostack:
                f = jnp.stack([f[c].reshape(M) for c in range(3)])
            else:
                f = f.reshape(3, M)
            return f, jnp.sum(eng), jnp.sum(vir)

        force.accepts_triple = True
        return force

    return build(True), build(False)
