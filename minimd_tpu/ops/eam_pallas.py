"""Pallas TPU kernels for the EAM cell-grid force (two passes).

Same lane-packed layout and per-row pipelining as the LJ kernel
(ops/lj_pallas.py): per cell row (z, y), candidates are packed
[dx=-1 | dx=0 | dx=+1] into the 128-lane axis, and each program binds the
nine (dz, dy)-shifted single-row views of the packed arrays — VMEM holds a
few rows, not the whole box, at any system size.

Pair tables are the exact-to-f32 polynomial-body + spline-tail scheme
(eam_file.build_pair_polys, evaluated by eam_grid.eval_pair_fns): Horner on
lane-uniform scalar coefficients, zero gathers, with the 1/r force factors
absorbed so the kernel needs no reciprocal.

Pass 1 computes per-atom densities; the embedding derivative fp is
evaluated bit-exactly between the passes (per-atom spline gather in XLA,
cheap); pass 2 consumes fp through the same lane-packed candidate path and
produces forces/energy/virial. The structure mirrors the reference's
two-pass + mid-force exchange (force_eam.cpp:274-449).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cells import CellGeometry, _SENTINEL_BASE
from ..eam_file import build_pair_polys, resolve_degree
from .eam import EAMTables
from .eam_grid import eval_pair_fns
from .pairgrid import halo_extent

_BIG = 5.0e5


def _round_up(n, m):
    return (n + m - 1) // m * m


def make_eam_force_pallas(geom: CellGeometry, tables: EAMTables,
                          ntypes: int = 1, dtype=jnp.float32,
                          degree=None, interpret: bool = False,
                          nb_local=None, exchanges=None, fp_exchange=None,
                          xi_src: str = "grid"):
    """(force_ev, force_noev) closures: (x, typ) -> (f, eng_vdwl, virial).

    One kernel for both the single-device and the sharded path, with a
    per-axis halo mode (see _make_eam_force_pallas_fused): axes the mesh
    does not decompose fold the periodic halo into the BlockSpec index
    maps (no halo in HBM at all); decomposed axes exchange LANE-PACKED
    boundary slabs with mesh neighbors through the `exchanges` ppermute
    hooks — both for the coordinates and for the mid-force fp halo
    (force_eam.cpp:274-449 two-pass structure). On a 1-device mesh the
    sharded program degenerates to exactly the single-device kernel.

    degree=None resolves to the trajectory-validated hardware pair-table
    degrees on TPU f32 and the adaptive (force-space-exact) fit under
    interpret/CPU; "adaptive"/int/dict override (eam_file.resolve_degree)."""
    degree = resolve_degree(degree, dtype, interpret)
    return _make_eam_force_pallas_fused(geom, tables, ntypes,
                                        dtype=dtype, degree=degree,
                                        interpret=interpret,
                                        nb_local=nb_local,
                                        exchanges=exchanges,
                                        fp_exchange=fp_exchange,
                                        xi_src=xi_src)


def make_eam_force_pallas_rows(geom: CellGeometry, tables: EAMTables,
                               ntypes: int = 1, dtype=jnp.float32,
                               interpret: bool = False, degree=None):
    """Gather-table EAM kernels (single device) — a MEASURED NEGATIVE
    RESULT, kept in-tree (with its interpret-mode parity test) so the
    experiment isn't re-walked.

    Measured on the v5e chip (131k-atom EAM deck): 17.31 ms/step = 7.57
    Matom-steps/s vs the polynomial kernel's 13.97 ms = 9.45 M. Microbench
    (evolving-carry scan): a 4-coefficient gather evaluation costs about
    as much as a full degree-20 Horner chain — tpu.dynamic_gather is
    ~4-5 VPU ops per element, and the scheme still pays the sqrt + index
    computation on top. Related negatives: dynamic_gather requires
    indices.shape == operand.shape with the table in a single vreg
    (<= 128 lanes) along the gather dim; and rsq-space polynomial bodies
    (which would drop the sqrt) need degree 28 while still missing the
    R/P fit tolerances, so there is no sqrt-free reformulation either.

    Design (works, is exact to f32 rounding — just not faster), two
    changes over make_eam_force_pallas:

    - Pair functions evaluate through <=128-entry piecewise tables
      (eam_file.build_pair_rows) with Mosaic's per-lane dynamic gather:
      ~deg+1 gathers + deg FMA per function instead of a degree-20 Horner
      body + per-row tail selects. The index and the local coordinate come
      out of one fused piecewise-linear map.
    - The XLA prologue is the LJ fused kernel's: candidates are roll-packed
      straight from the raw grid (x-boundary image fix fused in), periodic
      z/y wrap rides the BlockSpec index maps with in-kernel ±prd scalar
      shifts — no halo-padded grids in HBM. The fp halo between the passes
      is the same roll-pack with no coordinate fixes (scalar field).
    """
    assert dtype == jnp.float32, "pallas EAM kernel is f32"
    h = halo_extent(geom)
    assert h == 1, "pallas EAM kernel assumes binsize >= cutneigh"

    from ..eam_file import build_pair_rows

    nbx, nby, nbz = geom.nb
    C = geom.capacity
    M = nbx * nby * nbz * C
    LANE = _round_up(3 * C, 128)
    prx, pry, prz = (float(p) for p in geom.prd)

    rows = build_pair_rows(tables, degree=degree)
    NE = rows.n_entries
    lo_c, split_c = rows.lo, rows.split
    inv_h, rdr_t, n_body = rows.inv_h, rows.rdr, rows.n_body
    # Mosaic's dynamic_gather wants indices.shape == operand.shape and a
    # single source vreg along the gather dim: tables pad to LANE == 128
    # and broadcast to the candidate array shape (hoisted out of the
    # stencil loop below)
    assert LANE == 128, "gather-table EAM kernel needs 3*C <= 128"
    import numpy as _np
    tabs = {name: jnp.asarray(_np.pad(c, ((0, 0), (0, LANE - c.shape[1]))))
            for name, c in rows.coeffs.items()}
    degs = {name: c.shape[0] - 1 for name, c in rows.coeffs.items()}
    cutsq = float(tables.cut ** 2)

    frho_sp = jnp.asarray(tables.frho_spline, dtype=dtype)
    rdrho = 1.0 / tables.drho
    nrho = tables.nrho

    def self_mask_2d():
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 1)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 0)
        return (lane_i // C == 1) & (lane_i % C == sub_i) & (lane_i < 3 * C)

    def row_index(r):
        """Piecewise index map: (k, t) with t in [0, 1). One select, and
        the clamp covers both sentinels (r huge) and the no-pairs-below-lo
        contract (same clamp semantics as eval_pair_fns)."""
        idxf = jnp.where(r < split_c, (r - lo_c) * inv_h,
                         n_body + (r - split_c) * rdr_t)
        idxf = jnp.clip(idxf, 0.0, NE - 1.0 + 0.999)
        k = jnp.minimum(idxf.astype(jnp.int32), NE - 1)
        return k, idxf - k.astype(jnp.float32)

    def broadcast_tab(tab_ref, deg, nrows):
        """Hoist the table broadcasts out of the stencil loop: each coeff
        row becomes a (nrows, 128) operand matching the index shape."""
        return [jnp.broadcast_to(tab_ref[c][None, :], (nrows, LANE))
                for c in range(deg + 1)]

    def eval_tab(tab_b, k2, t2):
        """Gather-table polynomial at flattened-2D (k, t): deg+1 per-lane
        gathers + deg FMA (indices.shape == operand.shape == (nrows, 128),
        the Mosaic dynamic_gather contract)."""
        acc = jnp.take_along_axis(tab_b[0], k2, axis=1)
        for c in range(1, len(tab_b)):
            acc = acc * t2 + jnp.take_along_axis(tab_b[c], k2, axis=1)
        return acc

    def pair_r(j_refs, xi, dz, dy, z, y):
        zs = jnp.where(z + dz < 0, -prz,
                       jnp.where(z + dz >= nbz, prz, 0.0)).astype(jnp.float32)
        ys = jnp.where(y + dy < 0, -pry,
                       jnp.where(y + dy >= nby, pry, 0.0)).astype(jnp.float32)
        k = (dz + 1) * 3 + (dy + 1)
        j0 = j_refs[0 * 9 + k][0, 0][:, None, :]   # (nbx, 1, LANE)
        j1 = j_refs[1 * 9 + k][0, 0][:, None, :] + ys
        j2 = j_refs[2 * 9 + k][0, 0][:, None, :] + zs
        d0 = xi[0][:, :, None] - j0                # (nbx, C, LANE)
        d1 = xi[1][:, :, None] - j1
        d2 = xi[2][:, :, None] - j2
        rsq = d0 * d0 + d1 * d1 + d2 * d2
        mask = rsq < cutsq
        if dz == 0 and dy == 0:
            mask = mask & ~self_mask_2d()[None, :, :]
        m = mask.astype(jnp.float32)
        r = jnp.sqrt(rsq)
        return (d0, d1, d2), rsq, r, m

    # ------------------------------------------------------------------
    # pass 1: rho
    # ------------------------------------------------------------------
    def rho_kernel(*refs):
        j_refs = refs[0:27]
        xi_refs = refs[27:30]
        tabR = refs[30]
        rho_ref = refs[31]
        z = pl.program_id(0)
        y = pl.program_id(1)
        xi = [xr[0, 0] for xr in xi_refs]
        tabR_b = broadcast_tab(tabR, degs["R"], nbx * C)
        rho = jnp.zeros((nbx, C), jnp.float32)
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                _, _, r, m = pair_r(j_refs, xi, dz, dy, z, y)
                k2, t2 = row_index(r.reshape(nbx * C, LANE))
                val = eval_tab(tabR_b, k2, t2).reshape(nbx, C, LANE)
                rho = rho + jnp.sum(val * m, axis=-1)
        rho_ref[0, 0] = rho

    # ------------------------------------------------------------------
    # pass 2: forces
    # ------------------------------------------------------------------
    def force_kernel(*refs, evflag: bool):
        j_refs = refs[0:27]
        fp_refs = refs[27:36]     # packed fp rows, (dz, dy) wrapped views
        xi_refs = refs[36:39]
        fpi_ref = refs[39]        # (1, 1, nbx, C) own fp
        tabG1, tabG2, tabP = refs[40], refs[41], refs[42]
        f_ref, eng_ref, vir_ref = refs[43], refs[44], refs[45]
        z = pl.program_id(0)
        y = pl.program_id(1)

        @pl.when((z == 0) & (y == 0))
        def _init():
            eng_ref[...] = jnp.zeros((8, 128), jnp.float32)
            vir_ref[...] = jnp.zeros((8, 128), jnp.float32)

        xi = [xr[0, 0] for xr in xi_refs]
        fp_i = fpi_ref[0, 0]                       # (nbx, C)
        tabG1_b = broadcast_tab(tabG1, degs["G1"], nbx * C)
        tabG2_b = broadcast_tab(tabG2, degs["G2"], nbx * C)
        tabP_b = broadcast_tab(tabP, degs["P"], nbx * C) if evflag else None

        facc = [jnp.zeros((nbx, C), jnp.float32) for _ in range(3)]
        eng = jnp.zeros((), jnp.float32)
        vir = jnp.zeros((), jnp.float32)

        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                (d0, d1, d2), rsq, r, m = pair_r(j_refs, xi, dz, dy, z, y)
                k2, t2 = row_index(r.reshape(nbx * C, LANE))
                g1 = eval_tab(tabG1_b, k2, t2).reshape(nbx, C, LANE)
                g2 = eval_tab(tabG2_b, k2, t2).reshape(nbx, C, LANE)
                k = (dz + 1) * 3 + (dy + 1)
                fp_j = fp_refs[k][0, 0][:, None, :]       # (nbx, 1, LANE)
                psip = (fp_i[:, :, None] + fp_j) * g1 + g2
                fpair = -psip * m
                facc[0] = facc[0] + jnp.sum(fpair * d0, axis=-1)
                facc[1] = facc[1] + jnp.sum(fpair * d1, axis=-1)
                facc[2] = facc[2] + jnp.sum(fpair * d2, axis=-1)
                if evflag:
                    pv = eval_tab(tabP_b, k2, t2).reshape(nbx, C, LANE)
                    eng = eng + jnp.sum(pv * m)
                    vir = vir + 0.5 * jnp.sum(rsq * fpair)

        f_ref[0, 0, 0] = facc[0]
        f_ref[1, 0, 0] = facc[1]
        f_ref[2, 0, 0] = facc[2]
        if evflag:
            cell = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == z % 8) & (
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == y % 128)
            eng_ref[...] += jnp.where(cell, eng, 0.0)
            vir_ref[...] += jnp.where(cell, vir, 0.0)

    # ------------------------------------------------------------------
    # XLA prologue: roll-pack from the raw grid (LJ fused style)
    # ------------------------------------------------------------------
    def pack_candidates(g, c):
        left = jnp.roll(g, 1, axis=2)
        right = jnp.roll(g, -1, axis=2)
        if c == 0:
            xc = jnp.arange(nbx, dtype=jnp.int32)[None, None, :, None]
            left = jnp.where(xc == 0, left - prx, left)
            right = jnp.where(xc == nbx - 1, right + prx, right)
        parts = [left, g, right]
        if LANE > 3 * C:
            parts.append(jnp.full((nbz, nby, nbx, LANE - 3 * C), _BIG,
                                  g.dtype))
        return jnp.concatenate(parts, axis=-1)

    def embedding(rho, valid, evflag: bool):
        p = rho * rdrho + 1.0
        m = jnp.clip(p.astype(jnp.int32), 1, nrho - 1)
        p = jnp.minimum(p - m.astype(dtype), 1.0)
        fp = (jnp.take(frho_sp[:, 0], m) * p + jnp.take(frho_sp[:, 1], m)) * p \
            + jnp.take(frho_sp[:, 2], m)
        if evflag:
            emb = ((jnp.take(frho_sp[:, 3], m) * p + jnp.take(frho_sp[:, 4], m)) * p
                   + jnp.take(frho_sp[:, 5], m)) * p + jnp.take(frho_sp[:, 6], m)
            return fp, jnp.sum(jnp.where(valid, emb, 0.0))
        return fp, jnp.zeros((), dtype)

    def wrapped_specs(n_coords):
        return [
            pl.BlockSpec((1, 1, nbx, LANE),
                         functools.partial(
                             lambda dz, dy, z, y:
                             ((z + dz - 1) % nbz, (y + dy - 1) % nby, 0, 0),
                             dz, dy),
                         memory_space=pltpu.VMEM)
            for _c in range(n_coords) for dz in (0, 1, 2) for dy in (0, 1, 2)
        ]

    xi_spec = pl.BlockSpec((1, 1, nbx, C), lambda z, y: (z, y, 0, 0),
                           memory_space=pltpu.VMEM)

    def tab_spec(name):
        return pl.BlockSpec(tabs[name].shape, lambda z, y: (0, 0),
                            memory_space=pltpu.VMEM)

    rho_call = pl.pallas_call(
        rho_kernel,
        grid=(nbz, nby),
        in_specs=wrapped_specs(3) + [xi_spec] * 3 + [tab_spec("R")],
        out_specs=xi_spec,
        out_shape=jax.ShapeDtypeStruct((nbz, nby, nbx, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def build(evflag: bool):
        fspec = pl.BlockSpec((3, 1, 1, nbx, C), lambda z, y: (0, z, y, 0, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((8, 128), lambda z, y: (0, 0),
                             memory_space=pltpu.VMEM)
        force_call = pl.pallas_call(
            functools.partial(force_kernel, evflag=evflag),
            grid=(nbz, nby),
            in_specs=(wrapped_specs(3) + wrapped_specs(1) + [xi_spec] * 4
                      + [tab_spec(n) for n in ("G1", "G2", "P")]),
            out_specs=(fspec, sspec, sspec),
            out_shape=(
                jax.ShapeDtypeStruct((3, nbz, nby, nbx, C), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

        def force(x, typ):
            del typ
            g = [x[c].reshape(nbz, nby, nbx, C) for c in range(3)]
            J = [pack_candidates(g[c], c) for c in range(3)]
            jargs = [J[c] for c in range(3) for _off in range(9)]

            rho = rho_call(*jargs, *g, tabs["R"])
            valid = x[0] < 0.5 * _SENTINEL_BASE
            fp, embed_eng = embedding(rho.reshape(M), valid, evflag)
            # fp halo: the reference's mid-force communicate — a scalar
            # field, so the roll-pack needs no boundary coordinate fix
            fpg = fp.reshape(nbz, nby, nbx, C)
            FP = pack_candidates(fpg, -1)

            f, eng, vir = force_call(
                *jargs, *([FP] * 9), *g, fpg,
                tabs["G1"], tabs["G2"], tabs["P"])
            eng_vdwl = 2.0 * (embed_eng + 0.5 * jnp.sum(eng))
            return f.reshape(3, M), eng_vdwl, jnp.sum(vir)

        return force

    return build(True), build(False)


def _make_eam_force_pallas_fused(geom: CellGeometry, tables: EAMTables,
                                 ntypes: int = 1, dtype=jnp.float32,
                                 degree: int | None = None,
                                 interpret: bool = False,
                                 nb_local=None, exchanges=None,
                                 fp_exchange=None, xi_src: str = "grid"):
    """Fused EAM kernels: periodic z/y wrap in the BlockSpec index maps
    with in-kernel ±prd scalar shifts, candidates packed [x-1 | x | x+1]
    straight from the raw grids by slice-concats (thin wrap-column fix),
    the fp halo likewise (a scalar field — no fix). The halo-padded grids
    + pack_lanes passes of the former packed variant (~4.3 ms/step of XLA
    fusions at 131k, profiled) do not exist here.

    Sharded (nb_local + exchanges given): each axis independently keeps
    the fused scheme where it can — exactly the LJ mixed-fused layout
    (ops/lj_pallas.py). Axes the mesh does NOT decompose wrap periodically
    in the index maps as above; decomposed axes get their halo from mesh
    neighbors (x as thin cell columns folded into the candidate pack,
    y/z as ppermuted LANE-PACKED slabs), composing corner ghosts
    dim-by-dim like the reference (comm.cpp:739-867). The mid-force fp
    halo (force_eam.cpp:372-377's communicate) rides the same hooks with
    no coordinate fix.

    Pair evaluation is the polynomial-table scheme (eam_file
    build_pair_polys via eval_pair_fns).
    """
    assert dtype == jnp.float32, "pallas EAM kernel is f32"
    h = halo_extent(geom)
    assert h == 1, "pallas EAM kernel assumes binsize >= cutneigh"

    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    C = geom.capacity
    M = nbx * nby * nbz * C
    LANE = _round_up(3 * C, 128)
    _, pry, prz = (float(p) for p in geom.prd)

    # shared fused-halo machinery (per-axis mode flags, candidate pack,
    # wrapped BlockSpec builder) — see pairgrid.fused_lane_pack
    from .pairgrid import fused_lane_pack
    (dec_z, dec_y, dec_x), pack_candidates, wrapped_specs = fused_lane_pack(
        (nbx, nby, nbz), C, LANE, geom.prd, exchanges, _BIG)

    polys = build_pair_polys(tables, degree=degree)
    cutsq = float(tables.cut ** 2)

    def self_mask_2d():
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 1)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 0)
        return (lane_i // C == 1) & (lane_i % C == sub_i) & (lane_i < 3 * C)

    def pair_r(j_refs, xi, dz, dy, z, y):
        # wrapped axes: the fetched row is a periodic image iff z+dz (y+dy)
        # crosses the boundary — shift by ±prd. Decomposed axes: the halo
        # slab arrived pre-shifted from the neighbor, zs/ys = 0.
        zero = jnp.zeros((), jnp.float32)
        zs = zero if dec_z else jnp.where(
            z + dz < 0, -prz,
            jnp.where(z + dz >= nbz, prz, 0.0)).astype(jnp.float32)
        ys = zero if dec_y else jnp.where(
            y + dy < 0, -pry,
            jnp.where(y + dy >= nby, pry, 0.0)).astype(jnp.float32)
        k = (dz + 1) * 3 + (dy + 1)
        j0 = j_refs[0 * 9 + k][0, 0][:, None, :]   # (nbx, 1, LANE)
        j1 = j_refs[1 * 9 + k][0, 0][:, None, :]
        j2 = j_refs[2 * 9 + k][0, 0][:, None, :]
        # periodic image shifts fold into the (nbx, C) xi rows instead of
        # the (nbx, LANE) candidates — 2 fewer VPU ops per candidate lane
        # (one f32 rounding apart from xi - (j + s); self pairs sit on the
        # dz=dy=0 row where both shifts are exactly 0). Same trim as
        # ops/lj_pallas.py.
        xi1s = xi[1] if dec_y else xi[1] - ys
        xi2s = xi[2] if dec_z else xi[2] - zs
        d0 = xi[0][:, :, None] - j0                # (nbx, C, LANE)
        d1 = xi1s[:, :, None] - j1
        d2 = xi2s[:, :, None] - j2
        rsq = d0 * d0 + d1 * d1 + d2 * d2
        mask = rsq < cutsq
        if dz == 0 and dy == 0:
            mask = mask & ~self_mask_2d()[None, :, :]
        # no masking blend: sentinels are >=1e3 apart (cells.py) so masked
        # rsq is large-but-finite and the eval clamps keep polys bounded.
        # Callers select on the bool mask (1 VPU op) instead of the old
        # cvt-to-f32 + multiply (2 ops) — bit-identical (values finite).
        # Negative result (measured 2026-08-17, v5e 131k deck): replacing
        # the sqrt with a bit-trick rsqrt seed + Newton steps (the LJ
        # kernel's pl.reciprocal trick has no rsqrt analog in Mosaic) is
        # SLOWER (13.48-13.80 vs 13.93 Matom-steps/s) and the seed error
        # through the degree-20 Horner bodies costs 1e-4..4e-2 of force
        # scale — TPU sqrt is cheap, unlike divide. Don't re-walk.
        r = jnp.sqrt(rsq)
        return (d0, d1, d2), rsq, r, mask

    pack_xi = xi_src == "pack"

    def rho_kernel(*refs):
        j_refs = refs[0:27]
        if pack_xi:
            # own-row coordinates from the candidate pack's center block
            # (lanes [C, 2C)) — the raw grids never materialize in HBM
            rho_ref = refs[27]
            xi = [j_refs[c * 9 + 4][0, 0][:, C:2 * C] for c in range(3)]
        else:
            xi_refs = refs[27:30]
            rho_ref = refs[30]
            xi = [xr[0, 0] for xr in xi_refs]
        z = pl.program_id(0)
        y = pl.program_id(1)
        rho = jnp.zeros((nbx, C), jnp.float32)
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                _, _, r, mask = pair_r(j_refs, xi, dz, dy, z, y)
                val = eval_pair_fns(r, polys, ("R",))["R"]
                rho = rho + jnp.sum(jnp.where(mask, val, 0.0), axis=-1)
        rho_ref[0, 0] = rho

    def force_kernel(*refs, evflag: bool):
        j_refs = refs[0:27]
        fp_refs = refs[27:36]     # packed fp rows, (dz, dy) wrapped views
        if pack_xi:
            f_ref, eng_ref, vir_ref = refs[36], refs[37], refs[38]
            xi = [j_refs[c * 9 + 4][0, 0][:, C:2 * C] for c in range(3)]
            fp_i = fp_refs[4][0, 0][:, C:2 * C]    # own fp, center block
        else:
            xi_refs = refs[36:39]
            fpi_ref = refs[39]    # (1, 1, nbx, C) own fp
            f_ref, eng_ref, vir_ref = refs[40], refs[41], refs[42]
            xi = [xr[0, 0] for xr in xi_refs]
            fp_i = fpi_ref[0, 0]                   # (nbx, C)
        z = pl.program_id(0)
        y = pl.program_id(1)

        @pl.when((z == 0) & (y == 0))
        def _init():
            eng_ref[...] = jnp.zeros((8, 128), jnp.float32)
            vir_ref[...] = jnp.zeros((8, 128), jnp.float32)

        facc = [jnp.zeros((nbx, C), jnp.float32) for _ in range(3)]
        eng = jnp.zeros((), jnp.float32)
        vir = jnp.zeros((), jnp.float32)
        names = ("G1", "G2", "P") if evflag else ("G1", "G2")

        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                (d0, d1, d2), rsq, r, mask = pair_r(j_refs, xi, dz, dy, z, y)
                g = eval_pair_fns(r, polys, names)
                k = (dz + 1) * 3 + (dy + 1)
                fp_j = fp_refs[k][0, 0][:, None, :]       # (nbx, 1, LANE)
                psip = (fp_i[:, :, None] + fp_j) * g["G1"] + g["G2"]
                # fpair = -psip on in-cut lanes; the negation folds into
                # the accumulating subtractions (a - b == a + (-b) in f32)
                sel = jnp.where(mask, psip, 0.0)
                facc[0] = facc[0] - jnp.sum(sel * d0, axis=-1)
                facc[1] = facc[1] - jnp.sum(sel * d1, axis=-1)
                facc[2] = facc[2] - jnp.sum(sel * d2, axis=-1)
                if evflag:
                    eng = eng + jnp.sum(jnp.where(mask, g["P"], 0.0))
                    vir = vir - 0.5 * jnp.sum(rsq * sel)

        f_ref[0, 0, 0] = facc[0]
        f_ref[1, 0, 0] = facc[1]
        f_ref[2, 0, 0] = facc[2]
        if evflag:
            # per-program accumulator cells: tree-shaped cross-program sum
            cell = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == z % 8) & (
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == y % 128)
            eng_ref[...] += jnp.where(cell, eng, 0.0)
            vir_ref[...] += jnp.where(cell, vir, 0.0)

    xi_spec = pl.BlockSpec((1, 1, nbx, C), lambda z, y: (z, y, 0, 0),
                           memory_space=pltpu.VMEM)

    # inside shard_map, pallas outputs must declare how they vary across
    # the mesh (check_vma); device-local outputs vary over every axis
    _vma = {"vma": frozenset(("z", "y", "x"))} if nb_local is not None else {}

    rho_call = pl.pallas_call(
        rho_kernel,
        grid=(nbz, nby),
        in_specs=wrapped_specs(3) + ([] if pack_xi else [xi_spec] * 3),
        out_specs=xi_spec,
        out_shape=jax.ShapeDtypeStruct((nbz, nby, nbx, C), jnp.float32,
                                       **_vma),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    # the XLA jnp.take embedding measured 4.3 ms/step at 131k (~8
    # cycles/element TPU gathers) — the chunked dynamic_gather kernel is
    # bit-identical and ~200x faster
    embed_noev_p, embed_ev_p = make_embedding_pallas(
        tables, M, interpret=interpret,
        vma=("z", "y", "x") if nb_local is not None else None)

    def build(evflag: bool):
        fspec = pl.BlockSpec((3, 1, 1, nbx, C), lambda z, y: (0, z, y, 0, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((8, 128), lambda z, y: (0, 0),
                             memory_space=pltpu.VMEM)
        force_call = pl.pallas_call(
            functools.partial(force_kernel, evflag=evflag),
            grid=(nbz, nby),
            in_specs=(wrapped_specs(3) + wrapped_specs(1)
                      + ([] if pack_xi else [xi_spec] * 4)),
            out_specs=(fspec, sspec, sspec),
            out_shape=(
                jax.ShapeDtypeStruct((3, nbz, nby, nbx, C), jnp.float32,
                                     **_vma),
                jax.ShapeDtypeStruct((8, 128), jnp.float32, **_vma),
                jax.ShapeDtypeStruct((8, 128), jnp.float32, **_vma),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

        def force(x, typ):
            del typ
            # x: (3, M) array OR a 3-tuple of flat (M,) arrays (sim.py's
            # triple carry — see ops/lj_pallas.py force() for the tiling
            # rationale); both index per coordinate the same way
            triple = isinstance(x, (tuple, list))
            g = [x[c].reshape(nbz, nby, nbx, C) for c in range(3)]
            J = [pack_candidates(g[c], c) for c in range(3)]
            jargs = [J[c] for c in range(3) for _off in range(9)]

            rho = rho_call(*jargs) if pack_xi else rho_call(*jargs, *g)
            valid = x[0] < 0.5 * _SENTINEL_BASE
            if evflag:
                fp, emb = embed_ev_p(rho.reshape(M), valid)
                embed_eng = jnp.sum(emb)
            else:
                fp = embed_noev_p(rho.reshape(M))
                embed_eng = jnp.zeros((), dtype)
            if fp_exchange is not None:
                fp = fp_exchange(fp)
            # fp halo: the reference's mid-force communicate — a scalar
            # field, so the pack needs no boundary coordinate fix (and the
            # exchange hooks key their shift on c, so c = -1 ships fp raw)
            fpg = fp.reshape(nbz, nby, nbx, C)
            FP = pack_candidates(fpg, -1)

            fargs = jargs + [FP] * 9
            if not pack_xi:
                fargs = fargs + g + [fpg]
            f, eng, vir = force_call(*fargs)
            eng_vdwl = 2.0 * (embed_eng + 0.5 * jnp.sum(eng))
            if triple:
                f = tuple(f[c].reshape(M) for c in range(3))
            else:
                f = f.reshape(3, M)
            return f, eng_vdwl, jnp.sum(vir)

        force.accepts_triple = True
        return force

    return build(True), build(False)


def make_embedding_pallas(tables: EAMTables, M: int, interpret: bool = False,
                          vma=None):
    """Pallas embedding evaluators: rho -> fp = F'(rho) (and the embedding
    energy on evflag), bit-identical to the XLA spline-gather idiom
    (force_eam.cpp:337-347 / the embedding() helpers here).

    Why: XLA TPU gathers run at ~8 cycles/element — the three per-atom
    `jnp.take`s of the noev embedding measured 4.3 ms/step at 131k, a
    THIRD of the whole EAM step. Mosaic's per-lane dynamic_gather is fast
    but limited to one vreg (<=128 entries) along the gather dim, so the
    501-row frho table is gathered in four 128-entry chunks merged by a
    `m >> 7` select chain. Identical rows, identical arithmetic order.

    Returns (embed_noev, embed_ev): embed_noev(rho) -> fp;
    embed_ev(rho, valid_f32) -> (fp, emb) with emb zeroed on invalid slots
    (XLA sums it).
    """
    import numpy as _np

    nrho = tables.nrho
    rdrho = 1.0 / tables.drho
    n_chunks = -(-(nrho + 1) // 128)
    tab_np = _np.zeros((7, n_chunks * 128), _np.float32)
    tab_np[:, : nrho + 1] = tables.frho_spline.T.astype(_np.float32)
    tab = jnp.asarray(tab_np)

    M2 = -(-M // 128) * 128          # pad to lane alignment (cheap concat)
    R = M2 // 128

    def lookup(tab_ref, c, m):
        parts = []
        for ch in range(n_chunks):
            src = jnp.broadcast_to(
                tab_ref[c, ch * 128:(ch + 1) * 128][None, :], (R, 128))
            idx = jnp.clip(m - ch * 128, 0, 127)
            parts.append(jnp.take_along_axis(src, idx, axis=1))
        mdiv = m >> 7
        out = parts[-1]
        for ch in range(n_chunks - 2, -1, -1):
            out = jnp.where(mdiv == ch, parts[ch], out)
        return out

    def kernel(rho_ref, tab_ref, *out_refs, evflag: bool):
        rho = rho_ref[...]                       # (R, 128)
        p = rho * rdrho + 1.0
        m = jnp.clip(p.astype(jnp.int32), 1, nrho - 1)
        pf = jnp.minimum(p - m.astype(jnp.float32), 1.0)
        c0 = lookup(tab_ref, 0, m)
        c1 = lookup(tab_ref, 1, m)
        c2 = lookup(tab_ref, 2, m)
        out_refs[0][...] = (c0 * pf + c1) * pf + c2
        if evflag:
            c3 = lookup(tab_ref, 3, m)
            c4 = lookup(tab_ref, 4, m)
            c5 = lookup(tab_ref, 5, m)
            c6 = lookup(tab_ref, 6, m)
            out_refs[1][...] = ((c3 * pf + c4) * pf + c5) * pf + c6

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    _vma = {"vma": frozenset(vma)} if vma is not None else {}
    noev_call = pl.pallas_call(
        functools.partial(kernel, evflag=False),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32, **_vma),
        in_specs=[vm, vm], out_specs=vm,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    ev_call = pl.pallas_call(
        functools.partial(kernel, evflag=True),
        out_shape=(jax.ShapeDtypeStruct((R, 128), jnp.float32, **_vma),) * 2,
        in_specs=[vm, vm], out_specs=(vm, vm),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def _pad(rho):
        if M2 == M:
            return rho.reshape(R, 128)
        return jnp.concatenate(
            [rho, jnp.zeros((M2 - M,), rho.dtype)]).reshape(R, 128)

    def embed_noev(rho):
        return noev_call(_pad(rho), tab).reshape(M2)[:M]

    def embed_ev(rho, valid):
        fp, emb = ev_call(_pad(rho), tab)
        return (fp.reshape(M2)[:M],
                jnp.where(valid, emb.reshape(M2)[:M], 0.0))

    return embed_noev, embed_ev
