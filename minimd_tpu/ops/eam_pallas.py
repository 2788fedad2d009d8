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
from ..eam_file import build_pair_polys
from .eam import EAMTables
from .eam_grid import eval_pair_fns
from .pairgrid import halo_extent, pad_grid_int, to_padded_soa

_BIG = 5.0e5


def _round_up(n, m):
    return (n + m - 1) // m * m


def make_eam_force_pallas(geom: CellGeometry, tables: EAMTables,
                          ntypes: int = 1, dtype=jnp.float32,
                          degree: int | None = None, interpret: bool = False,
                          nb_local=None, exchanges=None, fp_exchange=None):
    """(force_ev, force_noev) closures: (x, typ) -> (f, eng_vdwl, virial).

    nb_local/exchanges/fp_exchange: device-local grid shape and halo hooks
    for sharded execution (same contract as make_eam_force_grid); the
    embedding-derivative halo between the passes rides the same hooks."""
    assert dtype == jnp.float32, "pallas EAM kernel is f32"
    h = halo_extent(geom)
    assert h == 1, "pallas EAM kernel assumes binsize >= cutneigh"

    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    nb_loc = (nbx, nby, nbz)
    C = geom.capacity
    M = nbx * nby * nbz * C
    Yp = nby + 2
    LANE = _round_up(3 * C, 128)

    polys = build_pair_polys(tables, degree=degree)
    cutsq = float(tables.cut ** 2)

    frho_sp = jnp.asarray(tables.frho_spline, dtype=dtype)
    rdrho = 1.0 / tables.drho
    nrho = tables.nrho

    def self_mask_2d():
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 1)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 0)
        return (lane_i // C == 1) & (lane_i % C == sub_i) & (lane_i < 3 * C)

    def pair_r(j_refs, xi, dz, dy):
        k = (dz + 1) * 3 + (dy + 1)
        j0 = j_refs[0 * 9 + k][0, 0][:, None, :]   # (nbx, 1, LANE)
        j1 = j_refs[1 * 9 + k][0, 0][:, None, :]
        j2 = j_refs[2 * 9 + k][0, 0][:, None, :]
        d0 = xi[0][:, :, None] - j0                # (nbx, C, LANE)
        d1 = xi[1][:, :, None] - j1
        d2 = xi[2][:, :, None] - j2
        rsq = d0 * d0 + d1 * d1 + d2 * d2
        mask = rsq < cutsq
        if dz == 0 and dy == 0:
            mask = mask & ~self_mask_2d()[None, :, :]
        m = mask.astype(jnp.float32)
        # no masking blend: sentinels are >=1e3 apart (cells.py) so masked
        # rsq is large-but-finite and the eval clamps keep polys bounded
        r = jnp.sqrt(rsq)
        return (d0, d1, d2), rsq, r, m

    # ------------------------------------------------------------------
    # pass 1: rho
    # ------------------------------------------------------------------
    def rho_kernel(*refs):
        j_refs = refs[0:27]
        xi_refs = refs[27:30]
        rho_ref = refs[30]
        xi = [xr[0, 0] for xr in xi_refs]
        rho = jnp.zeros((nbx, C), jnp.float32)
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                _, _, r, m = pair_r(j_refs, xi, dz, dy)
                val = eval_pair_fns(r, polys, ("R",))["R"]
                rho = rho + jnp.sum(val * m, axis=-1)
        rho_ref[0, 0] = rho

    # ------------------------------------------------------------------
    # pass 2: forces (needs fp of i and of candidates)
    # ------------------------------------------------------------------
    def force_kernel(*refs, evflag: bool):
        j_refs = refs[0:27]
        fp_refs = refs[27:36]    # lane-packed fp rows, (dz, dy) views
        xi_refs = refs[36:39]
        fpi_ref = refs[39]       # (1, 1, nbx, C) own fp
        f_refs = refs[40:43]
        eng_ref, vir_ref = refs[43], refs[44]

        xi = [xr[0, 0] for xr in xi_refs]
        fp_i = fpi_ref[0, 0]                    # (nbx, C)

        facc = [jnp.zeros((nbx, C), jnp.float32) for _ in range(3)]
        eng = jnp.zeros((), jnp.float32)
        vir = jnp.zeros((), jnp.float32)
        names = ("G1", "G2", "P") if evflag else ("G1", "G2")

        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                (d0, d1, d2), rsq, r, m = pair_r(j_refs, xi, dz, dy)
                g = eval_pair_fns(r, polys, names)
                k = (dz + 1) * 3 + (dy + 1)
                fp_j = fp_refs[k][0, 0][:, None, :]       # (nbx, 1, LANE)
                psip = (fp_i[:, :, None] + fp_j) * g["G1"] + g["G2"]
                fpair = -psip * m
                facc[0] = facc[0] + jnp.sum(fpair * d0, axis=-1)
                facc[1] = facc[1] + jnp.sum(fpair * d1, axis=-1)
                facc[2] = facc[2] + jnp.sum(fpair * d2, axis=-1)
                if evflag:
                    eng = eng + jnp.sum(g["P"] * m)
                    vir = vir + 0.5 * jnp.sum(rsq * fpair)

        for i in range(3):
            f_refs[i][0, 0] = facc[i]
        cell00 = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0) & (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
        if evflag:
            eng_ref[0, 0] = jnp.where(cell00, eng, 0.0)
            vir_ref[0, 0] = jnp.where(cell00, vir, 0.0)
        else:
            eng_ref[0, 0] = jnp.zeros((8, 128), jnp.float32)
            vir_ref[0, 0] = jnp.zeros((8, 128), jnp.float32)

    # ------------------------------------------------------------------
    # packing + glue
    # ------------------------------------------------------------------
    def pack_lanes(g):
        """padded (Zp, Yp, Xp_cells, C) -> (Zp, Yp, nbx, LANE)."""
        j = jnp.concatenate([g[:, :, 0:nbx], g[:, :, 1:nbx + 1],
                             g[:, :, 2:nbx + 2]], axis=-1)
        if LANE > 3 * C:
            pad = jnp.full((*j.shape[:-1], LANE - 3 * C), _BIG, j.dtype)
            j = jnp.concatenate([j, pad], axis=-1)
        return j.reshape(nbz + 2, Yp, nbx, LANE)

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

    # nine (dz, dy)-offset single-row views per packed array: VMEM stays
    # constant at any system size (same trick as lj_pallas)
    def view_specs(n_coords):
        return [
            pl.BlockSpec((1, 1, nbx, LANE),
                         functools.partial(
                             lambda dz, dy, z, y: (z + dz, y + dy, 0, 0),
                             dz, dy),
                         memory_space=pltpu.VMEM)
            for _c in range(n_coords) for dz in (0, 1, 2) for dy in (0, 1, 2)
        ]

    row_spec = pl.BlockSpec((1, 1, nbx, C), lambda z, y: (z, y, 0, 0),
                            memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, 8, 128), lambda z, y: (z, y, 0, 0),
                          memory_space=pltpu.VMEM)

    # inside shard_map, pallas outputs must declare how they vary across
    # the mesh (check_vma); device-local outputs vary over every axis
    _vma = {"vma": frozenset(("z", "y", "x"))} if nb_local is not None else {}

    rho_call = pl.pallas_call(
        rho_kernel,
        grid=(nbz, nby),
        in_specs=view_specs(3) + [row_spec] * 3,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((nbz, nby, nbx, C), jnp.float32,
                                       **_vma),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def build(evflag: bool):
        force_call = pl.pallas_call(
            functools.partial(force_kernel, evflag=evflag),
            grid=(nbz, nby),
            in_specs=view_specs(3) + view_specs(1) + [row_spec] * 4,
            out_specs=(row_spec, row_spec, row_spec, s_spec, s_spec),
            out_shape=(
                *(jax.ShapeDtypeStruct((nbz, nby, nbx, C), jnp.float32,
                                       **_vma),) * 3,
                jax.ShapeDtypeStruct((nbz, nby, 8, 128), jnp.float32,
                                     **_vma),
                jax.ShapeDtypeStruct((nbz, nby, 8, 128), jnp.float32,
                                     **_vma),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

        def force(x, typ):
            del typ
            Xp = to_padded_soa(x, geom, h, nb_local=nb_loc,
                               exchanges=exchanges)
            J = [pack_lanes(g) for g in Xp]
            Xi = [g[1:-1, 1:-1, 1:nbx + 1] for g in Xp]
            jargs = [J[c] for c in range(3) for _off in range(9)]

            rho = rho_call(*jargs, *Xi)
            valid = x[0] < 0.5 * _SENTINEL_BASE
            fp, embed_eng = embedding(rho.reshape(M), valid, evflag)
            if fp_exchange is not None:
                fp = fp_exchange(fp)
            # fp halo: the reference's mid-force communicate
            fp_pad = pad_grid_int(fp, geom, h, nb_local=nb_loc,
                                  exchanges=exchanges).astype(jnp.float32)
            FP = pack_lanes(fp_pad)
            fp_i = fp.reshape(nbz, nby, nbx, C)

            f0, f1, f2, eng, vir = force_call(
                *jargs, *([FP] * 9), *Xi, fp_i)
            f = jnp.stack([f0.reshape(M), f1.reshape(M), f2.reshape(M)],
                          axis=0)
            eng_vdwl = 2.0 * (embed_eng + 0.5 * jnp.sum(eng))
            return f, eng_vdwl, jnp.sum(vir)

        return force

    return build(True), build(False)
