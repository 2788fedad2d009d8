"""EAM (embedded-atom) force: dense two-pass cell-pair kernel.

TPU-native redesign of ref/force_eam.cpp:274-449 (compute_fullneigh):

  pass 1: per-atom electron density rho_i = sum spline(rhor, r_ij),
          embedding derivative fp_i = spline'(frho, rho_i), embed energy
  [multi-chip: fp halo exchange happens between the passes — the
   reference's mid-force communicate(), force_eam.cpp:851-887]
  pass 2: pair forces psip = fp_i*rho' + fp_j*rho' + phi', phi = z2/r

Spline evaluation is the reference's exact idiom (force_eam.cpp:152-158):
p = r*rdr + 1; m = int(p) (clamped); cubic Horner on row m. The tables are
tiny (500 x 7 doubles) so the per-pair coefficient gathers stay cheap.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cells import CellGeometry, _SENTINEL_BASE
from ..eam_file import array2spline, default_potential_path, file2array, read_funcfl
from .lj import _pick_chunk


@dataclasses.dataclass(frozen=True)
class EAMTables:
    mass: float
    cut: float
    nrho: int
    drho: float
    nr: int
    dr: float
    frho_spline: np.ndarray   # (nrho+1, 7)
    rhor_spline: np.ndarray   # (nr+1, 7)
    z2r_spline: np.ndarray    # (nr+1, 7)

    @staticmethod
    def from_funcfl(path=None) -> "EAMTables":
        f = read_funcfl(path or default_potential_path())
        nrho, drho, nr, dr, frho, rhor, z2r = file2array(f)
        return EAMTables(
            mass=f.mass, cut=f.cut, nrho=nrho, drho=drho, nr=nr, dr=dr,
            frho_spline=array2spline(nrho, drho, frho),
            rhor_spline=array2spline(nr, dr, rhor),
            z2r_spline=array2spline(nr, dr, z2r),
        )


def _eval_deriv(sp, m, p):
    """(sp[m,0]*p + sp[m,1])*p + sp[m,2] — derivative part of a spline row."""
    return (jnp.take(sp[:, 0], m) * p + jnp.take(sp[:, 1], m)) * p + jnp.take(sp[:, 2], m)


def _eval_value(sp, m, p):
    """((sp[m,3]*p + sp[m,4])*p + sp[m,5])*p + sp[m,6] — value part."""
    return ((jnp.take(sp[:, 3], m) * p + jnp.take(sp[:, 4], m)) * p
            + jnp.take(sp[:, 5], m)) * p + jnp.take(sp[:, 6], m)


def make_eam_force(geom: CellGeometry, tables: EAMTables, ntypes: int = 1,
                   dtype=jnp.float32, cell_chunk: int | None = None,
                   fp_exchange=None):
    """Build a jittable f(x, typ) -> (f, eng_vdwl, virial) closure.

    `fp_exchange`: optional hook (fp_array -> fp_array) applied between the
    density and force passes; the multi-chip halo of the embedding
    derivative plugs in here (single chip: identity).

    Types are accepted for API parity but all pairs share one funcfl table,
    exactly like the reference (force_eam.cpp:753-760 replicates one table
    across every type pair).
    """
    ncells, C, S = geom.ncells, geom.capacity, geom.nstencil
    M = geom.nslots
    CB = cell_chunk or _pick_chunk(ncells, C, S)
    nchunk = ncells // CB

    cand_cell = jnp.asarray(geom.cand_cell)
    prd = np.asarray(geom.prd, dtype=np.float64)
    shift = jnp.asarray(geom.cand_shift.astype(np.float64) * prd, dtype=dtype)

    cand_c = cand_cell.reshape(nchunk, CB, S)
    shift_c = shift.reshape(nchunk, CB, S, 3)
    cell_idx_c = jnp.arange(ncells, dtype=jnp.int32).reshape(nchunk, CB)
    lane = jnp.arange(C, dtype=jnp.int32)

    rhor_sp = jnp.asarray(tables.rhor_spline, dtype=dtype)
    frho_sp = jnp.asarray(tables.frho_spline, dtype=dtype)
    z2r_sp = jnp.asarray(tables.z2r_spline, dtype=dtype)
    rdr = jnp.asarray(1.0 / tables.dr, dtype)
    rdrho = jnp.asarray(1.0 / tables.drho, dtype)
    cutsq = jnp.asarray(tables.cut * tables.cut, dtype)
    nr, nrho = tables.nr, tables.nrho

    def pair_geometry(xc, cand, shf, cidx):
        xj = (xc[cand] + shf[:, :, None, :]).reshape(CB, S * C, 3)
        xi = xc[cidx]
        jslot = (cand[:, :, None] * C + lane).reshape(CB, 1, S * C)
        islot = (cidx[:, None] * C + lane)[:, :, None]
        img0 = jnp.all(shf == 0.0, axis=-1)
        img0 = jnp.broadcast_to(img0[:, :, None], (CB, S, C)).reshape(CB, 1, S * C)
        is_self = (islot == jslot) & img0
        delta = xi[:, :, None, :] - xj[:, None, :, :]
        rsq = jnp.sum(delta * delta, axis=-1)
        mask = (rsq < cutsq) & ~is_self
        return delta, rsq, mask

    def r_spline_index(rsq, mask):
        r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
        p = r * rdr + 1.0
        m = jnp.minimum(p.astype(jnp.int32), nr - 1)
        p = jnp.minimum(p - m.astype(dtype), 1.0)
        return r, m, p

    def density_chunk(xc, args):
        cand, shf, cidx = args
        _, rsq, mask = pair_geometry(xc, cand, shf, cidx)
        _, m, p = r_spline_index(rsq, mask)
        contrib = _eval_value(rhor_sp, m, p)
        return jnp.sum(jnp.where(mask, contrib, 0.0), axis=-1)   # (CB, C)

    def embedding(rho, valid):
        """fp = F'(rho), embed energy F(rho) (force_eam.cpp:337-347)."""
        p = rho * rdrho + 1.0
        m = jnp.clip(p.astype(jnp.int32), 1, nrho - 1)
        p = jnp.minimum(p - m.astype(dtype), 1.0)
        fp = _eval_deriv(frho_sp, m, p)
        embed = jnp.where(valid, _eval_value(frho_sp, m, p), 0.0)
        return fp, jnp.sum(embed)

    def force_chunk(xc, fpc_all, fp_flat_cells, args):
        cand, shf, cidx = args
        delta, rsq, mask = pair_geometry(xc, cand, shf, cidx)
        r, m, p = r_spline_index(rsq, mask)

        rhoip = _eval_deriv(rhor_sp, m, p)
        z2p = _eval_deriv(z2r_sp, m, p)
        z2 = _eval_value(z2r_sp, m, p)

        recip = 1.0 / r
        phi = z2 * recip
        phip = z2p * recip - phi * recip
        fp_i = fpc_all[cidx][:, :, None]                       # (CB, C, 1)
        fp_j = fp_flat_cells[cand].reshape(CB, 1, S * C)
        psip = fp_i * rhoip + fp_j * rhoip + phip
        fpair = jnp.where(mask, -psip * recip, 0.0)

        fi = jnp.einsum("bcs,bcsd->bcd", fpair, delta)
        vir = 0.5 * jnp.sum(rsq * fpair)
        eng = 0.5 * jnp.sum(jnp.where(mask, phi, 0.0))
        return fi, eng, vir

    def force(x, typ):
        del typ  # single-table EAM: types don't differentiate (see docstring)
        xc = x.T.reshape(ncells, C, 3)
        valid = x[0] < 0.5 * _SENTINEL_BASE

        rho = jax.lax.map(partial(density_chunk, xc), (cand_c, shift_c, cell_idx_c))
        rho = rho.reshape(M)
        fp, embed_eng = embedding(rho, valid)
        if fp_exchange is not None:
            fp = fp_exchange(fp)

        fpc = fp.reshape(ncells, C)
        fis, engs, virs = jax.lax.map(
            partial(force_chunk, xc, fpc, fpc), (cand_c, shift_c, cell_idx_c)
        )
        f = fis.reshape(M, 3).T
        eng_vdwl = 2.0 * (embed_eng + jnp.sum(engs))   # force_eam.cpp:446
        return f, eng_vdwl, jnp.sum(virs)

    return force
