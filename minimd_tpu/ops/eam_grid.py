"""EAM force on the halo-padded cell grid — the TPU fast path.

Same dense-stencil structure as the LJ grid kernel (ops/lj_grid.py), with
the reference's two-pass EAM algorithm (ref/force_eam.cpp:274-449):

  pass 1: rho_i = sum_j rhor(r_ij); fp_i = F'(rho_i); embed energy F(rho_i)
  [fp halo exchange hook between the passes — force_eam.cpp:851-887]
  pass 2: fpair = -(fp_i*rho' + fp_j*rho' + phi') / r,  phi = z2(r)/r

Table strategy: the two *pair-hot* functions (rhor, z2r) are evaluated as
global Chebyshev fits via Clenshaw recurrence — lane-uniform scalar
coefficients, zero gathers, forces taken as the exact derivative of the
fitted values (energy/force consistent). Fit error is ~1e-6 relative
(reported in ChebTable.max_rel_err), i.e. at f32 rounding scale: runs are
statistically indistinguishable from the exact tables under the
reference's own acceptance criterion. The per-ATOM embedding function
F(rho) stays bit-exact (spline-row gather over M atoms — cheap).

For exact-table validation (f64, CPU) use ops/eam.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cells import CellGeometry, _SENTINEL_BASE
from ..eam_file import ChebTable, fit_cheb
from .eam import EAMTables
from .pairgrid import halo_extent, pad_grid_int, stencil_slice, to_padded_soa

_RMIN = 1.2  # Cu pairs never get this close below ~2000 K; args are clamped


def clenshaw(u, coeffs):
    """Chebyshev series evaluation; coeffs are python floats (lane-uniform),
    loop unrolls at trace time."""
    b1 = jnp.zeros_like(u)
    b2 = jnp.zeros_like(u)
    for c in coeffs[:0:-1]:
        b1, b2 = c + 2.0 * u * b1 - b2, b1
    return coeffs[0] + u * b1 - b2


def build_cheb_tables(tables: EAMTables, degree: int | None = None):
    """Per-function degrees chosen for <=1e-6 relative fit error
    (z2r is much smoother than rhor)."""
    d_rhor = degree or 20
    d_z2r = degree or 16
    rhor = fit_cheb(tables.rhor_spline, tables.nr, tables.dr,
                    _RMIN, tables.cut, d_rhor)
    z2r = fit_cheb(tables.z2r_spline, tables.nr, tables.dr,
                   _RMIN, tables.cut, d_z2r)
    return rhor, z2r


def make_eam_force_grid(geom: CellGeometry, tables: EAMTables,
                        ntypes: int = 1, dtype=jnp.float32,
                        fp_exchange=None, degree: int | None = None,
                        nb_local=None, exchanges=None):
    """(force_ev, force_noev) closures: (x, typ) -> (f, eng_vdwl, virial).

    nb_local/exchanges: device-local grid shape and per-axis halo exchange
    hooks for sharded execution (see pairgrid.to_padded_soa). The fp halo
    between the passes rides the same hooks — the reference's mid-force
    communicate (force_eam.cpp:851-887)."""
    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    nb_loc = (nbx, nby, nbz)
    C = geom.capacity
    M_loc = nbx * nby * nbz * C
    h = halo_extent(geom)
    offsets = [tuple(int(v) for v in o) for o in geom.stencil]
    diag = jnp.eye(C, dtype=bool)

    cheb_rhor, cheb_z2r = build_cheb_tables(tables, degree)
    cutsq = tables.cut * tables.cut
    lo, hi = cheb_rhor.lo, cheb_rhor.hi
    u_a = 2.0 / (hi - lo)
    u_b = -(hi + lo) / (hi - lo)

    frho_sp = jnp.asarray(tables.frho_spline, dtype=dtype)
    rdrho = 1.0 / tables.drho
    nrho = tables.nrho

    def u_of_r(r):
        return jnp.clip(r * u_a + u_b, -1.0, 1.0)

    def pair_r(Xi, Xp, off):
        Yd = [stencil_slice(g, off, h, nb_loc) for g in Xp]
        d0 = Xi[0][..., :, None] - Yd[0][..., None, :]
        d1 = Xi[1][..., :, None] - Yd[1][..., None, :]
        d2 = Xi[2][..., :, None] - Yd[2][..., None, :]
        rsq = d0 * d0 + d1 * d1 + d2 * d2
        mask = rsq < cutsq
        if off == (0, 0, 0):
            mask = mask & ~diag
        r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
        return (d0, d1, d2), rsq, r, mask

    def embedding(rho, valid, evflag):
        """fp = F'(rho) and embed energy, bit-exact spline gather
        (force_eam.cpp:337-347); per-atom, so the gather is cheap."""
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

    def _force(x, typ, evflag: bool):
        del typ  # single-funcfl: all type pairs share the table
        Xp = to_padded_soa(x, geom, h, nb_local=nb_loc, exchanges=exchanges)
        Xi = [stencil_slice(g, (0, 0, 0), h, nb_loc) for g in Xp]
        valid = x[0] < 0.5 * _SENTINEL_BASE

        # ---- pass 1: densities
        rho = jnp.zeros((nbz, nby, nbx, C), dtype)
        for off in offsets:
            _, _, r, mask = pair_r(Xi, Xp, off)
            val = clenshaw(u_of_r(r), cheb_rhor.coeffs)
            rho = rho + jnp.sum(jnp.where(mask, val, 0.0), axis=-1)

        fp, embed_eng = embedding(rho.reshape(M_loc), valid, evflag)
        if fp_exchange is not None:
            fp = fp_exchange(fp)
        # fp halo (no coordinate shift): the reference's mid-force exchange
        fp_pad = pad_grid_int(fp, geom, h, nb_local=nb_loc,
                              exchanges=exchanges)
        fp_i = stencil_slice(fp_pad, (0, 0, 0), h, nb_loc)

        # ---- pass 2: forces
        f = [jnp.zeros((nbz, nby, nbx, C), dtype) for _ in range(3)]
        eng = jnp.zeros((), dtype)
        vir = jnp.zeros((), dtype)
        for off in offsets:
            (d0, d1, d2), rsq, r, mask = pair_r(Xi, Xp, off)
            u = u_of_r(r)
            rhoip = clenshaw(u, cheb_rhor.deriv)
            z2p = clenshaw(u, cheb_z2r.deriv)
            z2 = clenshaw(u, cheb_z2r.coeffs)
            recip = 1.0 / r
            phi = z2 * recip
            phip = z2p * recip - phi * recip
            fp_j = stencil_slice(fp_pad, off, h, nb_loc)
            psip = (fp_i[..., :, None] + fp_j[..., None, :]) * rhoip + phip
            fpair = jnp.where(mask, -psip * recip, 0.0)
            f[0] = f[0] + jnp.sum(fpair * d0, axis=-1)
            f[1] = f[1] + jnp.sum(fpair * d1, axis=-1)
            f[2] = f[2] + jnp.sum(fpair * d2, axis=-1)
            if evflag:
                eng = eng + jnp.sum(jnp.where(mask, phi, 0.0))
                vir = vir + 0.5 * jnp.sum(rsq * fpair)

        fout = jnp.stack([fd.reshape(M_loc) for fd in f], axis=0)
        eng_vdwl = 2.0 * (embed_eng + 0.5 * eng)     # force_eam.cpp:446
        return fout, eng_vdwl, vir

    def force_ev(x, typ):
        return _force(x, typ, True)

    def force_noev(x, typ):
        return _force(x, typ, False)

    return force_ev, force_noev
