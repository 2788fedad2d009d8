"""Half-neighbor EAM force — the parity option for the reference's
half-list EAM path (ref/force_eam.cpp:126-267, compute_halfneigh).

Each unordered pair is evaluated once: the stencil is restricted to
lexicographically-positive offsets (plus an i<j triangular mask for the
self cell). Newton's third law is rendered scatter-free exactly like
ops/lj_half.py: the j side accumulates into halo-PADDED grids whose halo
shells are folded back onto the periodic interior afterwards. EAM needs
that fold TWICE — once for the pass-1 densities (the reference's declared
reverse-comm of rho, force_eam.cpp:918-942) and once for the pass-2 forces
(comm.cpp:320-361 reverse_communicate).

Spline evaluation is the reference's exact idiom (force_eam.cpp:152-158)
via the same helpers as ops/eam.py, so f64 runs match the full-stencil
exact path digit-for-digit up to summation order. Energy/virial are
returned in the full-neighbor convention (eng = 2*(embed + half-sum),
vir = half-sum — force_eam.cpp:446) so thermo accounting is unchanged.

Like the LJ half path, this is measured slower than the full-stencil
kernels on TPU (j-side reductions + halo folds outweigh the halved pair
count); it exists for --half_neigh 1 parity (SURVEY.md §2.4 P7).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..cells import CellGeometry, _SENTINEL_BASE
from .eam import EAMTables, _eval_deriv, _eval_value
from .lj_half import _fold_halo
from .pairgrid import halo_extent, pad_grid_int, stencil_slice, to_padded_soa


def make_eam_force_half(geom: CellGeometry, tables: EAMTables,
                        ntypes: int = 1, dtype=jnp.float32,
                        fp_exchange=None, nb_local=None, exchanges=None,
                        folds=None):
    """(force_ev, force_noev) closures: (x, typ) -> (f, eng_vdwl, virial).

    Sharded (nb_local + exchanges + folds given): forward halos (positions
    and the mid-force fp) ride the `exchanges` ppermute hooks; the Newton
    folds of rho and f return j-side accumulations through the `folds`
    hooks (the reference's MPI half-list EAM: force_eam.cpp:126-267 with
    reverse comms at :918-942 and comm.cpp:320-361)."""
    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    nb = (nbx, nby, nbz)
    C = geom.capacity
    h = halo_extent(geom)
    M = nbx * nby * nbz * C
    tri = jnp.triu(jnp.ones((C, C), dtype=bool), k=1)

    # lexicographically-positive half of the stencil (z, y, x precedence),
    # the dense rendering of the reference's half-list skip rules
    # (neighbor.cpp:154-157)
    half = [tuple(int(v) for v in o) for o in geom.stencil
            if (o[2], o[1], o[0]) > (0, 0, 0)]

    rhor_sp = jnp.asarray(tables.rhor_spline, dtype=dtype)
    frho_sp = jnp.asarray(tables.frho_spline, dtype=dtype)
    z2r_sp = jnp.asarray(tables.z2r_spline, dtype=dtype)
    rdr = jnp.asarray(1.0 / tables.dr, dtype)
    rdrho = jnp.asarray(1.0 / tables.drho, dtype)
    cutsq = jnp.asarray(tables.cut * tables.cut, dtype)
    nr, nrho = tables.nr, tables.nrho

    def spline_idx(rsq, mask):
        r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
        p = r * rdr + 1.0
        m = jnp.minimum(p.astype(jnp.int32), nr - 1)
        p = jnp.minimum(p - m.astype(dtype), 1.0)
        return r, m, p

    def embedding(rho, valid, evflag):
        p = rho * rdrho + 1.0
        m = jnp.clip(p.astype(jnp.int32), 1, nrho - 1)
        p = jnp.minimum(p - m.astype(dtype), 1.0)
        fp = _eval_deriv(frho_sp, m, p)
        if evflag:
            emb = jnp.where(valid, _eval_value(frho_sp, m, p), 0.0)
            return fp, jnp.sum(emb)
        return fp, jnp.zeros((), dtype)

    def _force(x, typ, evflag: bool):
        del typ  # single-funcfl: all type pairs share the table
        Xp = to_padded_soa(x, geom, h, nb_local=nb, exchanges=exchanges)
        Xi = [stencil_slice(g, (0, 0, 0), h, nb) for g in Xp]
        valid = x[0] < 0.5 * _SENTINEL_BASE
        pshape = Xp[0].shape

        def pair(off):
            Yd = (Xi if off is None
                  else [stencil_slice(g, off, h, nb) for g in Xp])
            d = [Xi[c][..., :, None] - Yd[c][..., None, :] for c in range(3)]
            rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            mask = rsq < cutsq
            if off is None:
                mask = mask & tri
            return d, rsq, mask

        # ---- pass 1: densities, both directions per pair
        rho = jnp.zeros((nbz, nby, nbx, C), dtype)
        rho_pad = jnp.zeros(pshape, dtype)
        for off in half + [None]:
            _, rsq, mask = pair(off)
            _, m, p = spline_idx(rsq, mask)
            val = jnp.where(mask, _eval_value(rhor_sp, m, p), 0.0)
            rho = rho + jnp.sum(val, axis=-1)
            rj = jnp.sum(val, axis=-2)
            if off is None:
                rho = rho + rj
            else:
                ox, oy, oz = off
                rho_pad = rho_pad.at[h + oz: h + oz + nbz,
                                     h + oy: h + oy + nby,
                                     h + ox: h + ox + nbx].add(rj)
        # Newton reverse-comm of the halo densities (force_eam.cpp:918-942)
        rho = rho + _fold_halo(rho_pad, h, folds=folds)

        fp, embed_eng = embedding(rho.reshape(M), valid, evflag)
        if fp_exchange is not None:
            fp = fp_exchange(fp)
        # fp halo: the reference's mid-force communicate (force_eam.cpp:851)
        fp_pad = pad_grid_int(fp, geom, h, nb_local=nb, exchanges=exchanges)
        fp_i = stencil_slice(fp_pad, (0, 0, 0), h, nb)

        # ---- pass 2: forces
        f = [jnp.zeros((nbz, nby, nbx, C), dtype) for _ in range(3)]
        fpad = [jnp.zeros(pshape, dtype) for _ in range(3)]
        eng = jnp.zeros((), dtype)
        vir = jnp.zeros((), dtype)
        for off in half + [None]:
            d, rsq, mask = pair(off)
            r, m, p = spline_idx(rsq, mask)
            rhoip = _eval_deriv(rhor_sp, m, p)
            z2p = _eval_deriv(z2r_sp, m, p)
            z2 = _eval_value(z2r_sp, m, p)
            recip = 1.0 / r
            phi = z2 * recip
            phip = z2p * recip - phi * recip
            fp_j = (fp_i if off is None
                    else stencil_slice(fp_pad, off, h, nb))
            psip = (fp_i[..., :, None] + fp_j[..., None, :]) * rhoip + phip
            fpair = jnp.where(mask, -psip * recip, 0.0)
            for c in range(3):
                fi = jnp.sum(fpair * d[c], axis=-1)
                fj = -jnp.sum(fpair * d[c], axis=-2)
                f[c] = f[c] + fi
                if off is None:
                    f[c] = f[c] + fj
                else:
                    ox, oy, oz = off
                    fpad[c] = fpad[c].at[h + oz: h + oz + nbz,
                                         h + oy: h + oy + nby,
                                         h + ox: h + ox + nbx].add(fj)
            if evflag:
                eng = eng + jnp.sum(jnp.where(mask, phi, 0.0))
                vir = vir + jnp.sum(rsq * fpair)

        for c in range(3):
            f[c] = f[c] + _fold_halo(fpad[c], h, folds=folds)

        fout = jnp.stack([fc.reshape(M) for fc in f], axis=0)
        # full-neighbor convention downstream (force_eam.cpp:446): the
        # ordered-pair sum is 2x the half sum
        eng_vdwl = 2.0 * (embed_eng + eng)
        return fout, eng_vdwl, vir

    def force_ev(x, typ):
        return _force(x, typ, True)

    def force_noev(x, typ):
        return _force(x, typ, False)

    return force_ev, force_noev
