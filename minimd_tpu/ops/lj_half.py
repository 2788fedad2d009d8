"""Half-neighbor LJ force — the parity option for the reference's
`--half_neigh 1` Newton path (ref/force_lj.cpp:185-263).

ghost_newton=True (the reference's default `-gn 1`): each unordered pair
is evaluated once — the stencil is restricted to lexicographically-
positive offsets (plus an i<j triangular mask for the self cell), the i
side accumulates normally, and the j side accumulates into a halo-PADDED
force grid whose halo slabs are folded back onto the opposite interior
edges afterwards — a scatter-free rendering of Newton's third law
(static-slice adds only, like everything else in the hot path). The fold
is the reference's reverse_communicate (ref/comm.cpp:320-361).

ghost_newton=False (the reference's `-gn 0`, ref/force_lj.cpp:239-249 +
neighbor.cpp:154-171): Newton's third law applies among OWN atoms only.
Pairs whose j is a ghost (halo cell) are evaluated by BOTH owners — the
force lands on each owner's own atom and the energy/virial are half-
weighted (scale 0.5, force_lj.cpp:246-248) so the two evaluations sum to
one pair — and no reverse force communication happens at all
(integrate.cpp:188-193 gates reverse_communicate on ghost_newton). In
this dense rendering: positive-offset rows keep their interior j-side
accumulation but DROP the halo shells, and the lexicographically-
NEGATIVE offsets are evaluated masked to halo-j cells only (the pairs
the other owner covers from its positive side). Under gn=0 each ghost
pair's two half-weighted evaluations sum to exactly the one full-weight
evaluation gn=1 performs, so the pre-doubled accounting below holds
unchanged.

Measured ~2x slower than the full-stencil kernels on TPU (the j-side
reductions and the halo-fold adds outweigh the halved pair count — see
CLAUDE.md), so this is a parity/validation option, not the default.

Accounting matches the full-neighbor convention downstream: eng and
virial are pre-doubled here so thermo sees identical magnitudes
(force_lj.cpp:245-253 vs :441-442).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..cells import CellGeometry
from .lj import LJParams
from .pairgrid import halo_extent, stencil_slice, to_padded_soa


def _fold_halo(g, h, folds=None):
    """Add the halo shells of a padded (Z+2h, Y+2h, X+2h, C) grid onto the
    interior and return the interior — the reverse of the halo fill (the
    reference's reverse_communicate for Newton forces, comm.cpp:320-361).

    Axis order (z, then y, then x) is the exact adjoint of the fill's
    x-then-y-then-z swap composition (pairgrid._pad_halo), so edge/corner
    contributions route through the same intermediate hops in reverse —
    like the reference's swaps-in-reverse-order loop (comm.cpp:324-327).

    Single device: each axis folds periodically (lo halo onto the top
    edge, hi onto the bottom). Sharded: `folds[grid_axis] = fn(lo, hi) ->
    (add_top, add_bot)` hooks (parallel/step._make_folds) ppermute the
    halo shells back to the neighbors that own those cells instead."""
    for axis in (0, 1, 2):
        n = g.shape[axis] - 2 * h
        lo = jnp.take(g, jnp.arange(0, h), axis=axis)
        hi = jnp.take(g, jnp.arange(h + n, 2 * h + n), axis=axis)
        g = jnp.take(g, jnp.arange(h, h + n), axis=axis)
        if folds is not None and axis in folds:
            add_top, add_bot = folds[axis](lo, hi)
        else:
            # lo halo wraps onto the own top edge, hi onto the bottom edge
            add_top, add_bot = lo, hi
        top = jnp.take(g, jnp.arange(n - h, n), axis=axis) + add_top
        bot = jnp.take(g, jnp.arange(0, h), axis=axis) + add_bot
        mid = jnp.take(g, jnp.arange(h, n - h), axis=axis)
        g = jnp.concatenate([bot, mid, top], axis=axis)
    return g


def make_lj_force_half(geom: CellGeometry, params: LJParams,
                       dtype=jnp.float32, nb_local=None, exchanges=None,
                       folds=None, ghost_newton: bool = True):
    """(force_ev, force_noev) closures: (x, typ) -> (f, eng, virial).
    Type-uniform parameters only (like the reference's Newton fast path).

    Sharded (nb_local + exchanges + folds given): the forward halo comes
    from mesh neighbors via the `exchanges` ppermute hooks and the Newton
    fold returns j-side accumulations through the `folds` hooks (the
    reference's MPI halfneigh + ghost_newton path, force_lj.cpp:185-263 +
    comm.cpp:320-361).

    ghost_newton=False is the reference's `-gn 0`: ghost pairs are
    evaluated from both owning sides at half energy/virial weight, forces
    land on own atoms only, and NO reverse fold runs (`folds` is unused —
    pass None); see the module docstring."""
    assert params.uniform, "half-neighbor path requires uniform parameters"
    import numpy as np

    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    C = geom.capacity
    h = halo_extent(geom)
    nb = (nbx, nby, nbz)
    cutsq = float(params.cutforcesq[0])
    eps = float(params.epsilon[0])
    sig6 = float(params.sigma6[0])
    tri = jnp.triu(jnp.ones((C, C), dtype=bool), k=1)

    # lexicographically-positive half of the stencil (z, y, x precedence)
    half = [tuple(int(v) for v in o) for o in geom.stencil
            if (o[2], o[1], o[0]) > (0, 0, 0)]

    def ghost_cells(off):
        """Static (nbz, nby, nbx) bool: interior i cells whose j cell at
        stencil offset `off` lies OUTSIDE the interior — i.e. the j atoms
        are ghosts (periodic images on undecomposed axes, neighbor-device
        atoms on decomposed ones; the distinction doesn't matter here,
        exactly as the reference's j >= nlocal test treats both alike)."""
        ox, oy, oz = off
        gz = (np.arange(nbz) + oz < 0) | (np.arange(nbz) + oz >= nbz)
        gy = (np.arange(nby) + oy < 0) | (np.arange(nby) + oy >= nby)
        gx = (np.arange(nbx) + ox < 0) | (np.arange(nbx) + ox >= nbx)
        return jnp.asarray(gz[:, None, None] | gy[None, :, None]
                           | gx[None, None, :])

    def _force(x, typ, evflag: bool):
        del typ
        Xp = to_padded_soa(x, geom, h, nb_local=nb, exchanges=exchanges)
        Xi = [stencil_slice(g, (0, 0, 0), h, nb) for g in Xp]

        f = [jnp.zeros((nbz, nby, nbx, C), dtype) for _ in range(3)]
        pshape = Xp[0].shape
        fpad = [jnp.zeros(pshape, dtype) for _ in range(3)]
        eng = jnp.zeros((), dtype)
        vir = jnp.zeros((), dtype)

        def pair(Yd, mask_extra=None):
            d = [Xi[c][..., :, None] - Yd[c][..., None, :] for c in range(3)]
            rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            mask = rsq < cutsq
            if mask_extra is not None:
                mask = mask & mask_extra
            m = mask.astype(dtype)
            sr2 = m / (rsq + (1.0 - m))
            sr6 = sr2 * sr2 * sr2 * sig6
            fc = 48.0 * sr6 * (sr6 - 0.5) * sr2 * eps
            return d, rsq, sr6, fc, m

        for off in half:
            Yd = [stencil_slice(g, off, h, nb) for g in Xp]
            d, rsq, sr6, fc, m = pair(Yd)
            fj = []
            for c in range(3):
                f[c] = f[c] + jnp.sum(fc * d[c], axis=-1)
                fj.append(-jnp.sum(fc * d[c], axis=-2))
            ox, oy, oz = off
            zs = slice(h + oz, h + oz + nbz)
            ys = slice(h + oy, h + oy + nby)
            xs_ = slice(h + ox, h + ox + nbx)
            for c in range(3):
                fpad[c] = fpad[c].at[zs, ys, xs_].add(fj[c])
            if evflag:
                e_pair = sr6 * (sr6 - 1.0) * m
                v_pair = rsq * fc
                if ghost_newton:
                    eng = eng + jnp.sum(e_pair)
                    vir = vir + jnp.sum(v_pair)
                else:
                    # gn=0: ghost pairs at scale 0.5 (force_lj.cpp:246-248)
                    # — the other owner contributes the other half
                    scale = jnp.where(ghost_cells(off), 0.5, 1.0)[
                        ..., None, None].astype(dtype)
                    eng = eng + jnp.sum(e_pair * scale)
                    vir = vir + jnp.sum(v_pair * scale)

        if not ghost_newton:
            # gn=0: the pairs gn=1 receives through the reverse fold are
            # instead evaluated HERE, from this owner's side — the
            # lexicographically-negative offsets, restricted to i cells
            # whose j is a ghost (interior j at a negative offset is the
            # same local pair already counted above from the other cell).
            # Force on i only; energy/virial at the 0.5 ghost scale.
            for off in half:
                noff = (-off[0], -off[1], -off[2])
                gmask = ghost_cells(noff)
                Yd = [stencil_slice(g, noff, h, nb) for g in Xp]
                d, rsq, sr6, fc, m = pair(
                    Yd, mask_extra=gmask[..., None, None])
                for c in range(3):
                    f[c] = f[c] + jnp.sum(fc * d[c], axis=-1)
                if evflag:
                    eng = eng + 0.5 * jnp.sum(sr6 * (sr6 - 1.0) * m)
                    vir = vir + 0.5 * jnp.sum(rsq * fc)

        # self cell: i < j triangular, both sides interior
        d, rsq, sr6, fc, m = pair(Xi, mask_extra=tri)
        for c in range(3):
            f[c] = f[c] + jnp.sum(fc * d[c], axis=-1) \
                - jnp.sum(fc * d[c], axis=-2)
        if evflag:
            eng = eng + jnp.sum(sr6 * (sr6 - 1.0) * m)
            vir = vir + jnp.sum(rsq * fc)

        if ghost_newton:
            # Newton reverse-communicate: fold halo contributions back
            for c in range(3):
                f[c] = f[c] + _fold_halo(fpad[c], h, folds=folds)
        else:
            # gn=0: j-side Newton applies among OWN atoms only — take the
            # interior of the j-accumulation grid, drop the halo shells
            # (no reverse communication, integrate.cpp:188-193)
            for c in range(3):
                f[c] = f[c] + fpad[c][h:h + nbz, h:h + nby, h:h + nbx]

        M = nbx * nby * nbz * C
        fout = jnp.stack([fc_.reshape(M) for fc_ in f], axis=0)
        # pre-doubled so downstream full-neighbor accounting holds
        return fout, eng * (8.0 * eps), vir

    def force_ev(x, typ):
        return _force(x, typ, True)

    def force_noev(x, typ):
        return _force(x, typ, False)

    return force_ev, force_noev
