"""Lennard-Jones force on the halo-padded cell grid (the fast path).

Per stencil offset, the candidate block for every interior cell is one
static slice of the padded grid; the pair interaction is a dense
(cells, C_i, C_j) VPU computation in SoA layout. Zero gathers, zero
scatters, zero dynamic shapes. Kernel math identical to
ref/force_lj.cpp:420-430 (see ops/lj.py docstring for the formulas).

Energy/virial accounting is the reference's full-neighbor convention:
raw ordered-pair sums, eng*=4, virial*=0.5 (force_lj.cpp:441-442).

The same pair loop serves single-device runs (periodic self-wrap halo) and
sharded runs (ppermute halo via `to_padded_soa`'s exchange hooks).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..cells import CellGeometry
from .lj import LJParams
from .pairgrid import halo_extent, pad_grid_int, stencil_slice, to_padded_soa


def lj_pair_loop(Xp, Tp, nb_local, geom: CellGeometry, params: LJParams,
                 dtype, evflag: bool):
    """Dense stencil pair loop over padded coordinate grids.

    Xp: list of 3 padded (Z+2h, Y+2h, X+2h, C) coordinate grids.
    Tp: padded type grid (or None when parameters are type-uniform).
    Returns ([f0, f1, f2] interior force grids, eng, virial) with the raw
    full-neighbor sums already scaled (eng*4, virial*0.5).
    """
    nbx, nby, nbz = nb_local
    C = geom.capacity
    h = halo_extent(geom)
    offsets = [tuple(int(v) for v in o) for o in geom.stencil]

    uniform = params.uniform
    nt = params.ntypes
    eps_t = jnp.asarray(params.epsilon, dtype=dtype)
    sig6_t = jnp.asarray(params.sigma6, dtype=dtype)
    cutsq_t = jnp.asarray(params.cutforcesq, dtype=dtype)
    diag = jnp.eye(C, dtype=bool)

    Xi = [stencil_slice(g, (0, 0, 0), h, nb_local) for g in Xp]
    if not uniform:
        Ti = stencil_slice(Tp, (0, 0, 0), h, nb_local)

    f = [jnp.zeros((nbz, nby, nbx, C), dtype) for _ in range(3)]
    eng = jnp.zeros((), dtype)
    vir = jnp.zeros((), dtype)

    for off in offsets:
        Yd = [stencil_slice(g, off, h, nb_local) for g in Xp]
        d0 = Xi[0][..., :, None] - Yd[0][..., None, :]
        d1 = Xi[1][..., :, None] - Yd[1][..., None, :]
        d2 = Xi[2][..., :, None] - Yd[2][..., None, :]
        rsq = d0 * d0 + d1 * d1 + d2 * d2

        if uniform:
            cutsq, eps, sig6 = cutsq_t[0], eps_t[0], sig6_t[0]
        else:
            Tj = stencil_slice(Tp, off, h, nb_local)
            pair = Ti[..., :, None] * nt + Tj[..., None, :]
            cutsq = jnp.take(cutsq_t, pair)
            eps = jnp.take(eps_t, pair)
            sig6 = jnp.take(sig6_t, pair)

        mask = rsq < cutsq
        if off == (0, 0, 0):
            mask = mask & ~diag
        # mask arithmetic: sr2 == 0 for masked pairs, downstream terms vanish
        m = mask.astype(rsq.dtype)
        sr2 = m / (rsq + (1.0 - m))
        sr6 = sr2 * sr2 * sr2 * sig6
        fc = 48.0 * sr6 * (sr6 - 0.5) * sr2 * eps
        f[0] = f[0] + jnp.sum(fc * d0, axis=-1)
        f[1] = f[1] + jnp.sum(fc * d1, axis=-1)
        f[2] = f[2] + jnp.sum(fc * d2, axis=-1)
        if evflag:
            eng = eng + jnp.sum(sr6 * (sr6 - 1.0) * eps * m)
            vir = vir + jnp.sum(rsq * fc)

    return f, eng * 4.0, vir * 0.5


def make_lj_force_grid(geom: CellGeometry, params: LJParams, dtype=jnp.float32):
    """Single-device closures (force_ev, force_noev):
    (x, typ) -> (f, eng, virial), periodic halo self-fill."""
    M = geom.nslots
    h = halo_extent(geom)

    def _force(x, typ, evflag: bool):
        Xp = to_padded_soa(x, geom, h)
        Tp = pad_grid_int(typ, geom, h) if not params.uniform else None
        f, eng, vir = lj_pair_loop(Xp, Tp, geom.nb, geom, params, dtype, evflag)
        fout = jnp.stack([fd.reshape(M) for fd in f], axis=0)
        return fout, eng, vir

    def force_ev(x, typ):
        return _force(x, typ, True)

    def force_noev(x, typ):
        return _force(x, typ, False)

    return force_ev, force_noev
