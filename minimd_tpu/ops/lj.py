"""Lennard-Jones 12-6 force: dense cell-pair kernel.

TPU-native redesign of ref/force_lj.cpp:366-449 (compute_fullneigh). Instead
of gathering per-atom neighbor lists (random gathers are the enemy on TPU),
each cell computes against the dense, padded candidate block of its stencil
cells: a (C, S*C) pair matrix of fused VPU FMAs, gathered cell-block-wise.
Under the skin guarantee this evaluates the exact same pair set as the
reference's cached Verlet list (see cells.py docstring).

Kernel math matches the reference exactly (force_lj.cpp:420-430):
    sr2 = 1/r^2; sr6 = sr2^3 * sigma6; F = 48*sr6*(sr6-0.5)*sr2*eps
    eng += sr6*(sr6-1)*eps   (x4.0 at the end)
    virial += r^2*F          (x0.5 at the end)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cells import CellGeometry


@dataclasses.dataclass(frozen=True)
class LJParams:
    """Per-type-pair tables, flattened (ntypes*ntypes,) like the reference."""

    ntypes: int
    epsilon: np.ndarray    # (nt*nt,)
    sigma6: np.ndarray     # (nt*nt,)
    cutforcesq: np.ndarray  # (nt*nt,)

    @property
    def uniform(self) -> bool:
        return (
            np.all(self.epsilon == self.epsilon[0])
            and np.all(self.sigma6 == self.sigma6[0])
            and np.all(self.cutforcesq == self.cutforcesq[0])
        )

    @staticmethod
    def from_deck(ntypes: int, epsilon: float, sigma: float, cutforce: float) -> "LJParams":
        n = ntypes * ntypes
        return LJParams(
            ntypes=ntypes,
            epsilon=np.full(n, epsilon),
            sigma6=np.full(n, sigma ** 6),
            cutforcesq=np.full(n, cutforce * cutforce),
        )


def _pick_chunk(ncells: int, C: int, S: int, target_elems: int = 8 << 20) -> int:
    """Cells per lax.map step: largest divisor of ncells keeping the chunk's
    pair matrix (CB * C * S*C) under target_elems (bounds peak memory while
    keeping each fused chunk big enough to fill the VPU)."""
    limit = max(1, target_elems // max(1, C * S * C))
    best = 1
    for d in range(1, ncells + 1):
        if ncells % d == 0 and d <= limit:
            best = d
    return best


def make_lj_force(geom: CellGeometry, params: LJParams, dtype=jnp.float32,
                  cell_chunk: int | None = None):
    """Build a jittable f(x, typ) -> (f, eng_vdwl, virial) closure.

    eng_vdwl/virial follow the reference's full-neighbor accounting
    (force_lj.cpp:441-442): raw ordered-pair sums, then eng*=4, virial*=0.5.
    """
    ncells, C, S = geom.ncells, geom.capacity, geom.nstencil
    M = geom.nslots
    CB = cell_chunk or _pick_chunk(ncells, C, S)
    nchunk = ncells // CB

    cand_cell = jnp.asarray(geom.cand_cell)                     # (ncells,S)
    prd = np.asarray(geom.prd, dtype=np.float64)
    shift = jnp.asarray(geom.cand_shift.astype(np.float64) * prd, dtype=dtype)

    uniform = params.uniform
    eps_t = jnp.asarray(params.epsilon, dtype=dtype)
    sig6_t = jnp.asarray(params.sigma6, dtype=dtype)
    cutsq_t = jnp.asarray(params.cutforcesq, dtype=dtype)
    nt = params.ntypes

    cand_c = cand_cell.reshape(nchunk, CB, S)
    shift_c = shift.reshape(nchunk, CB, S, 3)
    cell_idx_c = jnp.arange(ncells, dtype=jnp.int32).reshape(nchunk, CB)
    lane = jnp.arange(C, dtype=jnp.int32)

    def chunk_body(xc, tc, args):
        cand, shf, cidx = args
        # gather candidate blocks: (CB, S, C, ...) -> flatten stencil x slot
        xj = (xc[cand] + shf[:, :, None, :]).reshape(CB, S * C, 3)
        xi = xc[cidx]                                            # (CB, C, 3)

        # self-pair exclusion (same slot, zero image shift)
        jslot = (cand[:, :, None] * C + lane).reshape(CB, 1, S * C)
        islot = (cidx[:, None] * C + lane)[:, :, None]           # (CB, C, 1)
        img0 = jnp.all(shf == 0.0, axis=-1)                      # (CB, S)
        img0 = jnp.broadcast_to(img0[:, :, None], (CB, S, C)).reshape(CB, 1, S * C)
        is_self = (islot == jslot) & img0

        delta = xi[:, :, None, :] - xj[:, None, :, :]            # (CB,C,SC,3)
        rsq = jnp.sum(delta * delta, axis=-1)                    # (CB,C,SC)

        if uniform:
            cutsq = cutsq_t[0]
            eps = eps_t[0]
            sig6 = sig6_t[0]
        else:
            tj = tc[cand].reshape(CB, 1, S * C)
            ti = tc[cidx][:, :, None]
            pair = ti * nt + tj
            cutsq = jnp.take(cutsq_t, pair)
            eps = jnp.take(eps_t, pair)
            sig6 = jnp.take(sig6_t, pair)

        mask = (rsq < cutsq) & ~is_self
        sr2 = jnp.where(mask, 1.0, 0.0) / jnp.where(mask, rsq, 1.0)
        sr6 = sr2 * sr2 * sr2 * sig6
        fcoef = 48.0 * sr6 * (sr6 - 0.5) * sr2 * eps             # 0 when masked

        fi = jnp.einsum("bcs,bcsd->bcd", fcoef, delta)           # (CB,C,3)
        eng = jnp.sum(sr6 * (sr6 - 1.0) * eps * mask)
        vir = jnp.sum(rsq * fcoef)
        return fi, eng, vir

    def force(x, typ):
        # gather backend keeps its (slots, 3) internal layout
        xc = x.T.reshape(ncells, C, 3)
        tc = typ.reshape(ncells, C) if not uniform else None
        fis, engs, virs = jax.lax.map(
            partial(chunk_body, xc, tc), (cand_c, shift_c, cell_idx_c)
        )
        f = fis.reshape(M, 3).T
        return f, jnp.sum(engs) * 4.0, jnp.sum(virs) * 0.5

    return force
