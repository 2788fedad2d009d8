"""EAM force on the halo-padded cell grid — the TPU fast path.

Same dense-stencil structure as the LJ grid kernel (ops/lj_grid.py), with
the reference's two-pass EAM algorithm (ref/force_eam.cpp:274-449):

  pass 1: rho_i = sum_j rhor(r_ij); fp_i = F'(rho_i); embed energy F(rho_i)
  [fp halo exchange hook between the passes — force_eam.cpp:851-887]
  pass 2: fpair = -((fp_i + fp_j) * G1(r) + G2(r)),  G1 = rhor'/r,
          G2 = z2r'/r^2 - z2r/r^3  (the spline force terms with the 1/r
          factors absorbed, so the kernel needs no reciprocal)

Table strategy (eam_file.build_pair_polys): gather-free polynomial body +
the spline's own last rows as an exact tail — evaluation error is at f32
rounding scale against the reference spline lookup (force_eam.cpp:152-158),
so f32 runs behave like the reference's own single-precision build. The
per-ATOM embedding function F(rho) stays a bit-exact spline-row gather
(cheap: M atoms, not M*neighbors pairs).

For exact-table f64 validation (CPU) use ops/eam.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..cells import CellGeometry, _SENTINEL_BASE
from ..eam_file import PairPolys, build_pair_polys, resolve_degree
from .eam import EAMTables
from .pairgrid import halo_extent, pad_grid_int, stencil_slice, to_padded_soa


def horner(x, coeffs):
    """Descending-power polynomial evaluation; coeffs are python floats
    (lane-uniform), loop unrolls at trace time."""
    acc = jnp.zeros_like(x) + coeffs[0]
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def eval_pair_fns(r, polys: PairPolys, names):
    """Evaluate pair functions at r (any-shaped array; out-of-range lanes —
    masked sentinels, r < lo — are clamped to the nearest valid value, never
    NaN/Inf). Returns {name: values}."""
    u = jnp.clip(r * polys.u_a + polys.u_b, -1.0, 1.0)
    # tail local coordinate: t in [0, nrows); row k covers t in [k, k+1).
    # Only the upper clamp is load-bearing (sentinel r would overflow the
    # row polynomials); r < split gives garbage-but-finite t values that
    # the in_tail select discards.
    t = jnp.minimum(r, polys.cut) * polys.rdr + (1.0 - polys.m0)
    in_tail = r >= polys.split
    sels = None
    out = {}
    for name in names:
        val = horner(u, polys.body[name])
        merged = polys.tail_merged.get(name)
        if merged is not None:
            # flattened tail: one Horner over the whole [split, cut] span
            # (fit verified at least as tight as the rows — eam_file)
            tv = horner(t, merged)
        else:
            if sels is None:  # row selects, shared by the unmerged names
                sels = [t < float(k + 1) for k in range(polys.nrows - 1)]
            tv = horner(t - float(polys.nrows - 1), polys.tail[name][-1])
            for k in range(polys.nrows - 2, -1, -1):
                tv = jnp.where(sels[k],
                               horner(t - float(k), polys.tail[name][k]), tv)
        out[name] = jnp.where(in_tail, tv, val)
    return out


def make_eam_force_grid(geom: CellGeometry, tables: EAMTables,
                        ntypes: int = 1, dtype=jnp.float32,
                        fp_exchange=None, degree=None,
                        nb_local=None, exchanges=None):
    """(force_ev, force_noev) closures: (x, typ) -> (f, eng_vdwl, virial).

    nb_local/exchanges: device-local grid shape and per-axis halo exchange
    hooks for sharded execution (see pairgrid.to_padded_soa). The fp halo
    between the passes rides the same hooks — the reference's mid-force
    communicate (force_eam.cpp:851-887).

    degree=None resolves to the trajectory-validated hardware pair-table
    degrees on TPU f32 and the adaptive (force-space-exact) fit on CPU;
    "adaptive"/int/dict override (eam_file.resolve_degree)."""
    degree = resolve_degree(degree, dtype)
    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    nb_loc = (nbx, nby, nbz)
    C = geom.capacity
    M_loc = nbx * nby * nbz * C
    h = halo_extent(geom)
    offsets = [tuple(int(v) for v in o) for o in geom.stencil]
    diag = jnp.eye(C, dtype=bool)

    polys = build_pair_polys(tables, degree=degree)
    cutsq = tables.cut * tables.cut

    frho_sp = jnp.asarray(tables.frho_spline, dtype=dtype)
    rdrho = 1.0 / tables.drho
    nrho = tables.nrho

    def pair_r(Xi, Xp, off):
        Yd = [stencil_slice(g, off, h, nb_loc) for g in Xp]
        d0 = Xi[0][..., :, None] - Yd[0][..., None, :]
        d1 = Xi[1][..., :, None] - Yd[1][..., None, :]
        d2 = Xi[2][..., :, None] - Yd[2][..., None, :]
        rsq = d0 * d0 + d1 * d1 + d2 * d2
        mask = rsq < cutsq
        if off == (0, 0, 0):
            mask = mask & ~diag
        # no masking blend: sentinels are >=1e3 apart (cells.py) so masked
        # rsq is large-but-finite and the eval clamps keep polys bounded
        r = jnp.sqrt(rsq)
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
            val = eval_pair_fns(r, polys, ("R",))["R"]
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
        names = ("G1", "G2", "P") if evflag else ("G1", "G2")
        for off in offsets:
            (d0, d1, d2), rsq, r, mask = pair_r(Xi, Xp, off)
            g = eval_pair_fns(r, polys, names)
            fp_j = stencil_slice(fp_pad, off, h, nb_loc)
            psip = (fp_i[..., :, None] + fp_j[..., None, :]) * g["G1"] + g["G2"]
            fpair = jnp.where(mask, -psip, 0.0)
            f[0] = f[0] + jnp.sum(fpair * d0, axis=-1)
            f[1] = f[1] + jnp.sum(fpair * d1, axis=-1)
            f[2] = f[2] + jnp.sum(fpair * d2, axis=-1)
            if evflag:
                eng = eng + jnp.sum(jnp.where(mask, g["P"], 0.0))
                vir = vir + 0.5 * jnp.sum(rsq * fpair)

        fout = jnp.stack([fd.reshape(M_loc) for fd in f], axis=0)
        eng_vdwl = 2.0 * (embed_eng + 0.5 * eng)     # force_eam.cpp:446
        return fout, eng_vdwl, vir

    def force_ev(x, typ):
        return _force(x, typ, True)

    def force_noev(x, typ):
        return _force(x, typ, False)

    return force_ev, force_noev
