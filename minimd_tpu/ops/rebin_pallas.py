"""Pallas TPU kernel for the local (one-hot pull) rebin.

cells.rebin_local is algorithmically right for TPU (no sort, no scatter)
but pays ~50 GB of HBM traffic at 864k atoms: XLA materializes the
(ncells, C, C) one-hot dot operand 27 times and reads it once per
channel. Here the one-hot lives only in VMEM: per (z, y) cell row the
kernel builds the selection against the lane-packed 27-cell candidate
window (the force kernels' layout) and contracts all channels in place.
Rebin cost at 864k drops from ~54 ms to the few ms the candidate DMA
actually requires.

Candidate ordering is (dz, dy) view-major with [dx=-1 | dx=0 | dx=+1]
lane packing — identical to rebin_local's (offset, slot) lexicographic
order, so the produced layout is bit-identical to rebin_local's (tested).

Like rebin_local, correctness rests on the skin guarantee (an atom moves
at most one cell between rebinnings); movers beyond that are counted in
`overflow` on the XLA side, and per-cell capacity overflow is counted in
the kernel. See cells.rebin_local for the reference mapping
(Neighbor::binatoms, ref/neighbor.cpp:289-343, + Atom::sort).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cells import (CellGeometry, _SENTINEL_BASE, coord_to_cell, pbc_wrap,
                     sentinel_positions)
from .pairgrid import pad_grid_int

_NCH = 7  # x0 x1 x2 v0 v1 v2 typ

# Slab-kernel selection (read at trace time; module-level so perf
# experiments can A/B both kernels in one session — scripts/exp_rebin.py).
# "auto" = slab when eligible (LANE == 128, working set fits VMEM);
# True/False force it (True still requires eligibility).
SLAB = "auto"


def _round_up(n, m):
    return (n + m - 1) // m * m


def make_rebin_pull_pallas(geom: CellGeometry, nb_local=None,
                           interpret: bool = False, pad_exchanges=None,
                           vma=None):
    """One-hot pull placement core as a Pallas kernel (the counterpart of
    cells.rebin_pull, same within-cell ordering — bit-identical, tested).

    Returns pull(cid, chans) -> (outs, counts, cap_overflow): cid is the
    (M,) int32 per-slot cell id in THIS grid's row-major numbering (-1 =
    empty/leaver), chans exactly 7 float32 channels; outs are (ncells, C)
    arrays, counts (ncells,) int32. nb_local + pad_exchanges serve the
    sharded migration (parallel/comm.py): decomposed axes pad with DEAD
    cells instead of periodic self-wrap (cross-device movers travel as
    migration buffers, and self-wrap would alias cells on spans < 3).
    vma: mesh axis names to declare on the pallas outputs (shard_map
    check_vma typing, same mechanism as ops/eam_pallas)."""
    nbx, nby, nbz = nb_local if nb_local is not None else geom.nb
    C = geom.capacity
    M = nbx * nby * nbz * C
    Yp = nby + 2
    LANE = _round_up(3 * C, 128)

    def kernel(*refs):
        cid_refs = refs[0:9]                      # (1,1,nbx,LANE) int32
        val_refs = refs[9:9 + 9 * _NCH]           # coord-major, then view
        out_refs = refs[9 + 9 * _NCH:9 + 10 * _NCH]   # (1,1,nbx,C)
        occ_ref = refs[9 + 10 * _NCH]             # (1,1,nbx,C)
        ovf_ref = refs[9 + 10 * _NCH + 1]         # (1,1,8,128)

        z = pl.program_id(0)
        y = pl.program_id(1)
        row0 = (z * nby + y) * nbx
        target = row0 + jax.lax.broadcasted_iota(jnp.int32, (nbx, 1), 0)

        rank_row = jax.lax.broadcasted_iota(
            jnp.int32, (C, LANE), 0).astype(jnp.float32)
        lane_row = jax.lax.broadcasted_iota(
            jnp.int32, (C, LANE), 1).astype(jnp.float32)
        d_io = jax.lax.broadcasted_iota(
            jnp.int32, (nbx, LANE), 1).astype(jnp.float32)
        base = jnp.zeros((nbx, 1), jnp.float32)
        outs = [jnp.zeros((nbx, LANE), jnp.float32) for _ in range(_NCH)]
        # Mosaic has no cumsum: the per-lane inclusive prefix sum is a dot
        # with an upper-triangular ones matrix (exact in f32 for these
        # small integer counts), which the MXU eats for free
        tri = (jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
               ).astype(jnp.float32)

        for k in range(9):                        # (dz, dy) views in order
            cand = cid_refs[k][0, 0]              # (nbx, LANE)
            sel = cand == target
            self_ = sel.astype(jnp.float32)
            csum = jax.lax.dot_general(
                self_, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (nbx, LANE)
            # per-lane float rank; unselected lanes get -1 so a single
            # equality test builds the one-hot
            rank = jnp.where(sel, base + csum - 1.0, -1.0)
            count = jnp.sum(self_, axis=-1, keepdims=True)
            if LANE <= 128:
                # source-lane index per destination slot: ONE one-hot
                # contraction (instead of one per channel — the channel
                # values then move by per-lane gathers over 128x fewer
                # elements). A batched MXU dot is no alternative: exact
                # only at Precision.HIGHEST and Mosaic lowers small
                # batched matmuls ~10x slower than masked sums (r2
                # negative result).
                onehot = rank[:, None, :] == rank_row[None, :C, :]
                srcl = jnp.sum(
                    jnp.where(onehot, lane_row[None, :C, :], 0.0),
                    axis=-1)                      # (nbx, C)
                # pad the dest axis to LANE: gather needs matching shapes
                srci = jnp.concatenate(
                    [srcl, jnp.zeros((nbx, LANE - C), jnp.float32)],
                    axis=1).astype(jnp.int32)     # (nbx, LANE)
                filled = (d_io >= base) & (d_io < base + count)
                for c in range(_NCH):
                    v = val_refs[c * 9 + k][0, 0]  # (nbx, LANE)
                    g = jnp.take_along_axis(v, srci, axis=1)
                    outs[c] = jnp.where(filled, g, outs[c])
            else:
                # Mosaic dynamic_gather needs the gather dim in one vreg
                # (<= 128 lanes); wide-LANE grids (3C > 128, small decks
                # with big cells) keep the one-hot channel contraction
                onehot_f = (rank[:, None, :] == rank_row[None, :C, :]
                            ).astype(jnp.float32)  # (nbx, C, LANE)
                for c in range(_NCH):
                    v = val_refs[c * 9 + k][0, 0]
                    add = jnp.sum(onehot_f * v[:, None, :], axis=-1)
                    outs[c] = outs[c] + jnp.concatenate(
                        [add, jnp.zeros((nbx, LANE - C), jnp.float32)],
                        axis=1)
            base = base + count

        for c in range(_NCH):
            out_refs[c][0, 0] = outs[c][:, :C]
        occ = (jax.lax.broadcasted_iota(jnp.int32, (nbx, C), 1)
               .astype(jnp.float32) < base)
        occ_ref[0, 0] = occ.astype(jnp.float32)
        over = jnp.sum(jnp.maximum(base - float(C), 0.0))
        cell00 = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0) & (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
        ovf_ref[0, 0] = jnp.where(cell00, over, 0.0)

    def pack_lanes(g, fill):
        """padded (Zp, Yp, Xp_cells, C) -> (Zp, Yp, nbx, LANE)."""
        j = jnp.concatenate([g[:, :, 0:nbx], g[:, :, 1:nbx + 1],
                             g[:, :, 2:nbx + 2]], axis=-1)
        if LANE > 3 * C:
            pad = jnp.full((*j.shape[:-1], LANE - 3 * C), fill, j.dtype)
            j = jnp.concatenate([j, pad], axis=-1)
        return j.reshape(nbz + 2, Yp, nbx, LANE)

    def view_specs(n):
        return [
            pl.BlockSpec((1, 1, nbx, LANE),
                         functools.partial(
                             lambda dz, dy, z, y: (z + dz, y + dy, 0, 0),
                             dz, dy),
                         memory_space=pltpu.VMEM)
            for _c in range(n) for dz in (0, 1, 2) for dy in (0, 1, 2)
        ]

    row_spec = pl.BlockSpec((1, 1, nbx, C), lambda z, y: (z, y, 0, 0),
                            memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 1, 8, 128), lambda z, y: (z, y, 0, 0),
                          memory_space=pltpu.VMEM)

    _vma = {"vma": frozenset(vma)} if vma is not None else {}
    call = pl.pallas_call(
        kernel,
        grid=(nbz, nby),
        in_specs=view_specs(1) + view_specs(_NCH),
        out_specs=(*(row_spec,) * _NCH, row_spec, s_spec),
        out_shape=(
            *(jax.ShapeDtypeStruct((nbz, nby, nbx, C), jnp.float32,
                                   **_vma),)
            * (_NCH + 1),
            jax.ShapeDtypeStruct((nbz, nby, 8, 128), jnp.float32, **_vma),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    nb = (nbx, nby, nbz)

    def pull(cid, chans):
        assert len(chans) == _NCH
        cid_pack = pack_lanes(
            pad_grid_int(cid, geom, 1, nb_local=nb,
                         exchanges=pad_exchanges), -1)
        packs = [pack_lanes(pad_grid_int(c, geom, 1, nb_local=nb,
                                         exchanges=pad_exchanges), 0.0)
                 for c in chans]
        args = ([cid_pack] * 9
                + [p for p in packs for _off in range(9)])

        *outs, occg, ovf = call(*args)
        ncl = nbx * nby * nbz
        occ = occg.reshape(ncl, C)
        counts = jnp.sum(occ, axis=-1).astype(jnp.int32)
        outs = [o.reshape(ncl, C) for o in outs]
        return outs, counts, jnp.sum(ovf).astype(jnp.int32)

    return pull


def make_rebin_pull_slab(geom: CellGeometry, interpret: bool = False,
                         nch: int = _NCH):
    """Single-device z-slab variant of make_rebin_pull_pallas (same pull
    contract, bit-identical output — tested against rebin_local).

    Why it exists: the per-(z, y)-row kernel re-fetches every channel row
    from HBM NINE times (once per (dz, dy) view), which makes the rebin
    DMA-bound (~2.6 ms of the 7.5 ms call at 864k) where the force kernel
    with the same access pattern is compute-bound. Holding a full z-slab
    (all y rows) per program drops the re-fetch factor to THREE (the dz
    views), and the y stencil walks VMEM inside a fori_loop. The halo
    also disappears from HBM: z wraps in the BlockSpec index maps (the
    force kernel's idiom, ops/lj_pallas.py), y wraps as an in-kernel row
    index, and only the thin x wrap columns ride the XLA lane pack —
    pad_grid_int's materialized (Z+2, Y+2, X+2, C) grids (one per
    channel, ~45 MB of traffic each at 864k) are gone. Measured: rebin
    call 10.8 -> ~5 ms at 864k (same-session A/B, 2026-08-20).

    Restrictions (caller falls back to the row kernel otherwise):
    single-device only (periodic wrap everywhere), LANE == 128 (the
    srcl+gather branch), min(nb) >= 3, and the slab working set must fit
    VMEM."""
    nbx, nby, nbz = geom.nb
    C = geom.capacity
    LANE = _round_up(3 * C, 128)
    assert LANE == 128 and min(geom.nb) >= 3

    def kernel(*refs):
        cid_refs = refs[0:3]                     # (1, nby, nbx, LANE) int32
        val_refs = refs[3:3 + 3 * nch]          # channel-major, then dz
        out_refs = refs[3 + 3 * nch:3 + 4 * nch]   # (1, nby, nbx, C)
        occ_ref = refs[3 + 4 * nch]             # (1, nby, nbx, C)
        ovf_ref = refs[3 + 4 * nch + 1]         # (1, 8, 128)

        z = pl.program_id(0)
        rank_row = jax.lax.broadcasted_iota(
            jnp.int32, (C, LANE), 0).astype(jnp.float32)
        lane_row = jax.lax.broadcasted_iota(
            jnp.int32, (C, LANE), 1).astype(jnp.float32)
        d_io = jax.lax.broadcasted_iota(
            jnp.int32, (nbx, LANE), 1).astype(jnp.float32)
        xiot = jax.lax.broadcasted_iota(jnp.int32, (nbx, 1), 0)
        tri = (jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
               ).astype(jnp.float32)

        def body(y, ovf_acc):
            target = (z * nby + y) * nbx + xiot
            base = jnp.zeros((nbx, 1), jnp.float32)
            outs = [jnp.zeros((nbx, LANE), jnp.float32)
                    for _ in range(nch)]
            for dz in range(3):                  # (dz, dy) views in order
                for dy in range(3):
                    r = jax.lax.rem(y + dy - 1 + nby, nby)
                    cand = cid_refs[dz][0, r]    # (nbx, LANE)
                    sel = cand == target
                    self_ = sel.astype(jnp.float32)
                    csum = jax.lax.dot_general(
                        self_, tri, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    rank = jnp.where(sel, base + csum - 1.0, -1.0)
                    count = jnp.sum(self_, axis=-1, keepdims=True)
                    onehot = rank[:, None, :] == rank_row[None, :C, :]
                    srcl = jnp.sum(
                        jnp.where(onehot, lane_row[None, :C, :], 0.0),
                        axis=-1)                 # (nbx, C)
                    srci = jnp.concatenate(
                        [srcl, jnp.zeros((nbx, LANE - C), jnp.float32)],
                        axis=1).astype(jnp.int32)
                    filled = (d_io >= base) & (d_io < base + count)
                    for c in range(nch):
                        v = val_refs[c * 3 + dz][0, r]   # (nbx, LANE)
                        g = jnp.take_along_axis(v, srci, axis=1)
                        outs[c] = jnp.where(filled, g, outs[c])
                    base = base + count
            for c in range(nch):
                out_refs[c][0, y] = outs[c][:, :C]
            occ = (jax.lax.broadcasted_iota(jnp.int32, (nbx, C), 1)
                   .astype(jnp.float32) < base)
            occ_ref[0, y] = occ.astype(jnp.float32)
            return ovf_acc + jnp.sum(jnp.maximum(base - float(C), 0.0))

        over = jax.lax.fori_loop(0, nby, body, jnp.zeros((), jnp.float32))
        cell00 = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0) & (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
        ovf_ref[0] = jnp.where(cell00, over, 0.0)

    def pack_x(t, fill):
        """(M,) flat channel -> lane-packed (nbz, nby, nbx, LANE) with
        periodic x wrap columns (values verbatim — cell ids are global and
        coordinates are stored unfolded, so no boundary shift applies;
        same convention as pad_grid_int's shift-free copies)."""
        g = t.reshape(nbz, nby, nbx, C)
        gp = jnp.concatenate([g[:, :, nbx - 1:], g, g[:, :, :1]], axis=2)
        parts = [gp[:, :, 0:nbx], gp[:, :, 1:nbx + 1], gp[:, :, 2:nbx + 2]]
        if LANE > 3 * C:
            parts.append(jnp.full((nbz, nby, nbx, LANE - 3 * C), fill,
                                  g.dtype))
        return jnp.concatenate(parts, axis=-1)

    def zspec(dz):
        return pl.BlockSpec(
            (1, nby, nbx, LANE),
            functools.partial(lambda dz, z: ((z + dz - 1) % nbz, 0, 0, 0),
                              dz),
            memory_space=pltpu.VMEM)

    in_specs = ([zspec(dz) for dz in range(3)]
                + [zspec(dz) for _c in range(nch) for dz in range(3)])
    out_spec = pl.BlockSpec((1, nby, nbx, C), lambda z: (z, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, 8, 128), lambda z: (z, 0, 0),
                          memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nbz,),
        in_specs=in_specs,
        out_specs=(*(out_spec,) * (nch + 1), s_spec),
        out_shape=(
            *(jax.ShapeDtypeStruct((nbz, nby, nbx, C), jnp.float32),)
            * (nch + 1),
            jax.ShapeDtypeStruct((nbz, 8, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def pull(cid, chans):
        assert len(chans) == nch
        cid_pack = pack_x(cid, jnp.int32(-1))
        packs = [pack_x(c, 0.0) for c in chans]
        args = [cid_pack] * 3 + [p for p in packs for _dz in range(3)]
        *outs, occg, ovf = call(*args)
        ncl = nbx * nby * nbz
        occ = occg.reshape(ncl, C)
        counts = jnp.sum(occ, axis=-1).astype(jnp.int32)
        outs = [o.reshape(ncl, C) for o in outs]
        return outs, counts, jnp.sum(ovf).astype(jnp.int32)

    return pull


def slab_vmem_bytes(geom: CellGeometry) -> int:
    """Double-buffered VMEM working set of the slab rebin kernel."""
    nbx, nby, _ = geom.nb
    C = geom.capacity
    LANE = _round_up(3 * C, 128)
    ins = 3 * (1 + _NCH) * nby * nbx * LANE * 4
    outs = (_NCH + 1) * nby * nbx * C * 4
    return 2 * (ins + outs)


def make_rebin_pallas(geom: CellGeometry, dtype=jnp.float32,
                      interpret: bool = False, uniform_typ: int | None = None):
    """Returns fn(x, v, typ) -> (x, v, typ, overflow), drop-in for
    cells.rebin_local (f32, TPU).

    uniform_typ: when the caller KNOWS every atom has this one type
    (concrete check at Simulation construction — rebin can never
    introduce new types), the typ channel is dropped from the pull and
    reconstructed from occupancy (new_t = uniform_typ where occupied,
    0 on empty slots — exactly what the pull would have produced), saving
    one channel of pack + slab DMA + per-view gathers."""
    assert dtype == jnp.float32, "pallas rebin kernel is f32"
    nbx, nby, nbz = geom.nb
    assert min(geom.nb) >= 3, "local rebin needs distinct wrap neighbors"
    C = geom.capacity
    M = geom.nslots
    LANE = _round_up(3 * C, 128)
    eligible = LANE == 128 and slab_vmem_bytes(geom) < 80 * 1024 * 1024
    slab = eligible and (SLAB if SLAB != "auto" else True)
    nch = 6 if (slab and uniform_typ is not None) else _NCH
    if slab:
        pull = make_rebin_pull_slab(geom, interpret=interpret, nch=nch)
    else:
        pull = make_rebin_pull_pallas(geom, interpret=interpret)

    def rebin(x, v, typ):
        # x/v may be the (3, M) state arrays OR 3-tuples of flat (M,)
        # coordinate arrays (sim.py's triple carry — dense tiling instead
        # of the (3, M) form's 3->8 sublane padding). The wrap/cell-id
        # arithmetic below runs per coordinate either way (elementwise
        # identical to cells.pbc_wrap/coord_to_cell, so both forms are
        # bit-identical — tested); the output mirrors the input form.
        triple = isinstance(x, (tuple, list))
        valid = x[0] < 0.5 * _SENTINEL_BASE
        if triple:
            nb3 = geom.nb
            cid = None
            xs_t = []
            for d in range(3):
                prd_d = float(geom.prd[d])
                off_d = float(geom.offset[d])
                inv_d = jnp.asarray(1.0 / float(geom.binsize[d]), x[d].dtype)
                xw = jnp.where(x[d] < 0.0, x[d] + prd_d, x[d])
                xw = jnp.where(xw >= prd_d, xw - prd_d, xw)
                g = xw - off_d
                xs_t.append(jnp.where(g < 0, xw + prd_d, xw))
                g = jnp.where(g < 0, g + prd_d, g)
                idx = jnp.clip((g * inv_d).astype(jnp.int32), 0, nb3[d] - 1)
                cid = idx if d == 0 else cid + idx * (
                    nb3[0] if d == 1 else nb3[0] * nb3[1])
            xs = xs_t
        else:
            xw = pbc_wrap(x, geom.prd)
            cid, xs = coord_to_cell(xw, geom)
        cid = jnp.where(valid, cid, jnp.int32(-1))

        # movement guard (same as rebin_local): new cell within +-1 of the
        # slot's cell, else the pull below misses it — count loudly
        old = jnp.arange(M, dtype=jnp.int32) // C
        def cxyz(c):
            return c % nbx, (c // nbx) % nby, c // (nbx * nby)
        ox_, oy_, oz_ = cxyz(old)
        nx_, ny_, nz_ = cxyz(jnp.maximum(cid, 0))
        def near(a, b, n):
            d = jnp.abs(a - b)
            return jnp.minimum(d, n - d) <= 1
        ok = near(ox_, nx_, nbx) & near(oy_, ny_, nby) & near(oz_, nz_, nbz)
        overflow = jnp.sum(valid & ~ok).astype(jnp.int32)

        chans = [xs[0], xs[1], xs[2], v[0], v[1], v[2]]
        if nch == _NCH:
            chans.append(typ.astype(jnp.float32))
        outs, counts, cap_ovf = pull(cid, chans)

        occ = (jnp.arange(C, dtype=jnp.int32)[None, :]
               < counts[:, None]).reshape(M)
        sent = sentinel_positions(M, dtype)
        if nch == _NCH:
            new_t = jnp.where(occ, outs[6].reshape(M).astype(jnp.int32), 0)
        else:
            new_t = jnp.where(occ, jnp.int32(uniform_typ), 0)
        overflow = overflow + cap_ovf
        if triple:
            # sent[1] == sent[2] == 0 (sentinel_positions), so the scalar
            # 0.0 fill is bit-identical to the stacked form's sent rows
            new_x = (jnp.where(occ, outs[0].reshape(M), sent[0]),
                     jnp.where(occ, outs[1].reshape(M), 0.0),
                     jnp.where(occ, outs[2].reshape(M), 0.0))
            new_v = tuple(jnp.where(occ, outs[3 + d].reshape(M), 0.0)
                          for d in range(3))
            return new_x, new_v, new_t, overflow
        new_x = jnp.stack([jnp.where(occ, outs[d].reshape(M), sent[d])
                           for d in range(3)], axis=0)
        new_v = jnp.stack([jnp.where(occ, outs[3 + d].reshape(M), 0.0)
                           for d in range(3)], axis=0)
        return new_x, new_v, new_t, overflow

    rebin.accepts_triple = True
    return rebin
