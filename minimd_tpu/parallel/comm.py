"""Multi-chip atom migration and sharded rebinning.

The reference's `Comm::exchange` (comm.cpp:364-597) walks dimensions in
order, ships leavers to the +/-1 neighbor, and lets later dimensions carry
corner movers onward. Here each hop is a ppermute of a fixed-capacity
leaver buffer; arrivals are appended to a static-shape atom pool, and one
local rebin at the end places the pool into the device's cell block. No
dynamic shapes; over-capacity events are counted per class ([movement,
capacity, buffer]) — the runner grows cell capacity / buffer capacity and
replays (the reference's growsend/growrecv, comm.cpp:887-909), and raises
with the --safe_exchange remedy for genuine movement overflow.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..cells import CellGeometry, sentinel_positions

_AXES = ("z", "y", "x")  # grid-axis order; migration walks x, y, z like the
# reference (comm.cpp:380: idim 0..2 = x, y, z)


def _device_span(geom: CellGeometry, mesh: Mesh):
    nbx, nby, nbz = geom.nb
    return {
        "x": nbx // mesh.shape["x"],
        "y": nby // mesh.shape["y"],
        "z": nbz // mesh.shape["z"],
    }


def make_exchange_rebin(geom: CellGeometry, mesh: Mesh, dtype,
                        buf_cap: int | None = None, hops: int = 1):
    """Returns a function (x, v, typ, valid) -> (x, v, typ, valid, overflow)
    operating on device-local flat arrays inside shard_map. overflow is an
    int32 (3,) vector [movement, capacity, buffer]: movement counts atoms
    farther than `hops` devices from home (the reference would silently
    lose these, comm.cpp:364-597; --safe_exchange raises hops), capacity
    counts per-cell slot overflow (fixable by growing the cell capacity —
    neighbor.cpp:241-261), buffer counts leavers that did not fit the
    migration buffers (fixable by growing buf_cap — the reference's
    growsend/growrecv, comm.cpp:887-909; the runner grows and replays).

    x rows are positions (may be slightly outside the box), valid marks
    occupied slots. The result is the device's local cell-major block.

    hops: per-axis migration passes. The skin guarantee bounds drift to
    less than one cell per reneigh interval, so hops=1 covers every normal
    run; hops=k forwards atoms up to k devices per axis, the reference's
    `exchange_all` multi-hop ring for arbitrarily displaced atoms
    (comm.cpp:599-689, --safe_exchange). Atoms still unplaced after all
    passes are counted in the returned overflow (the run fails loudly).
    """
    nbx, nby, nbz = geom.nb
    C = geom.capacity
    prd = np.asarray(geom.prd, dtype=np.float64)
    offset = np.asarray(geom.offset, dtype=np.float64)
    binsize = np.asarray(geom.binsize, dtype=np.float64)
    span = _device_span(geom, mesh)
    lx, ly, lz = span["x"], span["y"], span["z"]
    M_local = lx * ly * lz * C

    # leaver-buffer capacity: a full boundary cell layer is a hard upper
    # bound on who can leave through one face in one reneigh interval
    # under the skin guarantee (hops == 1). Multi-hop forwarding
    # (--safe_exchange) has no such bound — funnel traffic from several
    # devices can transit one hop — so buf_cap overrides the default in
    # EITHER direction and the runner grows it on buffer overflow (the
    # reference's growsend/growrecv, comm.cpp:887-909).
    caps = {
        "x": ly * lz * C,
        "y": lx * lz * C,
        "z": lx * ly * C,
    }
    if buf_cap is not None:
        # clamp to the device-local pool: a buffer larger than the pool can
        # never fill (there aren't that many atoms to leave), and pack()'s
        # length-B arange mask must agree with the [:, :B] slice widths —
        # an unclamped user cap produced an obscure shape-mismatch trace
        # error instead of working (the runner's grow path already clamps)
        caps = {k: min(int(buf_cap), M_local) for k in caps}

    nb_all = {"x": nbx, "y": nby, "z": nbz}
    dim_of = {"x": 0, "y": 1, "z": 2}
    ncl = lx * ly * lz

    # Final-placement strategy. The axis passes never compact the pool:
    # its first M_local entries stay slot-structured (leavers are only
    # masked off) and arrivals ride appended buffers. So the default
    # placement is the production one-hot PULL (cells.rebin_pull /
    # ops.rebin_pallas — no sort, no big scatter: the sort-based placement
    # measured ~40 ms per reneigh at 131k on TPU, dominating the sharded
    # step) plus an exact small-scatter insertion of the arrivals.
    # The pull covers ±1-cell movement (the skin guarantee); residents who
    # moved farther are counted as MOVEMENT overflow — stricter than the
    # sort, which placed them silently (the reference's default exchange
    # would silently LOSE them, comm.cpp:364-597). --safe_exchange
    # (hops > 1) keeps the sort-based placement, which handles arbitrary
    # displacement (the exchange_all contract, comm.cpp:599-689).
    # Undecomposed axes with span < 3 cannot self-wrap distinctly either
    # -> sort fallback.
    spans_ok = all(mesh.shape[n] > 1 or span[n] >= 3 for n in _AXES)
    use_pull = hops == 1 and spans_ok
    # keyed on the MESH devices, not jax.default_backend(): a CPU
    # virtual mesh built while a TPU backend is default (e.g. the
    # driver dryrun alongside a live axon plugin) must still get
    # interpret-mode kernels
    on_cpu = mesh.devices.flat[0].platform == "cpu"
    pallas_pull = use_pull and not on_cpu and dtype == jnp.float32

    # decomposed axes pad the pull window with DEAD cells: cross-device
    # movers travel as migration buffers, never through the pull, and
    # periodic self-wrap would alias cells on small spans. Keys are grid
    # ARRAY axes (0=z, 1=y, 2=x), the pad_grid_int convention.
    def _make_dead_pad(axis):
        def dead(g, coord_dim):
            shp = list(g.shape)
            shp[axis] = 1
            fill = -1 if jnp.issubdtype(g.dtype, jnp.integer) else 0.0
            z = jnp.full(tuple(shp), fill, g.dtype)
            return z, z
        return dead

    _ax_of = {"z": 0, "y": 1, "x": 2}
    pad_ex = {_ax_of[n]: _make_dead_pad(_ax_of[n])
              for n in _AXES if mesh.shape[n] > 1} or None

    if pallas_pull:
        from ..ops.rebin_pallas import make_rebin_pull_pallas
        pull = make_rebin_pull_pallas(geom, nb_local=(lx, ly, lz),
                                      pad_exchanges=pad_ex,
                                      vma=("z", "y", "x"))
    elif use_pull:
        from ..cells import rebin_pull as _rebin_pull

        def pull(cid, chans):
            return _rebin_pull(cid, chans, geom, nb_local=(lx, ly, lz),
                               pad_exchanges=pad_ex)

    def global_cell_index(xw, d):
        """Global cell coordinate along dimension d for wrapped (3, M)
        positions, honoring the grid offset + unfolding convention
        (cells.py)."""
        g = xw[d] - offset[d]
        g = jnp.where(g < 0, g + prd[d], g)
        return jnp.clip((g * (1.0 / binsize[d])).astype(jnp.int32),
                        0, nb_all[_AXES[2 - d]] - 1)

    def exchange_rebin(x, v, typ, valid):
        # wrap into [0, prd)
        p = jnp.asarray(prd, dtype=x.dtype)[:, None]
        xw = jnp.where(x < 0, x + p, x)
        xw = jnp.where(xw >= p, xw - p, xw)

        pool_x, pool_v, pool_t, pool_ok = xw, v, typ, valid
        ovf_move = jnp.zeros((), jnp.int32)
        ovf_cap = jnp.zeros((), jnp.int32)
        ovf_buf = jnp.zeros((), jnp.int32)

        for name in ("x", "y", "z"):
            n = mesh.shape[name]
            if n == 1:
                continue
            d = dim_of[name]
            L = span[name]
            B = caps[name]
            idx_dev = jax.lax.axis_index(name)
            # each pass ships leavers one device toward their destination;
            # with hops > 1 multi-device movers are forwarded ring-style
            # like the reference's exchange_all (comm.cpp:599-689). An atom
            # left unplaced after the passes fails the `inside` audit below.
            for _hop in range(hops):
                cell_d = global_cell_index(pool_x, d)
                dev_d = cell_d // L
                # signed shortest-path device distance (periodic wrap)
                diff = dev_d - idx_dev
                half = n // 2
                diff = jnp.where(diff > half, diff - n, diff)
                diff = jnp.where(diff < -half, diff + n, diff)
                leave_lo = pool_ok & (diff < 0)
                leave_hi = pool_ok & (diff > 0)

                def pack(leaving):
                    order = jnp.argsort(~leaving)  # leavers first, stable
                    count = jnp.sum(leaving)
                    bx = pool_x[:, order][:, :B]
                    bv = pool_v[:, order][:, :B]
                    bt = pool_t[order][:B]
                    bok = (jnp.arange(B) < count) & (count <= B)
                    ovf = jnp.maximum(count - B, 0).astype(jnp.int32)
                    return bx, bv, bt, bok, ovf

                blo = pack(leave_lo)
                bhi = pack(leave_hi)
                # leavers beyond the buffer are dropped from the pool:
                # the trajectory is invalid, the runner grows + replays
                ovf_buf = ovf_buf + blo[4] + bhi[4]

                down = [(i, (i - 1) % n) for i in range(n)]
                up = [(i, (i + 1) % n) for i in range(n)]
                # send lo-bound leavers down; they arrive from above
                rlo = [jax.lax.ppermute(b, name, down) for b in blo[:4]]
                rhi = [jax.lax.ppermute(b, name, up) for b in bhi[:4]]

                # my pool keeps non-leavers; arrivals appended
                stay = pool_ok & ~leave_lo & ~leave_hi
                pool_x = jnp.concatenate([pool_x, rlo[0], rhi[0]], axis=1)
                pool_v = jnp.concatenate([pool_v, rlo[1], rhi[1]], axis=1)
                pool_t = jnp.concatenate([pool_t, rlo[2], rhi[2]])
                pool_ok = jnp.concatenate([stay, rlo[3], rhi[3]])

        # local cell coords for the whole pool: global cell -> local
        cg = [global_cell_index(pool_x, d) for d in range(3)]
        devs = {name: jax.lax.axis_index(name) for name in _AXES if mesh.shape[name] > 1}
        loc = []
        for name, d, L in (("x", 0, lx), ("y", 1, ly), ("z", 2, lz)):
            c = cg[d]
            if name in devs:
                c = c - devs[name] * L
            loc.append(c)
        inside = (
            (loc[0] >= 0) & (loc[0] < lx)
            & (loc[1] >= 0) & (loc[1] < ly)
            & (loc[2] >= 0) & (loc[2] < lz)
        )
        cid_all = (loc[2] * ly + loc[1]) * lx + loc[0]

        # storage ("unfolded") coordinates relative to the grid offset
        off = jnp.asarray(offset, dtype=pool_x.dtype)[:, None]
        g = pool_x - off
        xs = jnp.where(g < 0, pool_x + p, pool_x)

        if not use_pull:
            # sort-based placement: handles arbitrary displacement (the
            # --safe_exchange / tiny-grid fallback)
            ovf_move = ovf_move + jnp.sum(pool_ok & ~inside).astype(jnp.int32)
            cid = jnp.where(pool_ok & inside, cid_all, ncl)

            order = jnp.argsort(cid, stable=True)
            sort_cid = cid[order]
            starts = jnp.searchsorted(sort_cid,
                                      jnp.arange(ncl + 1, dtype=jnp.int32))
            rank = (jnp.arange(len(cid), dtype=jnp.int32)
                    - starts[jnp.clip(sort_cid, 0, ncl)])
            ok = (sort_cid < ncl) & (rank < C)
            dest = jnp.where(ok, sort_cid * C + rank, M_local)
            ovf_cap = ovf_cap + jnp.sum(
                (sort_cid < ncl) & (rank >= C)).astype(jnp.int32)

            new_x = sentinel_positions(M_local, pool_x.dtype).at[:, dest].set(
                xs[:, order], mode="drop")
            new_v = jnp.zeros((3, M_local), pool_v.dtype).at[:, dest].set(
                pool_v[:, order], mode="drop")
            new_t = jnp.zeros((M_local,), jnp.int32).at[dest].set(
                pool_t[order], mode="drop")
            new_ok = jnp.zeros((M_local,), bool).at[dest].set(
                pool_ok[order], mode="drop")
            return new_x, new_v, new_t, new_ok, jnp.stack(
                [ovf_move, ovf_cap, ovf_buf])

        # ---- pull placement (the production path) ----
        # residents: the first M_local pool entries are still
        # slot-structured; movement guard = within ±1 of the slot's cell
        # (wrap only on undecomposed axes, where local == global periodic)
        res_ok = pool_ok[:M_local]
        slot = jnp.arange(M_local, dtype=jnp.int32) // C
        sxyz = (slot % lx, (slot // lx) % ly, slot // (lx * ly))
        near = jnp.ones((M_local,), bool)
        for i, (name, L) in enumerate((("x", lx), ("y", ly), ("z", lz))):
            dlt = jnp.abs(loc[i][:M_local] - sxyz[i])
            if mesh.shape[name] == 1:
                dlt = jnp.minimum(dlt, L - dlt)
            near = near & (dlt <= 1)
        ovf_move = ovf_move + jnp.sum(res_ok & ~near).astype(jnp.int32)

        cid_res = jnp.where(res_ok, cid_all[:M_local], jnp.int32(-1))
        chans = [xs[0, :M_local], xs[1, :M_local], xs[2, :M_local],
                 pool_v[0, :M_local], pool_v[1, :M_local],
                 pool_v[2, :M_local], pool_t[:M_local].astype(pool_x.dtype)]
        outs, counts, cap = pull(cid_res, chans)
        ovf_cap = ovf_cap + cap

        occ = (jnp.arange(C, dtype=jnp.int32)[None, :]
               < counts[:, None]).reshape(M_local)
        sent = sentinel_positions(M_local, pool_x.dtype)
        new_x = jnp.stack([jnp.where(occ, outs[d].reshape(M_local), sent[d])
                           for d in range(3)], axis=0)
        new_v = jnp.stack([jnp.where(occ, outs[3 + d].reshape(M_local), 0.0)
                           for d in range(3)], axis=0)
        new_t = jnp.where(occ, outs[6].reshape(M_local).astype(jnp.int32), 0)
        new_ok = occ

        A = pool_x.shape[1] - M_local
        if A > 0:
            # arrivals: exact insertion after each cell's pulled residents
            # (any within-cell order is physical; the reference appends
            # arrivals too, comm.cpp:552-575)
            a_live = pool_ok[M_local:]
            a_in = inside[M_local:]
            ovf_move = ovf_move + jnp.sum(a_live & ~a_in).astype(jnp.int32)
            acid = jnp.where(a_live & a_in, cid_all[M_local:], ncl)
            order = jnp.argsort(acid, stable=True)
            scid = acid[order]
            starts = jnp.searchsorted(scid,
                                      jnp.arange(ncl + 1, dtype=jnp.int32))
            arank = (jnp.arange(A, dtype=jnp.int32)
                     - starts[jnp.clip(scid, 0, ncl)])
            slotr = counts[jnp.clip(scid, 0, ncl - 1)] + arank
            placed = (scid < ncl) & (slotr < C)
            ovf_cap = ovf_cap + jnp.sum(
                (scid < ncl) & (slotr >= C)).astype(jnp.int32)
            dest = jnp.where(placed, scid * C + slotr, M_local)

            new_x = new_x.at[:, dest].set(xs[:, M_local:][:, order],
                                          mode="drop")
            new_v = new_v.at[:, dest].set(pool_v[:, M_local:][:, order],
                                          mode="drop")
            new_t = new_t.at[dest].set(pool_t[M_local:][order], mode="drop")
            new_ok = new_ok.at[dest].set(placed, mode="drop")
        return new_x, new_v, new_t, new_ok, jnp.stack(
            [ovf_move, ovf_cap, ovf_buf])

    return exchange_rebin
