"""Spatial decomposition over TPU meshes.

High-level entry point:

    from minimd_tpu.parallel import ShardedSimulation
    ssim = ShardedSimulation.from_input(builtin_deck("lj"), devices=jax.devices())
    trace = ssim.run(100)

mesh.py   — min-surface processor-grid factorization -> jax.sharding.Mesh
step.py   — sharded LJ/EAM run loops (ppermute halos, psum thermo)
comm.py   — atom migration (dim-by-dim leaver buffers + local rebin)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .mesh import make_mesh, min_surface_grid  # noqa: F401


@dataclasses.dataclass
class ShardedSimulation:
    """Multi-device counterpart of Simulation: same deck inputs, state
    sharded over a mesh chosen by min-surface factorization.

    Physics is identical to the single-device path (bit-identical
    temperature traces in the f64 tests); use it when one chip's HBM or
    FLOPs are not enough — capacity weak-scales with devices while halo
    width stays O(cutoff) (SURVEY.md §5.7).
    """

    inp: object
    geom: object
    mesh: object
    run_fn: object
    sharding: object
    natoms: int
    scales: object
    mass: float
    arrays: tuple   # (x, v, f, typ, valid) device arrays, grid-shaped
    dtforce: float = 0.0
    row0: tuple = (0, 0.0, 0.0, 0.0)   # step-0 thermo (T, U, P)
    # rebuild closure for the grow-and-retry paths:
    # (geom, buf_cap) -> (run_fn, force0)
    _rebuild: object = None
    # current migration-buffer capacity (None = per-axis boundary-layer
    # default; grown on buffer overflow — comm.cpp:887-909 growsend analog)
    _buf_cap: object = None
    _timed_cache: dict = dataclasses.field(default_factory=dict)
    # per-interval (force, comm, neigh) host stamps from the last
    # run_timed — the raw material of the per-device TIME statistics in
    # the YAML report (output.per_device_statistics)
    interval_stamps: list = dataclasses.field(default_factory=list)

    @staticmethod
    def from_input(inp, devices=None, *, dtype=None, nbins=None,
                   safe_exchange=False, ntypes: int = 4, backend: str = "auto",
                   capacity: int | None = None, half_neigh: bool = False,
                   ghost_newton: bool = True,
                   potential_path: str | None = None,
                   cell_chunk: int | None = None,
                   exchange_buf_cap: int | None = None):
        from .. import create

        # the reference's deterministic setup sequence (ljs.cpp:385-468),
        # shared with the single-device path (create.setup_system)
        prd, x_np, v_np, typ_np, mass = create.setup_system(
            inp, ntypes, potential_path)
        return ShardedSimulation.from_arrays(
            inp, prd, x_np, v_np, typ_np, mass, devices=devices,
            dtype=dtype, nbins=nbins, safe_exchange=safe_exchange,
            backend=backend, capacity=capacity, half_neigh=half_neigh,
            ghost_newton=ghost_newton,
            potential_path=potential_path, cell_chunk=cell_chunk,
            exchange_buf_cap=exchange_buf_cap)

    @staticmethod
    def from_arrays(inp, prd, x_np, v_np, typ_np, mass, *, devices=None,
                    dtype=None, nbins=None, safe_exchange=False,
                    backend: str = "auto", capacity: int | None = None,
                    row0=None, half_neigh: bool = False,
                    ghost_newton: bool = True,
                    potential_path: str | None = None,
                    cell_chunk: int | None = None,
                    exchange_buf_cap: int | None = None):
        """Build a sharded simulation from explicit state arrays (the
        checkpoint-resume entry; from_input reduces to this after setup).

        potential_path selects the EAM funcfl file, same as
        Simulation.from_input (ref force_eam.cpp:74-79 coeff init).
        cell_chunk exists only on the single-device exact-spline backend
        (ops/eam.make_eam_force); every sharded force backend is
        grid/Pallas-shaped with no chunk dimension, so a non-None value
        here is a usage error, rejected loudly rather than ignored.
        exchange_buf_cap pins the per-axis migration-buffer capacity
        (default: one boundary cell layer — the hard hops=1 bound under
        the skin guarantee); the runner grows it and replays on buffer
        overflow, the reference's growsend/growrecv (comm.cpp:887-909)."""
        if cell_chunk is not None:
            raise ValueError(
                "cell_chunk applies to the single-device exact-spline EAM "
                "backend only; the sharded force backends (grid/Pallas) "
                "have no chunk dimension — drop the knob or run "
                "Simulation.from_input")
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .. import cells
        from ..config import FORCE_EAM, FORCE_LJ, UNITS_METAL
        from ..ops.lj import LJParams
        from ..ops.lj_grid import make_lj_force_grid
        from ..state import init_state
        from ..units import thermo_scales
        from .step import (local_grid_shape, make_sharded_eam_run,
                           make_sharded_lj_run)

        dtype = dtype or jnp.float32
        devices = list(devices if devices is not None else jax.devices())
        natoms = len(x_np)
        ntypes = int(typ_np.max()) + 1 if len(typ_np) else 1
        prd = tuple(float(p) for p in prd)
        volume = prd[0] * prd[1] * prd[2]

        if inp.forcetype == FORCE_EAM:
            from ..ops.eam import EAMTables
            tables = EAMTables.from_funcfl(potential_path)
            mass = tables.mass
        else:
            tables = None

        scales = thermo_scales(inp.units, natoms, volume)

        grid = min_surface_grid(len(devices), prd)
        # Same data-driven geometry policy as the single-device Simulation
        # (autotuned grid + solid capacity vouch), with the cell grid
        # constrained to divide the mesh. The pre-r5 choose_grid default
        # bypassed the autotuner and cost the sharded-on-1-chip loop ~25%
        # at 131k (19^3 vs the autotuned 17^3 — measured via
        # scripts/exp_shard1.py: shard_map itself is +0.4%).
        solid = inp.forcetype == FORCE_EAM and inp.datafile is None
        if nbins is None:
            nb = cells.autotune_grid(prd, inp.neigh_cut, x_np, solid=solid,
                                     multiple_of=grid)
        else:
            # user-pinned grid: snap each dim down to a mesh multiple
            base = cells.choose_grid(prd, inp.neigh_cut, nbins)
            nb = tuple(max(g, (b // g) * g) for b, g in zip(base, grid))
        geom = cells.build_geometry(prd, inp.neigh_cut, x_np, nbins=nb,
                                    capacity=capacity, solid=solid)
        mesh = make_mesh(devices, prd, grid)

        dtforce = 0.5 * inp.dt
        if inp.units == UNITS_METAL:
            dtforce /= scales.mvv2e
        dtforce /= mass

        # --safe_exchange: forward leavers up to half the ring per axis —
        # enough to place an atom arriving from ANY device (the reference's
        # exchange_all, comm.cpp:599-689). Default single hop is guaranteed
        # by the skin-drift bound for normal cadences.
        hops = max(max(mesh.shape.values()) // 2, 1) if safe_exchange else 1

        def rebuild(geom, buf_cap=exchange_buf_cap):
            """(run_fn, force0) for a geometry — reused by the capacity
            and migration-buffer grow-and-retry paths (the reference's
            bin-resize semantics, neighbor.cpp:241-261, and
            growsend/growrecv, comm.cpp:887-909)."""
            # force0 (initial forces + the step-0 thermo row) rides the
            # SAME production kernel selection as the single-device
            # Simulation — on TPU that is the Pallas kernel with its nr0
            # reciprocal / hardware EAM tables. Using the exact XLA grid
            # here (the pre-r4 choice) left the sharded step-0 row ~1.5e-5
            # off the single-device one once nr0 landed (caught by
            # tpu_sharded_check's step-0 parity assert, 2026-08-19).
            import numpy as _np
            on_cpu0 = jax.default_backend() == "cpu"
            pallas0 = (backend != "xla" and dtype == jnp.float32
                       and int(_np.abs(geom.stencil).max()) == 1
                       and not on_cpu0 and not half_neigh)
            if inp.forcetype == FORCE_LJ:
                params = LJParams.from_deck(ntypes, inp.epsilon, inp.sigma,
                                            inp.force_cut)
                run_fn, _ = make_sharded_lj_run(
                    geom, params, mesh, scales, mass=mass, dt=inp.dt,
                    dtforce=dtforce, natoms=natoms,
                    neigh_every=inp.neigh_every, nstat=inp.thermo_nstat,
                    dtype=dtype, exchange_hops=hops,
                    exchange_buf_cap=buf_cap, backend=backend,
                    half_neigh=half_neigh, ghost_newton=ghost_newton)
                if pallas0 and params.uniform:
                    from ..ops.lj_pallas import make_lj_force_pallas
                    force0 = make_lj_force_pallas(geom, params,
                                                  dtype=dtype)[0]
                else:
                    force0 = make_lj_force_grid(geom, params, dtype=dtype)[0]
            else:
                run_fn, _ = make_sharded_eam_run(
                    geom, tables, mesh, scales, mass=mass, dt=inp.dt,
                    dtforce=dtforce, natoms=natoms,
                    neigh_every=inp.neigh_every, nstat=inp.thermo_nstat,
                    dtype=dtype, exchange_hops=hops,
                    exchange_buf_cap=buf_cap, backend=backend,
                    half_neigh=half_neigh)
                if pallas0 and backend != "grid":
                    from ..ops.eam_pallas import make_eam_force_pallas
                    force0 = make_eam_force_pallas(geom, tables,
                                                   dtype=dtype)[0]
                else:
                    from ..ops.eam_grid import make_eam_force_grid
                    force0 = make_eam_force_grid(geom, tables,
                                                 dtype=dtype)[0]
            return run_fn, force0

        run_fn, force0 = rebuild(geom)
        sharding = NamedSharding(mesh, P(None, "z", "y", "x", None))

        st = init_state(x_np, v_np, typ_np, geom, dtype=dtype)
        f0, eng0, vir0 = jax.jit(force0)(st.x, st.typ)

        if row0 is None:
            from .. import thermo
            t0 = float(thermo.temperature(jnp.asarray(st.v), mass, scales))
            u0 = float(thermo.energy(eng0, natoms, scales))
            p0 = float(thermo.pressure(jnp.asarray(t0), vir0, scales))
            row0 = (0, t0, u0, p0)

        nbx, nby, nbz = geom.nb
        gs = (3, nbz, nby, nbx, geom.capacity)
        gs1 = (nbz, nby, nbx, geom.capacity)
        sh1 = NamedSharding(mesh, P("z", "y", "x", None))
        arrays = (
            jax.device_put(np.asarray(st.x).reshape(gs), sharding),
            jax.device_put(np.asarray(st.v).reshape(gs), sharding),
            jax.device_put(np.asarray(f0).reshape(gs), sharding),
            jax.device_put(np.asarray(st.typ).reshape(gs1), sh1),
            jax.device_put(np.asarray(st.valid).reshape(gs1), sh1),
        )
        return ShardedSimulation(
            inp=inp, geom=geom, mesh=mesh, run_fn=run_fn, sharding=sharding,
            natoms=natoms, scales=scales, mass=mass, arrays=arrays,
            dtforce=dtforce, row0=row0, _rebuild=rebuild,
            _buf_cap=exchange_buf_cap)

    def run(self, ntimes: int, n0: int = 0):
        """Run ntimes steps; returns the (ntimes, 3) T/U/P trace. n0 is the
        global step offset (run_timed dispatches per-interval chunks, and
        the reneigh/thermo cadences key on global step numbers)."""
        import jax
        import numpy as np

        arrays_before = self.arrays
        x, v, f, typ, valid, ovf, trace = self.run_fn(*self.arrays, ntimes,
                                                      n0)
        self.arrays = (x, v, f, typ, valid)
        # ONE host fetch for overflow + trace: every fetch is a full
        # axon-tunnel roundtrip (~100s of ms), so batching matters more
        # than the payload size
        ovf_np, trace = jax.device_get((ovf, trace))
        ovf_move, ovf_cap, ovf_buf = (int(ovf_np[0]), int(ovf_np[1]),
                                      int(ovf_np[2]))
        from ..cells import MAX_CAPACITY, next_capacity

        if ovf_cap > 0 and self._rebuild is not None \
                and self.geom.capacity < MAX_CAPACITY:
            # transparent grow-and-retry (the reference's bin-resize
            # semantics, neighbor.cpp:241-261): the overflowed trajectory
            # dropped atoms, so restore the pre-dispatch state, rebuild
            # with more capacity, replay. Checked BEFORE the movement
            # error: a capacity overflow early in the chunk evolves an
            # invalid trajectory whose later intervals can show spurious
            # movement overflow — the replay decides which is real.
            newcap = next_capacity(self.geom.capacity)
            print(f"# resize: cell capacity {self.geom.capacity} -> "
                  f"{newcap} (migration overflow), replaying interval")
            self._regrow(arrays_before, newcap)
            return self.run(ntimes, n0)
        if ovf_buf > 0:
            # migration-buffer overflow: leavers beyond the buffer were
            # DROPPED, so the trajectory is invalid — grow the buffers and
            # replay from the pre-dispatch state (the reference grows its
            # send/recv buffers mid-exchange, comm.cpp:887-909; here the
            # buffer is a static shape, so growth is a rebuild). Only
            # multi-hop forwarding (--safe_exchange funnels) or an explicit
            # small exchange_buf_cap can get here: the default cap is the
            # hops=1 hard bound (one boundary cell layer).
            nbx, nby, nbz = self.geom.nb
            lx = nbx // self.mesh.shape["x"]
            ly = nby // self.mesh.shape["y"]
            lz = nbz // self.mesh.shape["z"]
            C = self.geom.capacity
            # comm.make_exchange_rebin clamps user caps to the local pool;
            # mirror that here so base reflects the buffer actually built
            base = (min(int(self._buf_cap), lx * ly * lz * C)
                    if self._buf_cap else max(ly * lz, lx * lz, lx * ly) * C)
            # the overflow count bounds the shortfall, so one growth step
            # suffices (vs the reference's incremental BUFFACTOR loop)
            newbuf = min(max(2 * base, base + ovf_buf), lx * ly * lz * C)
            if newbuf > base and self._rebuild is not None:
                print(f"# resize: migration buffer {base} -> {newbuf} "
                      "slots (buffer overflow), replaying interval")
                self._buf_cap = newbuf
                self.run_fn, _ = self._rebuild(self.geom, newbuf)
                self.arrays = arrays_before
                return self.run(ntimes, n0)
            # fail loudly in every remaining case (no rebuild hook, or the
            # buffer already spans the device pool): the dropped atoms make
            # the trajectory invalid, never return it
            raise RuntimeError(
                f"migration buffer overflow: {ovf_buf} leaver(s) did not "
                f"fit the exchange buffer ({base} slots)"
                + ("; construct via from_input/from_arrays for transparent "
                   "buffer growth" if self._rebuild is None else
                   "; the system is displacing faster than the exchange "
                   "can ship"))
        if ovf_move > 0:
            # atoms moved farther than the exchange forwards per interval:
            # no capacity can fix that — fail loudly with the remedy the
            # reference offers (comm.cpp:599-689)
            raise RuntimeError(
                f"migration overflow: {ovf_move} atom(s) moved beyond the "
                "exchange reach in one reneighbor interval; rerun with "
                "--safe_exchange (multi-hop migration) or reneighbor more "
                "often")
        if ovf_cap > 0:
            raise RuntimeError(
                f"cell capacity overflow: {ovf_cap} atom(s) did not "
                f"fit (cell capacity {self.geom.capacity}); rebuild "
                "with a larger capacity")
        return np.asarray(trace)

    def _regrow(self, arrays, capacity: int):
        """Re-lay the sharded state out with a larger cell capacity (same
        grid, so the mesh divisibility is preserved); forces are recomputed
        from positions, so physics is unchanged up to summation order."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .. import cells
        from ..state import init_state

        x, v, f, typ, valid = (np.asarray(jax.device_get(a)) for a in arrays)
        ok = valid.reshape(-1)
        prd = np.asarray(self.geom.prd)
        xs = np.mod(x.reshape(3, -1).T[ok], prd)  # fold unfolded coords
        vs = v.reshape(3, -1).T[ok]
        ts = typ.reshape(-1)[ok]
        dtype = arrays[0].dtype

        self.geom = cells.build_geometry(prd, self.inp.neigh_cut, xs,
                                         nbins=self.geom.nb,
                                         capacity=capacity)
        self.run_fn, force0 = self._rebuild(self.geom, self._buf_cap)
        self._timed_cache.clear()

        import jax.numpy as jnp
        st = init_state(xs, vs, ts, self.geom, dtype=dtype)
        f0, _, _ = jax.jit(force0)(st.x, st.typ)
        nbx, nby, nbz = self.geom.nb
        gs = (3, nbz, nby, nbx, self.geom.capacity)
        gs1 = (nbz, nby, nbx, self.geom.capacity)
        sh1 = NamedSharding(self.mesh, P("z", "y", "x", None))
        self.arrays = (
            jax.device_put(np.asarray(st.x).reshape(gs), self.sharding),
            jax.device_put(np.asarray(st.v).reshape(gs), self.sharding),
            jax.device_put(np.asarray(f0).reshape(gs), self.sharding),
            jax.device_put(np.asarray(st.typ).reshape(gs1), sh1),
            jax.device_put(np.asarray(st.valid).reshape(gs1), sh1),
        )

    @property
    def state(self):
        """Host view of the gathered state (x flat (3, M), valid flat) —
        the surface output.lost_atom_check / run_statistics consume, so the
        sharded path reports through the same harness as Simulation."""
        import jax
        import types

        x, v, f, typ, valid = (np.asarray(jax.device_get(a))
                               for a in self.arrays)
        return types.SimpleNamespace(
            x=x.reshape(3, -1), v=v.reshape(3, -1), typ=typ.reshape(-1),
            valid=valid.reshape(-1))

    def thermo_trace(self, trace):
        """Thermo rows at thermo_nstat cadence, including step 0 — same
        shape as Simulation.thermo_trace (the sharded loop always runs the
        final step with evflag on, so the trailing row carries energy).
        nstat == 0 reserves start + end rows (ref thermo.cpp:49-50,95-99)."""
        nstat = self.inp.thermo_nstat
        rows = [self.row0]
        for n in range(len(trace)):
            if nstat and (n + 1) % nstat == 0:
                rows.append((n + 1, *map(float, trace[n])))
        if len(trace) and (nstat == 0 or len(trace) % nstat != 0):
            rows.append((len(trace), *map(float, trace[-1])))
        return rows

    def run_timed(self, timer, ntimes: int | None = None,
                  check_exchange: bool = False):
        """Interval-chunked run with phase timers (the reference's
        integrate.cpp:101-192 stamps on the MPI path).

        The production loop fuses halo exchange, force, and migration into
        one scan, so phases are attributed by measured replay: each
        reneigh interval runs the fused chunk (timed whole), then replays
        the interval's halo exchanges (COMM, batched into one dispatch +
        one fetch so tunnel latency stays out of the split) and one
        migration pass (NEIGH) on the final state — identical computations
        on identical shapes — and FORCE is the chunk minus the comm
        replay. Slightly slower than run() (extra dispatches); physics
        identical."""
        import time as _time

        import jax
        import jax.numpy as jnp
        from functools import partial
        from jax.sharding import PartitionSpec as P

        from ..timer import TIME_COMM, TIME_FORCE, TIME_NEIGH

        ntimes = self.inp.ntimes if ntimes is None else ntimes
        every = self.inp.neigh_every

        def replays():
            """(Re)build the jitted replay closures for the CURRENT
            geometry. _regrow (capacity overflow inside self.run) clears
            _timed_cache, so this must be re-consulted every loop
            iteration — stale closures capture the old geometry's shapes."""
            if self._timed_cache:
                return self._timed_cache
            geom, mesh = self.geom, self.mesh
            dtype = self.arrays[0].dtype

            from ..ops.pairgrid import halo_extent, to_padded_soa
            from .comm import make_exchange_rebin
            from .step import _make_exchanges, local_grid_shape

            nb_local = local_grid_shape(geom, mesh)
            h = halo_extent(geom)
            exchanges = _make_exchanges(mesh, geom.prd, dtype, h, nb_local)
            ex_rebin = make_exchange_rebin(geom, mesh, dtype)
            spec = P(None, "z", "y", "x", None)
            spec1 = P("z", "y", "x", None)

            @partial(jax.jit, static_argnums=(2,))
            def comm_replay(xg, okg, n):
                # the per-step halo fill (borders/communicate) replayed n
                # times in ONE dispatch with ONE result fetch — a per-step
                # fetch put the axon tunnel latency in the COMM bucket and
                # systematically inflated the printed split (r2 weak #5).
                # The carry perturbation (1 ulp-scale) makes each
                # iteration data-dependent so XLA cannot hoist the
                # loop-invariant halo fill out of the scan.
                @partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec1),
                         out_specs=P())
                def go(xg, okg):
                    flat = xg.reshape(3, -1)

                    def body(acc, _):
                        Xp = to_padded_soa(flat + acc * 1e-30, geom,
                                           h, nb_local=nb_local,
                                           exchanges=exchanges)
                        return acc + sum(jnp.sum(g) for g in Xp), None

                    from .step import _pvary
                    acc, _ = jax.lax.scan(
                        body, _pvary(jnp.zeros((), flat.dtype)), None,
                        length=n)
                    return jax.lax.psum(acc, ("z", "y", "x"))

                return go(xg, okg)

            @jax.jit
            @partial(jax.shard_map, mesh=mesh,
                     in_specs=(spec, spec, spec1, spec1), out_specs=P())
            def neigh_replay(xg, vg, tg, okg):
                xo, *_ = ex_rebin(xg.reshape(3, -1), vg.reshape(3, -1),
                                  tg.reshape(-1), okg.reshape(-1))
                return jax.lax.psum(jnp.sum(xo), ("z", "y", "x"))

            dt_c = self.inp.dt
            dtf_c = self.dtforce

            @jax.jit
            def max_disp(x, v, f, xold):
                # pre-migration position of the upcoming step, recomputed
                # from slot-stable state (migration only reassigns slots)
                xn = x + dt_c * (v + dtf_c * f)
                return jnp.max(jnp.abs(xn - xold))

            self._timed_cache.update(comm=comm_replay, neigh=neigh_replay,
                                     disp=max_disp)
            return self._timed_cache
        skin_half = 0.5 * (self.inp.neigh_cut - self.inp.force_cut)
        xold = self.arrays[0]
        geom_at_xold = self.geom

        rows = []
        n = 0
        while n < ntimes:
            chunk = min(every, ntimes - n)
            t0 = _time.time()
            # n0 = global step offset: the scan's reneigh/thermo cadences
            # key on global step numbers (not the chunk-local counter)
            if check_exchange and (n + chunk) % every == 0:
                # audit the per-interval drift against the skin guarantee
                # before the migration fires (the reference's
                # --check_exchange, integrate.cpp:112-151, adapted to the
                # bound that matters here: drift < skin/2 keeps the frozen
                # cell assignment equivalent to a cached Verlet list)
                trace = (self.run(chunk - 1, n0=n) if chunk > 1
                         else np.zeros((0, 3)))
                x, v, f, typ, valid = self.arrays
                if self.geom is geom_at_xold:
                    # (a capacity regrow inside run() re-sorts slots, so
                    # the per-slot drift vs xold is meaningless that
                    # interval — the regrow replayed it anyway)
                    d = float(replays()["disp"](x, v, f, xold))
                    if d > skin_half:
                        print(f"Warning: max per-interval displacement "
                              f"{d:.4f} exceeds skin/2 = {skin_half:.4f}; "
                              "pairs may be missed — increase reneighboring "
                              "frequency or the skin (integrate.cpp:112-151 "
                              "analog)")
                trace2 = self.run(1, n0=n + chunk - 1)
                trace = np.concatenate([trace, trace2], axis=0)
                xold = self.arrays[0]
                geom_at_xold = self.geom
            else:
                trace = self.run(chunk, n0=n)
            t_chunk = _time.time() - t0
            rows.extend(trace)
            n += chunk

            x, v, f, typ, valid = self.arrays
            t0 = _time.time()
            float(replays()["comm"](x, valid, chunk))   # fetch = sync
            t_comm = _time.time() - t0
            # run(chunk) numbers steps locally, so a migration fired inside
            # the chunk iff it was a full reneigh interval
            t0 = _time.time()
            if chunk == every:
                float(replays()["neigh"](x, v, typ, valid))
            t_neigh = _time.time() - t0

            timer.array[TIME_COMM] += t_comm
            timer.array[TIME_NEIGH] += t_neigh
            timer.array[TIME_FORCE] += max(t_chunk - t_comm - t_neigh, 0.0)
            self.interval_stamps.append(
                (max(t_chunk - t_comm - t_neigh, 0.0), t_comm, t_neigh))
        return np.asarray(rows)
