"""Simulation orchestrator: wires setup, cells, forces, thermo into the
velocity-Verlet run loop (the reference's Integrate::run + main setup
sequence, ref/integrate.cpp:70-207 / ref/ljs.cpp:385-468).

TPU-first structure: the whole timestep loop is a jitted `lax.scan`;
reneighboring (PBC wrap + re-binning sort) happens inside the scan on a
fixed cadence via `lax.cond`. No data-dependent shapes anywhere.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import cells, create, thermo
from .config import FORCE_EAM, FORCE_LJ, In, UNITS_METAL
from .ops.lj import LJParams
from .state import MDState, init_state
from .units import ThermoScales, thermo_scales

# Statically-noev plain steps on aligned decks (read at trace time;
# module-level so A/B perf experiments can build both programs in one
# process — see run() below). "auto" = on for large grids only
# (cells.LARGE_GRID_SLOTS — measured a WIN at 864k and a LOSS at 131k,
# see the constant's comment); True/False force it for A/B runs.
NOEV_FASTPATH = "auto"

# Per-coordinate (M,) scan carries on the aligned fastpath when the force
# backend supports them (read at trace time; module-level for the same
# A/B reason; same "auto" size gate — see run() below).
TRIPLE_CARRY = "auto"

# Half-kick velocity carry on the aligned fastpath: carry w = v + dtf*f
# (the post-first-kick velocity) through the plain-step scan so step n's
# second kick and step n+1's first kick — sequential adds of the SAME
# dtf*f — run as one fused pass `(w + dtf*f) + dtf*f`, dropping one
# (3, M) array round-trip per plain step. The reneigh step consumes
# (x_drifted, w) exactly like the fused-step kernel's epilogue contract
# (see interval_fused). NOT bit-identical: XLA contracts the merged
# kick pair's mul+adds differently from the two separate kick fusions
# (~1 ulp per kick pair, measured 4.8e-7 absolute x-drift after 20
# steps on CPU), so shipping it as a default needs the trajectory
# acceptance bar (scripts/run_tests.py --tpu), like recip=nr0. Default
# OFF; measured via scripts/exp_wcarry.py.
W_CARRY = False


@dataclasses.dataclass
class Simulation:
    inp: In
    geom: cells.CellGeometry
    state: MDState
    scales: ThermoScales
    force_fn: object          # (x, typ) -> (f, eng_vdwl, virial)  [evflag on]
    force_fn_noev: object     # same, but skips energy/virial accumulation
    natoms: int
    mass: float
    dtforce: float            # 0.5*dt / mvv2e / mass (integrate.cpp:43,81; thermo.cpp:69)
    dtype: object
    backend: str = "auto"
    eng_vdwl: jax.Array | None = None
    virial: jax.Array | None = None
    # force-closure factory, kept for capacity grow-and-retry (geom changes)
    _make_force: object = None
    # jit caches: re-wrapping jax.jit per call would retrace and hit the
    # (slow, remote on axon) compile cache every run()
    _jit_cache: dict = dataclasses.field(default_factory=dict)
    # user-pinned geometry (None = autotuned; overflow recovery may then
    # re-grid from live occupancy, see _regrow) + regrow counter
    _user_nbins: object = None
    _user_capacity: object = None
    _regrows: int = 0
    # EXPERIMENTAL (r4): run() plain steps through the fused-step kernel
    # (ops/lj_step_pallas.py) — force + kicks + drift + re-pack in one
    # Pallas call. Opt-in; measured SLOWER than the plain path at 131k
    # with both pack idioms (see the module docstring) — kept for
    # re-measurement as the toolchain moves.
    _fused_step: bool = False

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_input(
        inp: In,
        *,
        ntypes: int = 4,
        dtype=jnp.float32,
        nbins=None,
        capacity: int | None = None,
        cell_chunk: int | None = None,
        potential_path: str | None = None,
        backend: str = "auto",   # 'auto' | 'pallas' | 'xla'
        half_neigh: bool = False,
        ghost_newton: bool = True,
        fused_step: bool = False,
        eam_degree=None,
        recip: str | None = None,
    ) -> "Simulation":
        prd, x_np, v_np, typ_np, mass = create.setup_system(
            inp, ntypes, potential_path)
        return Simulation.from_arrays(
            inp, prd, x_np, v_np, typ_np, mass, ntypes=ntypes,
            dtype=dtype, nbins=nbins, capacity=capacity,
            cell_chunk=cell_chunk, potential_path=potential_path,
            backend=backend, half_neigh=half_neigh,
            ghost_newton=ghost_newton, fused_step=fused_step,
            eam_degree=eam_degree, recip=recip)

    @staticmethod
    def from_arrays(
        inp: In,
        prd,
        x_np,
        v_np,
        typ_np,
        mass: float,
        *,
        ntypes: int | None = None,
        dtype=jnp.float32,
        nbins=None,
        capacity: int | None = None,
        cell_chunk: int | None = None,
        potential_path: str | None = None,
        backend: str = "auto",
        half_neigh: bool = False,
        # reference `-gn` semantics (only meaningful with half_neigh):
        # True = Newton's 3rd law across boundaries, ghost forces folded
        # back (reverse_communicate); False = duplicate boundary-pair
        # evaluation at 0.5 eng/vir weight, no reverse fold
        # (ref force_lj.cpp:239-249, integrate.cpp:188-193)
        ghost_newton: bool = True,
        fused_step: bool = False,
        # EAM pair-table polynomial degrees: None = the trajectory-
        # validated hardware degrees on TPU f32 (eam_file.HARDWARE_DEGREE,
        # G1/G2=18 R=19, +5.8% — passes the reference's acceptance
        # criterion with margin) and the adaptive force-space-exact fit
        # on CPU; "adaptive" forces the exact fit everywhere (the escape
        # hatch, like recip="nr1"); an int or {"R"/"G1"/"G2"/"P": int}
        # dict PINS exact degrees (the sweep knob,
        # scripts/exp_eam_degree.py — d16/d14 are measured trajectory-
        # level FAILURES, do not ship them)
        eam_degree=None,
        # LJ Pallas reciprocal mode: None = the kernel default ("nr0" on
        # hardware, trajectory-validated; "nr2" under interpret); "nr1"
        # = one Newton refinement, f32-rounding-exact forces (~6% slower
        # at 864k); "div" = the exact divide (debugging escape hatch).
        # See ops/lj_pallas.py.
        recip: str | None = None,
    ) -> "Simulation":
        """Build a Simulation from explicit, final state arrays — the
        checkpoint-resume entry (from_input reduces to this after setup).
        Velocities are taken as-is (no COM-zero / rescale). The force
        backend, half-neighbor, and geometry-pin selection is exactly
        from_input's, so a resumed run honors the same knobs."""
        natoms = len(x_np)
        if ntypes is None:
            ntypes = int(np.max(typ_np)) + 1 if natoms else 1

        if fused_step and (inp.forcetype != FORCE_LJ or half_neigh
                           or dtype != jnp.float32
                           or inp.thermo_nstat == 0):
            raise ValueError(
                "fused_step (experimental) requires the LJ full-neighbor "
                "f32 Pallas path with thermo_nstat > 0")

        # force style: each factory returns (force_ev, force_noev) closures
        if inp.forcetype == FORCE_LJ:
            params = LJParams.from_deck(ntypes, inp.epsilon, inp.sigma, inp.force_cut)

            def make_force(geom):
                if half_neigh:
                    # Newton parity option (ref force_lj.cpp:185-263);
                    # measured ~2x slower than full stencils on TPU, kept
                    # for --half_neigh 1 parity (SURVEY.md P7).
                    # ghost_newton=False is the reference's -gn 0
                    # duplicate-boundary-pair variant (force_lj.cpp:239-249)
                    from .ops.lj_half import make_lj_force_half
                    return make_lj_force_half(geom, params, dtype=dtype,
                                              ghost_newton=ghost_newton)
                if Simulation._use_pallas(geom, params, dtype, backend):
                    from .ops.lj_pallas import make_lj_force_pallas
                    return make_lj_force_pallas(geom, params, dtype=dtype,
                                                recip=recip)
                from .ops.lj_grid import make_lj_force_grid
                return make_lj_force_grid(geom, params, dtype=dtype)
        elif inp.forcetype == FORCE_EAM:
            from .ops.eam import EAMTables, make_eam_force
            tables = EAMTables.from_funcfl(potential_path)
            mass = tables.mass

            def make_force(geom):
                # TPU fast path: Chebyshev pair tables (see ops/eam_grid.py
                # for the accuracy story); hand-written Pallas kernels when
                # eligible, XLA grid otherwise. Exact spline gathers stay
                # the default for f64/CPU validation runs.
                import numpy as _np
                if half_neigh:
                    # Newton parity option (ref force_eam.cpp:126-267);
                    # exact spline gathers, slower than full stencils on
                    # TPU (SURVEY.md P7)
                    from .ops.eam_half import make_eam_force_half
                    return make_eam_force_half(geom, tables, ntypes,
                                               dtype=dtype)
                on_accel = jax.default_backend() != "cpu"
                use_fast = backend in ("pallas", "grid") or (
                    backend == "auto" and dtype == jnp.float32 and on_accel
                )
                if use_fast:
                    pallas_ok = (dtype == jnp.float32 and on_accel
                                 and int(_np.abs(geom.stencil).max()) == 1
                                 and backend != "grid")
                    if pallas_ok:
                        # NOTE: the gather-table variant
                        # (make_eam_force_pallas_rows) measured SLOWER
                        # (7.57 vs 9.45 Matom-steps/s at 131k) — Mosaic's
                        # dynamic_gather costs ~a degree-20 Horner per
                        # 4-coeff eval; kept in-tree as a documented
                        # negative result, not wired here.
                        from .ops.eam_pallas import make_eam_force_pallas
                        return make_eam_force_pallas(geom, tables, ntypes,
                                                     dtype=dtype,
                                                     degree=eam_degree)
                    from .ops.eam_grid import make_eam_force_grid
                    return make_eam_force_grid(geom, tables, ntypes,
                                               dtype=dtype,
                                               degree=eam_degree)
                f = make_eam_force(geom, tables, ntypes, dtype=dtype,
                                   cell_chunk=cell_chunk)
                return f, f
        else:
            raise ValueError(f"unknown forcetype {inp.forcetype}")

        # The shipped EAM decks are solid Cu (600 K start, cooling): vouch
        # crystallinity so commensurate grids get lattice-tight capacity
        # (cells.pick_capacity). Wrong vouches fail loudly via the rebin
        # overflow counter.
        solid = inp.forcetype == FORCE_EAM and inp.datafile is None
        geom = cells.build_geometry(prd, inp.neigh_cut, x_np, nbins=nbins,
                                    capacity=capacity, solid=solid)
        scales = thermo_scales(inp.units, natoms,
                               float(np.prod(np.asarray(prd))))

        state = init_state(x_np, v_np, typ_np, geom, dtype=dtype)

        dtforce = 0.5 * inp.dt
        if inp.units == UNITS_METAL:
            dtforce /= scales.mvv2e
        dtforce /= mass

        force_ev, force_noev = make_force(geom)
        sim = Simulation(
            inp=inp, geom=geom, state=state, scales=scales,
            force_fn=force_ev, force_fn_noev=force_noev, natoms=natoms,
            mass=mass, dtforce=dtforce, dtype=dtype, backend=backend,
            _make_force=make_force, _user_nbins=nbins,
            _user_capacity=capacity, _fused_step=fused_step,
        )
        sim._compute_initial_force()
        return sim

    # ------------------------------------------------------------------
    @staticmethod
    def _use_pallas(geom, params, dtype, backend: str) -> bool:
        """The hand-written kernel needs TPU + f32 + uniform type tables +
        single-cell stencil reach; otherwise the XLA grid path serves."""
        if backend == "xla":
            return False
        import numpy as _np
        eligible = (
            dtype == jnp.float32
            and params.uniform
            and int(_np.abs(geom.stencil).max()) == 1
            and jax.default_backend() not in ("cpu",)
        )
        if backend == "pallas" and not eligible:
            raise ValueError("pallas backend requires TPU + f32 + uniform "
                             "LJ parameters + binsize >= cutneigh")
        return eligible

    # ------------------------------------------------------------------
    def _jit(self, key, fn):
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _compute_initial_force(self):
        f, eng, vir = self._jit("force_ev", self.force_fn)(
            self.state.x, self.state.typ)
        self.state = self.state._replace(f=f)
        self.eng_vdwl, self.virial = eng, vir
        self._row0 = self.thermo_row(0)

    def thermo_row(self, step: int) -> tuple[int, float, float, float]:
        t = float(thermo.temperature(self.state.v, self.mass, self.scales))
        u = float(thermo.energy(self.eng_vdwl, self.natoms, self.scales))
        p = float(thermo.pressure(t, self.virial, self.scales))
        return (step, t, u, p)

    # ------------------------------------------------------------------
    # step functions
    # ------------------------------------------------------------------
    def _make_step_fns(self, with_reneigh_cond: bool = True):
        dt = jnp.asarray(self.inp.dt, self.dtype)
        dtf = jnp.asarray(self.dtforce, self.dtype)
        force_ev, force_noev = self.force_fn, self.force_fn_noev
        geom = self.geom
        mass, scales, natoms = self.mass, self.scales, self.natoms
        every = self.inp.neigh_every
        nstat = self.inp.thermo_nstat

        def half_kick_drift(s: MDState) -> MDState:
            v = s.v + dtf * s.f
            x = s.x + dt * v
            return s._replace(x=x, v=v)

        def reneigh(s: MDState) -> MDState:
            x, v, typ, valid, ovf = cells.rebin(s.x, s.v, s.typ, s.valid, geom)
            return MDState(x=x, v=v, f=s.f, typ=typ, valid=valid,
                           overflow=s.overflow + ovf)

        def finish(s: MDState, n):
            """Force + final integrate + thermo for step index n.

            The thermo reductions are gated on the nstat cadence exactly
            like run()'s fused loop (ref thermo.cpp:61-66): --timed must
            measure the production program, not one with an extra
            full-v-array reduction per step (round-3 VERDICT weak #5)."""
            if nstat > 0:
                evflag = (n + 1) % nstat == 0
                f, eng, vir = jax.lax.cond(evflag, force_ev, force_noev,
                                           s.x, s.typ)
            else:
                f, eng, vir = force_noev(s.x, s.typ)
            v = s.v + dtf * f
            s = s._replace(v=v, f=f)

            def row(v, eng, vir):
                t = thermo.temperature(v, mass, scales)
                u = thermo.energy(eng, natoms, scales)
                p = thermo.pressure(t, vir, scales)
                return t, u, p

            if nstat > 0:
                zero = jnp.zeros((), v.dtype)
                t, u, p = jax.lax.cond(
                    evflag, row, lambda *_a: (zero, zero, zero), v, eng, vir)
            else:
                t, u, p = row(v, eng, vir)
            return s, jnp.stack([t, u, p])

        def step(s: MDState, n):
            """One velocity-Verlet step; n is the 0-based step index.

            Matches Integrate::run's cadence (integrate.cpp:88-204):
            initial integrate, reneighbor on the `every` cadence, force with
            evflag only on thermo steps, final integrate.
            """
            s = half_kick_drift(s)
            if with_reneigh_cond:
                is_reneigh = (n + 1) % every == 0
                s = jax.lax.cond(is_reneigh, reneigh, lambda st: st, s)
            return finish(s, n)

        def step_reneigh(s: MDState, n):
            """A step known statically to reneighbor (no cond)."""
            s = half_kick_drift(s)
            s = reneigh(s)
            return finish(s, n)

        return step, step_reneigh

    # ------------------------------------------------------------------
    def run(self, ntimes: int | None = None):
        """Run the timestep loop fully fused; returns (ntimes, 3) [T, U, P]
        per step (thermo subsampling happens at print time)."""
        ntimes = self.inp.ntimes if ntimes is None else ntimes
        key = ("run", ntimes)
        if key not in self._jit_cache:
            every = self.inp.neigh_every
            k, r = divmod(ntimes, every)
            dt = jnp.asarray(self.inp.dt, self.dtype)
            dtf = jnp.asarray(self.dtforce, self.dtype)
            force_ev, force_noev = self.force_fn, self.force_fn_noev
            geom = self.geom
            mass, scales, natoms = self.mass, self.scales, self.natoms
            nstat = self.inp.thermo_nstat

            # Lean carry for the hot loop: (x, v, f, typ). Validity is
            # recovered from the sentinel coordinates; per-rebin overflow
            # counts ride the trace instead of the carry.
            def finish(x, v, typ, n):
                if nstat > 0:
                    # ev on thermo steps + the final step, so trace[-1]
                    # always carries a thermo row (like the sharded loop
                    # and the reference's final compute, ljs.cpp:477-483)
                    evflag = ((n + 1) % nstat == 0) | (n == ntimes - 1)
                    f, eng, vir = jax.lax.cond(evflag, force_ev, force_noev,
                                               x, typ)
                else:
                    f, eng, vir = force_noev(x, typ)
                v = v + dtf * f

                # thermo only on nstat steps, like the reference
                # (thermo.cpp:61-66): the temperature reduction reads the
                # whole v array and is measurable glue at large sizes
                def row(v, eng, vir):
                    t = thermo.temperature(v, mass, scales)
                    u = thermo.energy(eng, natoms, scales)
                    p = thermo.pressure(t, vir, scales)
                    return t, u, p

                if nstat > 0:
                    zero = jnp.zeros((), v.dtype)
                    t, u, p = jax.lax.cond(
                        evflag, row,
                        lambda *_a: (zero, zero, zero), v, eng, vir)
                else:
                    t, u, p = row(v, eng, vir)
                return (x, v, f, typ), (t, u, p)

            def plain(c, n):
                x, v, f, typ = c
                v = v + dtf * f
                x = x + dt * v
                c, (t, u, p) = finish(x, v, typ, n)
                return c, jnp.stack([t, u, p, jnp.zeros_like(t)])

            # When the thermo cadence is a multiple of the reneighbor
            # cadence (every shipped deck: nstat=100, every=20), a plain
            # step can STATICALLY never be a thermo step: (n+1) % nstat
            # == 0 implies (n+1) % every == 0, i.e. a reneigh step, and
            # with r == 0 the final (ev-forced) step is a reneigh step
            # too. Calling force_noev directly instead of the traced-
            # predicate lax.cond drops the conditional's operand
            # marshaling and branch plumbing (measured +0.5% whole-step
            # at 864k on top of OUT_STACK, neutral alone — same-session
            # A/B, scripts/exp_glue.py 2026-08-19; the reference's
            # evflag gate, integrate.cpp:182-183, is a compile-time
            # branch for the same reason). Bit-identical: same ops in
            # the same order as the cond's false branch.
            def plain_noev(c, n):
                del n
                x, v, f, typ = c
                v = v + dtf * f
                x = x + dt * v
                f, eng, vir = force_noev(x, typ)
                v = v + dtf * f
                zero = jnp.zeros((), v.dtype)
                return (x, v, f, typ), jnp.stack([zero] * 4)

            large = geom.nslots >= cells.LARGE_GRID_SLOTS
            noev_on = (large if NOEV_FASTPATH == "auto" else NOEV_FASTPATH)
            aligned = noev_on and nstat > 0 and nstat % every == 0
            plain_interval = plain_noev if aligned else plain

            # Triple carry: a (3, M) f32 scan carry is tiled T(8, 128)
            # with its 3-row sublane dim padded to 8, so every kick/drift
            # pass over it moves ~2.7x the bytes. Carrying x/v/f as
            # 3-tuples of flat (M,) arrays (dense tiling) through the
            # plain-step scan removes that padding; the interval boundary
            # stacks back to (3, M) for the rebin step (1/every of the
            # cost). Bit-identical: the same elementwise ops run per
            # coordinate slice, and the force kernel consumes identical
            # per-coordinate grids either way (ops/lj_pallas.py force()).
            triple_on = (large if TRIPLE_CARRY == "auto" else TRIPLE_CARRY)
            triple = (triple_on and aligned and not self._fused_step
                      and getattr(force_noev, "accepts_triple", False)
                      and getattr(force_ev, "accepts_triple", False))
            wcarry_on = (large if W_CARRY == "auto" else W_CARRY)
            wcarry = wcarry_on and aligned and not self._fused_step

            def plain_noev_triple(c, n):
                del n
                x, v, f, typ = c    # x, v, f: 3-tuples of (M,)
                v = tuple(v[i] + dtf * f[i] for i in range(3))
                x = tuple(x[i] + dt * v[i] for i in range(3))
                f, eng, vir = force_noev(x, typ)
                v = tuple(v[i] + dtf * f[i] for i in range(3))
                zero = jnp.zeros((), v[0].dtype)
                return (x, v, f, typ), jnp.stack([zero] * 4)

            # local (one-hot pull) rebin needs distinct wrap neighbors;
            # tiny grids fall back to the sort-based path. On TPU/f32 the
            # Pallas kernel (srcl contraction + per-lane channel gathers)
            # beats the XLA one-hot at every size since the r3 rework
            # (131k: ~17.7 -> ~3 ms/call; 864k: ~54 -> ~6; bit-identical
            # layout, tested).
            if (self.backend != "xla" and self.dtype == jnp.float32
                    and min(geom.nb) >= 3
                    and jax.default_backend() not in ("cpu",)):
                from .ops.rebin_pallas import make_rebin_pallas
                # concrete uniform-type check (MD never changes types, and
                # rebin moves them verbatim): lets the kernel drop the typ
                # pull channel and reconstruct it from occupancy
                typ_c = np.asarray(self.state.typ)[np.asarray(self.state.valid)]
                uni = np.unique(typ_c)
                _rp = make_rebin_pallas(
                    geom,
                    uniform_typ=int(uni[0]) if len(uni) == 1 else None)
                rebin_fn = lambda x, v, typ, _g: _rp(x, v, typ)
                rebin_fn.accepts_triple = True
            else:
                rebin_fn = (cells.rebin_local if min(geom.nb) >= 3
                            else cells.rebin_lean)

            def reneigh_step(c, n):
                x, v, f, typ = c
                v = v + dtf * f
                x = x + dt * v
                x, v, typ, ovf = rebin_fn(x, v, typ, geom)
                c, (t, u, p) = finish(x, v, typ, n)
                return c, jnp.stack([t, u, p, ovf.astype(t.dtype)])

            if self._fused_step:
                # EXPERIMENTAL: plain steps ride the fused-step kernel
                # (force + both kicks + drift + candidate re-pack in one
                # Pallas call, ops/lj_step_pallas.py). The interval's
                # rebin step stays on the XLA path: the fused carry's
                # (x, w) is exactly the (position, half-kick velocity)
                # pair reneigh_step's rebin + finish consume — only the
                # kick+drift it would do first has already happened in
                # the last fused call's epilogue.
                from .ops.lj_step_pallas import make_lj_step_pallas
                fparams = LJParams.from_deck(
                    1, self.inp.epsilon, self.inp.sigma, self.inp.force_cut)
                s_ev, s_noev, seed = make_lj_step_pallas(
                    geom, fparams, float(self.inp.dt), self.dtforce,
                    interpret=jax.default_backend() == "cpu")
                nbx_, nby_, nbz_ = geom.nb
                M_ = nbx_ * nby_ * nbz_ * geom.capacity
                tsc = self.mass * self.scales.t_scale

                def fused_body(fc, n):
                    evflag = ((n + 1) % nstat == 0)
                    J, xg, wg, eng, vir, vsq = jax.lax.cond(
                        evflag, s_ev, s_noev, *fc)
                    # noev returns zero scalars, so the computed row is
                    # exactly the plain path's zeroed non-nstat row
                    t = vsq * tsc
                    u = thermo.energy(eng, natoms, scales)
                    p = thermo.pressure(t, vir, scales)
                    return (J, xg, wg), jnp.stack(
                        [t, u, p, jnp.zeros_like(t)])

                def fused_reneigh(c, n):
                    # the fused epilogue already kicked + drifted: go
                    # straight to rebin with (x, w)
                    x, w, typ, ovf = rebin_fn(c[0], c[1], c[2], geom)
                    c, (t, u, p) = finish(x, w, typ, n)
                    return c, jnp.stack([t, u, p, ovf.astype(t.dtype)])

                def interval_fused(c, i):
                    x, v, f, typ = c
                    n0 = i * every
                    fc = seed(x, v, f)
                    fc, tr = jax.lax.scan(fused_body, fc,
                                          n0 + jnp.arange(every - 1))
                    J, xg, wg = fc
                    xw = [jnp.stack([g[d].reshape(M_) for d in range(3)])
                          for g in (xg, wg)]
                    c, row = fused_reneigh((xw[0], xw[1], typ),
                                           n0 + every - 1)
                    return c, jnp.concatenate([tr, row[None]], axis=0)

            rebin_triple = getattr(rebin_fn, "accepts_triple", False)

            def reneigh_triple(ct, n):
                """reneigh_step on the triple carry: kick/drift/rebin run
                per coordinate on densely-tiled (M,) arrays (no (3, M)
                sublane padding, no stack/unstack at interval boundaries).
                Bit-identical to reneigh_step: elementwise ops per
                coordinate slice, the rebin's wrap/cell arithmetic is the
                same per-coordinate math (ops/rebin_pallas.rebin), and the
                thermo row reduces over the stacked (3, M) v exactly like
                finish() (the stack IS the (3, M) array, and it only
                materializes inside the evflag branch)."""
                x, v, f, typ = ct
                v = tuple(v[j] + dtf * f[j] for j in range(3))
                x = tuple(x[j] + dt * v[j] for j in range(3))
                if rebin_triple:
                    x, v, typ, ovf = rebin_fn(x, v, typ, geom)
                else:
                    xs2, vs2, typ, ovf = rebin_fn(
                        jnp.stack(x), jnp.stack(v), typ, geom)
                    x = tuple(xs2[j] for j in range(3))
                    v = tuple(vs2[j] for j in range(3))
                evflag = ((n + 1) % nstat == 0) | (n == ntimes - 1)
                f, eng, vir = jax.lax.cond(evflag, force_ev, force_noev,
                                           x, typ)
                v = tuple(v[j] + dtf * f[j] for j in range(3))

                def row(v, eng, vir):
                    t = thermo.temperature(jnp.stack(v), mass, scales)
                    u = thermo.energy(eng, natoms, scales)
                    p = thermo.pressure(t, vir, scales)
                    return t, u, p

                zero = jnp.zeros((), v[0].dtype)
                t, u, p = jax.lax.cond(
                    evflag, row, lambda *_a: (zero, zero, zero),
                    v, eng, vir)
                return (x, v, f, typ), jnp.stack(
                    [t, u, p, ovf.astype(t.dtype)])

            def run_fn(s: MDState):
                """Interval-nested scan: (every-1) plain steps + one
                statically-reneighboring step per interval — no per-step
                branch in the hot loop."""
                c = (s.x, s.v, s.f, s.typ)

                def interval(c, i):
                    n0 = i * every
                    c, tr = jax.lax.scan(plain_interval, c,
                                         n0 + jnp.arange(every - 1))
                    c, row = reneigh_step(c, n0 + every - 1)
                    return c, jnp.concatenate([tr, row[None]], axis=0)

                def interval_triple(ct, i):
                    # the triple carry stays triple ACROSS intervals (the
                    # old form stacked back to (3, M) for every reneigh
                    # step — 6 relayout copies per interval plus 2.7x-
                    # padded kicks; now the stack happens once per run,
                    # in the epilogue below)
                    n0 = i * every
                    ct, tr = jax.lax.scan(plain_noev_triple, ct,
                                          n0 + jnp.arange(every - 1))
                    ct, row = reneigh_triple(ct, n0 + every - 1)
                    return ct, jnp.concatenate([tr, row[None]], axis=0)

                def interval_w(c, i):
                    # W_CARRY: seed w = v + dtf*f (step n0's first kick),
                    # then each scan iteration is drift / force / merged
                    # double-kick; the trailing reneigh step receives
                    # (x_drifted, w) — the same contract as the fused-step
                    # epilogue (fused_reneigh above), so rebin + finish
                    # are unchanged. Bit-identical to `interval`: the
                    # double kick `(w + dtf*f) + dtf*f` is the same two
                    # sequential adds the plain bodies execute.
                    n0 = i * every
                    x, v, f, typ = c
                    if triple:
                        x = tuple(x[j] for j in range(3))
                        w = tuple(v[j] + dtf * f[j] for j in range(3))

                        def body_t(cw, n):
                            del n
                            x, w = cw
                            x = tuple(x[j] + dt * w[j] for j in range(3))
                            f, _e, _v = force_noev(x, typ)
                            w = tuple((w[j] + dtf * f[j]) + dtf * f[j]
                                      for j in range(3))
                            zero = jnp.zeros((), w[0].dtype)
                            return (x, w), jnp.stack([zero] * 4)

                        (x, w), tr = jax.lax.scan(
                            body_t, (x, w), n0 + jnp.arange(every - 1))
                        x = jnp.stack(x)
                        w = jnp.stack(w)
                    else:
                        w = v + dtf * f

                        def body(cw, n):
                            del n
                            x, w = cw
                            x = x + dt * w
                            f, _e, _v = force_noev(x, typ)
                            w = (w + dtf * f) + dtf * f
                            zero = jnp.zeros((), w.dtype)
                            return (x, w), jnp.stack([zero] * 4)

                        (x, w), tr = jax.lax.scan(
                            body, (x, w), n0 + jnp.arange(every - 1))
                    # the reneigh step minus its (already-applied) first
                    # kick: drift, rebin, force_ev + second kick + row
                    x = x + dt * w
                    x, w, typ, ovf = rebin_fn(x, w, typ, geom)
                    c, (t, u, p) = finish(x, w, typ, n0 + every - 1)
                    row = jnp.stack([t, u, p, ovf.astype(t.dtype)])
                    return c, jnp.concatenate([tr, row[None]], axis=0)

                if wcarry:
                    interval = interval_w
                if self._fused_step:
                    interval = interval_fused

                trace_parts = []
                if k > 0:
                    if triple and not wcarry and not self._fused_step:
                        x, v, f, typ = c
                        ct = (tuple(x[j] for j in range(3)),
                              tuple(v[j] for j in range(3)),
                              tuple(f[j] for j in range(3)), typ)
                        ct, tr = jax.lax.scan(interval_triple, ct,
                                              jnp.arange(k))
                        c = tuple(jnp.stack(a) for a in ct[:3]) + (ct[3],)
                    else:
                        c, tr = jax.lax.scan(interval, c, jnp.arange(k))
                    trace_parts.append(tr.reshape(k * every, 4))
                if r > 0:
                    c, tr = jax.lax.scan(plain, c, k * every + jnp.arange(r))
                    trace_parts.append(tr)
                trace = (jnp.concatenate(trace_parts, axis=0)
                         if len(trace_parts) > 1 else trace_parts[0])
                x, v, f, typ = c
                valid = x[0] < 0.5 * cells._SENTINEL_BASE
                ovf = s.overflow + trace[:, 3].sum().astype(s.overflow.dtype)
                return MDState(x=x, v=v, f=f, typ=typ, valid=valid,
                               overflow=ovf), trace[:, :3]

            self._jit_cache[key] = jax.jit(run_fn)

        s_before = self.state
        self.state, trace = self._jit_cache[key](self.state)
        trace = np.asarray(jax.device_get(trace))
        if int(self.state.overflow) > 0:
            # transparent grow-and-retry, the reference's neighbor-bin
            # resize semantics (neighbor.cpp:186-208): restore the
            # pre-dispatch state (the overflowed trajectory dropped atoms,
            # so it is invalid), rebuild with more capacity, replay
            if (self._make_force is None
                    or self.geom.capacity >= cells.MAX_CAPACITY):
                raise RuntimeError(
                    f"cell capacity overflow: {int(self.state.overflow)} "
                    f"atom(s) did not fit (capacity {self.geom.capacity}); "
                    "rebuild with a larger --capacity")
            newcap = cells.next_capacity(self.geom.capacity)
            old_nb, old_cap = self.geom.nb, self.geom.capacity
            self._regrow(s_before, newcap, retune=True)
            print(f"# resize: grid {old_nb} C={old_cap} -> {self.geom.nb} "
                  f"C={self.geom.capacity} (rebin overflow), replaying")
            return self.run(ntimes)
        # final force with evflag on, like ljs.cpp:477-483, so thermo state
        # after a run is always consistent regardless of the nstat cadence
        _, eng, vir = self._jit("force_ev", self.force_fn)(
            self.state.x, self.state.typ)
        self.eng_vdwl, self.virial = eng, vir
        return trace

    def _regrow(self, s: MDState, capacity: int, retune: bool = False):
        """Re-lay the state out in a geometry with larger cell capacity;
        forces are recomputed from positions, so physics is unchanged up
        to summation order.

        retune=True (the overflow-recovery paths): if the run was
        autotuned (no explicit nbins/capacity), re-run the grid autotuner
        on the LIVE positions instead of bumping C on the same grid —
        crossing the 128-lane packed-candidate boundary (3C > 128) halves
        the Pallas kernel throughput (measured: an 864k overflow bumped
        C 40 -> 50 and ran at 24.3 vs 48.2 Matom-steps/s), while the
        occupancy counts of the overflowing liquid usually steer the
        autotuner to a finer grid that keeps C on the boundary."""
        valid = np.asarray(s.valid)
        prd = np.asarray(self.geom.prd)
        xs = np.mod(np.asarray(s.x).T[valid], prd)  # fold unfolded coords
        vs = np.asarray(s.v).T[valid]
        ts = np.asarray(s.typ)[valid]
        solid = self.inp.forcetype == FORCE_EAM and self.inp.datafile is None
        geom = None
        if (retune and self._user_nbins is None
                and self._user_capacity is None and self._regrows < 3):
            geom = cells.build_geometry(prd, self.inp.neigh_cut, xs,
                                        solid=solid)
            if (geom.nb == self.geom.nb
                    and geom.capacity <= self.geom.capacity):
                geom = None   # autotune reproduced the overflowing layout
        if geom is None:
            geom = cells.build_geometry(prd, self.inp.neigh_cut, xs,
                                        nbins=self.geom.nb,
                                        capacity=capacity, solid=solid)
        self._regrows += 1
        self.geom = geom
        self.force_fn, self.force_fn_noev = self._make_force(self.geom)
        self._jit_cache.clear()
        self.state = init_state(xs, vs, ts, self.geom, dtype=self.dtype)
        row0 = self._row0
        self._compute_initial_force()
        self._row0 = row0   # step-0 thermo belongs to the original run

    def run_timed(self, timer, ntimes: int | None = None,
                  check_exchange: bool = False):
        """Interval-chunked run with phase timing (reference Timer parity:
        integrate.cpp:101-192 stamps). Slightly slower than run() due to
        per-interval dispatch; physics identical.

        check_exchange: audit per-interval drift against the skin guarantee
        (the reference's --check_exchange, integrate.cpp:112-151, adapted
        to the bound that actually matters here: drift < skin/2 keeps the
        frozen cell assignment equivalent to a cached Verlet list)."""
        from .timer import TIME_FORCE, TIME_NEIGH

        ntimes = self.inp.ntimes if ntimes is None else ntimes
        every = self.inp.neigh_every

        def timed_fns():
            if "timed" not in self._jit_cache:
                geom = self.geom
                step, _ = self._make_step_fns()
                dt = jnp.asarray(self.inp.dt, self.dtype)
                dtf = jnp.asarray(self.dtforce, self.dtype)

                def drift_fn(s: MDState):
                    v = s.v + dtf * s.f
                    x = s.x + dt * v
                    return s._replace(x=x, v=v)

                def rebin_fn(s: MDState):
                    x, v, typ, valid, ovf = cells.rebin(s.x, s.v, s.typ,
                                                        s.valid, geom)
                    return MDState(x=x, v=v, f=s.f, typ=typ, valid=valid,
                                   overflow=s.overflow + ovf)

                def make_force_kick(force, with_row: bool):
                    # ev only on the nstat cadence (host-side selection —
                    # the reneighbor-step index is host-known), so --timed
                    # runs the same program run() measures; nstat == 0
                    # mirrors run()'s ungated row (noev force, T real)
                    def force_kick_fn(s: MDState):
                        f, eng, vir = force(s.x, s.typ)
                        v = s.v + dtf * f
                        s = s._replace(v=v, f=f)
                        if with_row:
                            t = thermo.temperature(v, self.mass, self.scales)
                            u = thermo.energy(eng, self.natoms, self.scales)
                            p = thermo.pressure(t, vir, self.scales)
                        else:
                            t = u = p = jnp.zeros((), self.dtype)
                        return s, jnp.stack([t, u, p])
                    return jax.jit(force_kick_fn)

                nstat0 = self.inp.thermo_nstat == 0
                self._jit_cache["timed"] = (
                    jax.jit(lambda s, n0, length: jax.lax.scan(
                        step, s, n0 + jnp.arange(length)), static_argnums=2),
                    jax.jit(drift_fn), jax.jit(rebin_fn),
                    make_force_kick(self.force_fn, True),
                    make_force_kick(self.force_fn_noev, nstat0),
                )
            return self._jit_cache["timed"]

        scan_steps, drift, rebin_jit, force_kick_ev, force_kick_noev = \
            timed_fns()

        def sync(s):
            jax.block_until_ready(s.x)

        rows = []
        s = self.state
        n = 0
        skin_half = 0.5 * (self.inp.neigh_cut - self.inp.force_cut)
        if check_exchange:
            xold = s.x
            maxdisp = self._jit("maxdisp", lambda a, b: jnp.max(
                jnp.where((a[0:1] < 1e5) & (b[0:1] < 1e5),
                          jnp.abs(a - b), 0.0)))
        timer.stamp()
        while n < ntimes:
            upto = min(((n // every) + 1) * every, ntimes)
            plain = upto - n - (1 if upto % every == 0 else 0)
            if plain > 0:
                s, tr = scan_steps(s, jnp.asarray(n), plain)
                tr_np = np.asarray(jax.device_get(tr))
                rows.extend((n + i + 1, *tr_np[i]) for i in range(plain))
                n += plain
                timer.stamp(TIME_FORCE)
            if n < upto:  # the reneighboring step
                s = drift(s)
                sync(s)
                timer.stamp(TIME_FORCE)
                if check_exchange:
                    d = float(maxdisp(s.x, xold))
                    if d > skin_half:
                        print(f"Warning: max per-interval displacement "
                              f"{d:.4f} exceeds skin/2 = {skin_half:.4f}; "
                              "pairs may be missed — increase reneighboring "
                              "frequency or the skin (integrate.cpp:112-151 "
                              "analog)")
                s_pre = s
                s = rebin_jit(s)
                if int(s.overflow) > 0:
                    # transparent grow-and-retry, same semantics as run()
                    # (neighbor.cpp:241-261): the host re-layout IS the
                    # rebin, so continue the interval from the regrown state
                    if (self._make_force is None
                            or self.geom.capacity >= cells.MAX_CAPACITY):
                        raise RuntimeError(
                            f"cell capacity overflow during timed run "
                            f"(capacity {self.geom.capacity}); rebuild with "
                            "a larger --capacity")
                    newcap = cells.next_capacity(self.geom.capacity)
                    old_nb, old_cap = self.geom.nb, self.geom.capacity
                    self._regrow(s_pre, newcap, retune=True)
                    print(f"# resize: grid {old_nb} C={old_cap} -> "
                          f"{self.geom.nb} C={self.geom.capacity} "
                          f"(rebin overflow), re-laying out")
                    s = self.state
                    (scan_steps, drift, rebin_jit, force_kick_ev,
                     force_kick_noev) = timed_fns()
                if check_exchange:
                    xold = s.x
                sync(s)
                timer.stamp(TIME_NEIGH)
                nstat = self.inp.thermo_nstat
                on_cadence = nstat > 0 and (n + 1) % nstat == 0
                s, row = (force_kick_ev if on_cadence
                          else force_kick_noev)(s)
                row = np.asarray(jax.device_get(row))
                rows.append((n + 1, *row))
                n += 1
                timer.stamp(TIME_FORCE)
        self.state = s
        if int(self.state.overflow) > 0:
            raise RuntimeError(
                "cell capacity overflow during timed run; rebuild with a "
                "larger --capacity")
        _, eng, vir = self._jit("force_ev", self.force_fn)(s.x, s.typ)
        self.eng_vdwl, self.virial = eng, vir
        return np.asarray([[r[1], r[2], r[3]] for r in rows])

    def thermo_trace(self, trace: np.ndarray) -> list[tuple[int, float, float, float]]:
        """Subsample the per-step trace at thermo_nstat cadence, including
        step 0 (computed from the initial force). nstat == 0 reserves the
        start + end rows only (ref thermo.cpp:49-50,95-99)."""
        nstat = self.inp.thermo_nstat
        rows = [self._row0]
        for n in range(len(trace)):
            if nstat and (n + 1) % nstat == 0:
                rows.append((n + 1, *map(float, trace[n])))
        if len(trace) and (nstat == 0 or len(trace) % nstat != 0):
            # trailing partial interval (or nstat=0 end row): the in-scan
            # row carries no energy (no-ev step); recompute from the
            # post-run evflag force, like the reference's final compute
            # (ljs.cpp:477-483)
            rows.append(self.thermo_row(len(trace)))
        return rows
