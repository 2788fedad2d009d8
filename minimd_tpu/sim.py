"""Simulation orchestrator: wires setup, cells, forces, thermo into the
velocity-Verlet run loop (the reference's Integrate::run + main setup
sequence, ref/integrate.cpp:70-207 / ref/ljs.cpp:385-468).

TPU-first structure: the whole timestep loop is a jitted `lax.scan`;
reneighboring (PBC wrap + re-binning sort) happens inside the scan on a
fixed cadence via `lax.cond`. No data-dependent shapes anywhere.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cells, create, thermo
from .config import FORCE_EAM, FORCE_LJ, In, UNITS_METAL
from .ops.lj import LJParams, make_lj_force
from .state import MDState, init_state
from .units import ThermoScales, thermo_scales


@dataclasses.dataclass
class Simulation:
    inp: In
    geom: cells.CellGeometry
    state: MDState
    scales: ThermoScales
    force_fn: object          # (x, typ) -> (f, eng_vdwl, virial)
    natoms: int
    mass: float
    dtforce: float            # 0.5*dt / mvv2e / mass (integrate.cpp:43,81; thermo.cpp:69)
    dtype: object
    eng_vdwl: jax.Array | None = None
    virial: jax.Array | None = None

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
    ) -> "Simulation":
        if inp.datafile is not None:
            from .lammps_data import read_lammps_data
            box, x_np, v_np, mass = read_lammps_data(inp.datafile)
            natoms = len(x_np)
            typ_np = create.assign_types(natoms, ntypes)
        else:
            box = create.create_box(inp.nx, inp.ny, inp.nz, inp.rho)
            x_np, v_np = create.create_atoms(inp.nx, inp.ny, inp.nz, inp.rho, box)
            natoms = len(x_np)
            typ_np = create.assign_types(natoms, ntypes)
            mass = 1.0

        # force style
        if inp.forcetype == FORCE_LJ:
            params = LJParams.from_deck(ntypes, inp.epsilon, inp.sigma, inp.force_cut)
            cutforce = inp.force_cut
            make_force = lambda geom: make_lj_force(geom, params, dtype=dtype,
                                                    cell_chunk=cell_chunk)
        elif inp.forcetype == FORCE_EAM:
            from .ops.eam import EAMTables, make_eam_force
            tables = EAMTables.from_funcfl(potential_path)
            mass = tables.mass
            cutforce = tables.cut
            make_force = lambda geom: make_eam_force(geom, tables, ntypes, dtype=dtype,
                                                     cell_chunk=cell_chunk)
        else:
            raise ValueError(f"unknown forcetype {inp.forcetype}")

        cutneigh = inp.neigh_cut if inp.datafile is None else inp.neigh_cut
        geom = cells.build_geometry(box.prd, cutneigh, x_np, nbins=nbins,
                                    capacity=capacity)
        scales = thermo_scales(inp.units, natoms, box.volume)

        # COM-zero + rescale velocities to t_request (setup.cpp:454-494);
        # only for generated systems (data files carry velocities).
        if inp.datafile is None:
            v_np = create.create_velocity(v_np, inp.t_request, natoms, mass,
                                          scales.t_scale)

        state = init_state(x_np, v_np, typ_np, geom, dtype=dtype)

        dtforce = 0.5 * inp.dt
        if inp.units == UNITS_METAL:
            dtforce /= scales.mvv2e
        dtforce /= mass

        sim = Simulation(
            inp=inp, geom=geom, state=state, scales=scales,
            force_fn=make_force(geom), natoms=natoms, mass=mass,
            dtforce=dtforce, dtype=dtype,
        )
        sim._compute_initial_force()
        return sim

    # ------------------------------------------------------------------
    def _compute_initial_force(self):
        f, eng, vir = jax.jit(self.force_fn)(self.state.x, self.state.typ)
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
    def _make_step_fns(self):
        dt = jnp.asarray(self.inp.dt, self.dtype)
        dtf = jnp.asarray(self.dtforce, self.dtype)
        force_fn = self.force_fn
        geom = self.geom
        mass, scales, natoms = self.mass, self.scales, self.natoms
        every = self.inp.neigh_every

        def half_kick_drift(s: MDState) -> MDState:
            v = s.v + dtf * s.f
            x = s.x + dt * v
            return s._replace(x=x, v=v)

        def reneigh(s: MDState) -> MDState:
            x, v, typ, valid, ovf = cells.rebin(s.x, s.v, s.typ, s.valid, geom)
            return MDState(x=x, v=v, f=s.f, typ=typ, valid=valid,
                           overflow=s.overflow + ovf)

        def step(s: MDState, n):
            """One velocity-Verlet step; n is the 0-based step index."""
            s = half_kick_drift(s)
            is_reneigh = (n + 1) % every == 0
            s = jax.lax.cond(is_reneigh, reneigh, lambda st: st, s)
            f, eng, vir = force_fn(s.x, s.typ)
            v = s.v + dtf * f
            s = s._replace(v=v, f=f)
            t = thermo.temperature(v, mass, scales)
            u = thermo.energy(eng, natoms, scales)
            p = thermo.pressure(t, vir, scales)
            return s, jnp.stack([t, u, p])

        return step

    # ------------------------------------------------------------------
    def run(self, ntimes: int | None = None):
        """Run the timestep loop fully fused; returns (ntimes, 3) [T, U, P]
        per step (thermo subsampling happens at print time)."""
        ntimes = self.inp.ntimes if ntimes is None else ntimes
        step = self._make_step_fns()

        @jax.jit
        def run_fn(s: MDState):
            return jax.lax.scan(step, s, jnp.arange(ntimes))

        self.state, trace = run_fn(self.state)
        trace = np.asarray(jax.device_get(trace))
        # keep the last step's eng/virial consistent with state
        self.eng_vdwl = jnp.asarray(trace[-1, 1] * self.natoms / self.scales.e_scale)
        self.virial = jnp.asarray(
            trace[-1, 2] / self.scales.p_scale - trace[-1, 0] * self.scales.dof_boltz
        )
        return trace

    def thermo_trace(self, trace: np.ndarray) -> list[tuple[int, float, float, float]]:
        """Subsample the per-step trace at thermo_nstat cadence, including
        step 0 (computed from the initial force)."""
        nstat = self.inp.thermo_nstat
        rows = [self._row0]
        for n in range(len(trace)):
            if nstat and (n + 1) % nstat == 0:
                rows.append((n + 1, *map(float, trace[n])))
        if nstat and len(trace) % nstat != 0:
            rows.append((len(trace), *map(float, trace[-1])))
        return rows
