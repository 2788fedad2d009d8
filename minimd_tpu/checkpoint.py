"""Checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5.4) — its only state-load
path is the LAMMPS data reader. We provide both: a compact .npz checkpoint
of (x, v, type, box, step, deck) and LAMMPS-data export for interop.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .config import In


def save(path, sim, step: int = 0):
    """Write a compact checkpoint of the live simulation state. Works for
    both Simulation and ShardedSimulation (the sharded .state property
    exposes the same gathered surface)."""
    valid = np.asarray(sim.state.valid)
    x = np.asarray(sim.state.x).T[valid]
    prd = np.asarray(sim.geom.prd)
    x = x - np.floor(x / prd) * prd          # fold unfolded storage coords
    # provenance: the ORIGINAL trajectory's step-0 thermo row, so a
    # resumed run's conservation ratio / numbering continues the original
    row0 = getattr(sim, "_row0", None) or getattr(sim, "row0", None)
    np.savez_compressed(
        path,
        x=x,
        v=np.asarray(sim.state.v).T[valid],
        typ=np.asarray(sim.state.typ)[valid],
        prd=prd,
        mass=sim.mass,
        step=step,
        row0=np.asarray(row0 if row0 is not None else [0, 0.0, 0.0, 0.0],
                        dtype=np.float64),
        deck=np.array([dataclasses.asdict(sim.inp)], dtype=object),
    )


def load(path):
    """Returns (In, box_prd, x, v, typ, mass, step, row0)."""
    z = np.load(path, allow_pickle=True)
    deck = z["deck"][0]
    deck.pop("source", None)
    inp = In(**{k: v for k, v in deck.items() if k in In.__dataclass_fields__})
    row0 = None
    if "row0" in z:
        r = z["row0"]
        row0 = (int(r[0]), float(r[1]), float(r[2]), float(r[3]))
    return (inp, z["prd"], z["x"], z["v"], z["typ"], float(z["mass"]),
            int(z["step"]), row0)


def resume(path, **sim_kwargs):
    """Rebuild a Simulation from a checkpoint."""
    import jax.numpy as jnp

    from . import cells
    from .sim import Simulation
    from .state import init_state
    from .units import thermo_scales
    from .config import FORCE_LJ, UNITS_METAL
    from .ops.lj import LJParams

    inp, prd, x, v, typ, mass, step, row0 = load(path)
    dtype = sim_kwargs.pop("dtype", jnp.float32)
    backend = sim_kwargs.pop("backend", "auto")
    natoms = len(x)

    geom = cells.build_geometry(prd, inp.neigh_cut, x, **sim_kwargs)
    scales = thermo_scales(inp.units, natoms, float(np.prod(prd)))

    import jax
    if inp.forcetype == FORCE_LJ:
        params = LJParams.from_deck(int(typ.max()) + 1 if len(typ) else 1,
                                    inp.epsilon, inp.sigma, inp.force_cut)
        if Simulation._use_pallas(geom, params, dtype, backend):
            from .ops.lj_pallas import make_lj_force_pallas
            force_ev, force_noev = make_lj_force_pallas(geom, params, dtype=dtype)
        else:
            from .ops.lj_grid import make_lj_force_grid
            force_ev, force_noev = make_lj_force_grid(geom, params, dtype=dtype)
    else:
        from .ops.eam import EAMTables, make_eam_force
        tables = EAMTables.from_funcfl()
        if dtype == jnp.float32 and jax.default_backend() != "cpu":
            from .ops.eam_grid import make_eam_force_grid
            force_ev, force_noev = make_eam_force_grid(geom, tables, dtype=dtype)
        else:
            f = make_eam_force(geom, tables, dtype=dtype)
            force_ev = force_noev = f

    state = init_state(x, v, typ, geom, dtype=dtype)
    dtforce = 0.5 * inp.dt
    if inp.units == UNITS_METAL:
        dtforce /= scales.mvv2e
    dtforce /= mass

    sim = Simulation(inp=inp, geom=geom, state=state, scales=scales,
                     force_fn=force_ev, force_fn_noev=force_noev,
                     natoms=natoms, mass=mass, dtforce=dtforce, dtype=dtype)
    sim._compute_initial_force()
    if row0 is not None:
        # continue the original trajectory's thermo provenance: step-0
        # numbering and the conservation ratio baseline belong to the
        # original run, not the restored instant
        sim._row0 = row0
    return sim, step


def resume_sharded(path, devices=None, **kwargs):
    """Rebuild a ShardedSimulation from a checkpoint (multi-device resume).
    Returns (ssim, step)."""
    from .parallel import ShardedSimulation

    inp, prd, x, v, typ, mass, step, row0 = load(path)
    ssim = ShardedSimulation.from_arrays(inp, prd, x, v, typ, mass,
                                         devices=devices, row0=row0,
                                         **kwargs)
    return ssim, step
