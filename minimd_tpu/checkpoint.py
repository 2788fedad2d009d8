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
    """Rebuild a Simulation from a checkpoint. Keyword arguments are
    Simulation.from_arrays' (dtype, backend, nbins, capacity, half_neigh,
    ...), so a resumed run honors the same knobs as a fresh one —
    including the --backend escape hatch and overflow grow-and-replay."""
    from .sim import Simulation

    inp, prd, x, v, typ, mass, step, row0 = load(path)
    sim = Simulation.from_arrays(inp, prd, x, v, typ, mass, **sim_kwargs)
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
