"""Post-run reporting: lost-atom audit, YAML report, run statistics.

Mirrors ref/output.cpp:48-547: atom-count conservation check, the
miniMD-<timestamp>.yaml report (run config, thermo history, energy
conservation ratio, time breakdown), and summary statistics.
"""

from __future__ import annotations

import time

import numpy as np

from .config import FORCE_LJ, UNITS_LJ
from .timer import TIME_COMM, TIME_FORCE, TIME_NEIGH, TIME_TOTAL


def lost_atom_check(sim) -> int:
    """Count atoms still inside the box (output.cpp:60-85); returns the
    number lost (0 is the only acceptable answer)."""
    x = np.asarray(sim.state.x)
    valid = np.asarray(sim.state.valid)
    return sim.natoms - int(valid.sum())


def tail_corrections(rho: float, cutforce: float) -> tuple[float, float]:
    """LJ long-range energy/pressure tail corrections (output.cpp:89-92).
    The reference computes these and never uses them in any printout; we
    report them in the YAML so the information is actually surfaced."""
    import math
    c3 = 1.0 / (3.0 * cutforce ** 3)
    c9 = 1.0 / (9.0 * cutforce ** 9)
    engcorr = 8.0 * math.pi * rho * (c9 - c3)
    prscorr = 8.0 * math.pi * rho * rho * (4.0 * c9 - 2.0 * c3)
    return engcorr, prscorr


def conservation_ratio(rows) -> float:
    """(1.5*T + U) drift ratio between first and last thermo rows
    (output.cpp:172-174)."""
    first, last = rows[0], rows[-1]
    e0 = 1.5 * first[1] + first[2]
    e1 = 1.5 * last[1] + last[2]
    return e1 / e0 if e0 else float("nan")


def _dist(name, arr):
    """min/max/ave + 10-bin histogram (output.cpp:496-547 style)."""
    arr = np.asarray(arr, dtype=float)
    if arr.size == 0:
        return {"min": 0, "max": 0, "ave": 0, "histogram": []}
    lo, hi = float(arr.min()), float(arr.max())
    hist, _ = np.histogram(arr, bins=10, range=(lo, hi if hi > lo else lo + 1))
    return {"min": lo, "max": hi, "ave": float(arr.mean()),
            "histogram": hist.tolist()}


def run_statistics(sim) -> dict:
    """Distribution statistics over the final state: cell occupancy and
    neighbor counts (the reference's cross-rank stats, output.cpp:496-547,
    recast over cells/atoms on the device mesh)."""
    x = np.asarray(sim.state.x)
    valid = np.asarray(sim.state.valid)
    C = sim.geom.capacity
    occ = valid.reshape(-1, C).sum(axis=1)
    stats = {"cell_occupancy": _dist("occ", occ)}
    try:
        from scipy.spatial import cKDTree
        prd = np.asarray(sim.geom.prd)
        xw = np.mod(x.T[valid], prd)
        t = cKDTree(xw, boxsize=prd)
        cut = float(np.sqrt(sim.inp.force_cut ** 2))
        counts = np.asarray(t.query_ball_point(
            xw[:: max(1, len(xw) // 20000)], cut, return_length=True)) - 1
        stats["neighbors_within_cutoff"] = _dist("nn", counts)
    except Exception:
        pass
    return stats


def per_device_statistics(ssim) -> dict:
    """Per-device distributions for sharded runs: atoms owned (nlocal) and
    ghost-slab sizes — the reference's per-rank stats (output.cpp:280-475).
    Per-device TIME is uniform by SPMD construction (all devices execute
    one fused program in lockstep), so unlike MPI ranks there is no time
    skew to histogram; the atom/ghost imbalance below is what drives any
    hardware-level wait."""
    import jax

    valid = np.asarray(jax.device_get(ssim.arrays[4]))  # (nbz,nby,nbx,C)
    nbz, nby, nbx, C = valid.shape
    pz, py, px = (ssim.mesh.shape["z"], ssim.mesh.shape["y"],
                  ssim.mesh.shape["x"])
    lz, ly, lx = nbz // pz, nby // py, nbx // px
    blocks = valid.reshape(pz, lz, py, ly, px, lx, C)
    nlocal = blocks.sum(axis=(1, 3, 5, 6)).reshape(-1)
    # ghost cells per device: the halo shell around the local block
    from .ops.pairgrid import halo_extent

    h = halo_extent(ssim.geom)
    shell_cells = ((lz + 2 * h) * (ly + 2 * h) * (lx + 2 * h) - lz * ly * lx)

    # measured swap sizes: atoms in each device's h-wide boundary slabs per
    # axis — exactly what a halo exchange ships to the two axis neighbors
    # (the reference's per-swap size stats, output.cpp:496-547). An atom
    # within h of BOTH faces counts in both slabs: it genuinely ships twice.
    # Axes the mesh does not decompose ship nothing at all (the periodic
    # wrap rides the kernel's index maps, parallel/step._make_exchanges),
    # so they report zero.
    occ = blocks.sum(axis=6)          # (pz, lz, py, ly, px, lx) atoms/cell
    hz = min(h, lz)
    hy = min(h, ly)
    hx = min(h, lx)
    zeros = np.zeros(pz * py * px, dtype=occ.dtype)
    swaps = {
        "z": ((occ[:, :hz].sum(axis=(1, 3, 5))
               + occ[:, lz - hz:].sum(axis=(1, 3, 5))).reshape(-1)
              if pz > 1 else zeros),
        "y": ((occ[:, :, :, :hy].sum(axis=(1, 3, 5))
               + occ[:, :, :, ly - hy:].sum(axis=(1, 3, 5))).reshape(-1)
              if py > 1 else zeros),
        "x": ((occ[..., :hx].sum(axis=(1, 3, 5))
               + occ[..., lx - hx:].sum(axis=(1, 3, 5))).reshape(-1)
              if px > 1 else zeros),
    }
    out = {
        "atoms_per_device": _dist("nlocal", nlocal),
        "atoms_per_device_list": nlocal.tolist(),
        "ghost_cells_per_device": shell_cells,
        "halo_extent_cells": h,
    }
    for ax, sizes in swaps.items():
        out[f"swap_atoms_{ax}_per_device"] = _dist(f"swap_{ax}", sizes)

    # per-device TIME statistics (the reference's per-rank time histograms,
    # output.cpp:280-475), from run_timed's per-interval host stamps. One
    # fused SPMD program drives all devices, so the per-device value for a
    # bucket is the shared dispatch time: the min/max/ave rows come out
    # degenerate, which IS the measurement (no rank skew can exist where
    # ranks execute one program in lockstep). The real variance of an SPMD
    # run lives across intervals, so that distribution is reported too,
    # and the per-device atom imbalance above bounds any hardware-level
    # wait skew inside a dispatch.
    stamps = getattr(ssim, "interval_stamps", None)
    if stamps:
        ndev = pz * py * px
        arr = np.asarray(stamps, dtype=float)   # (nintervals, 3)
        for i, name in enumerate(("force", "comm", "neigh")):
            total = float(arr[:, i].sum())
            out[f"time_{name}_per_device"] = _dist(
                name, np.full(ndev, total))
            out[f"time_{name}_intervals"] = _dist(name + "_iv", arr[:, i])
        out["time_per_device_note"] = (
            "SPMD lockstep: all devices execute one fused program, so "
            "per-device times are uniform by measurement (the dispatch "
            "wall time); interval distributions carry the run's variance")
        out["time_attribution_note"] = (
            "comm/neigh are measured-replay ESTIMATES: the production "
            "chunk fuses exchange+force+migration into one program, so "
            "the split re-times identical computations outside it "
            "(good for sanity, not for kernel tuning — see "
            "ShardedSimulation.run_timed)")
    return out


def yaml_report(sim, rows, timer, *, nprocs=1, nthreads=1, path=None,
                screen=False, extra_stats=None) -> str:
    """Write the YAML run report (output.cpp:105-493)."""
    inp = sim.inp
    lost = lost_atom_check(sim)
    t_total = timer.array[TIME_TOTAL]
    t_force = timer.array[TIME_FORCE]
    t_neigh = timer.array[TIME_NEIGH]
    t_comm = timer.array[TIME_COMM]
    t_other = max(t_total - t_force - t_neigh - t_comm, 0.0)

    lines = []
    a = lines.append
    a("run_configuration:")
    a(f"  variant: miniMD-tpu (JAX/XLA/Pallas)")
    a(f"  mpi_processes: {nprocs}")
    a(f"  host_threads: {nthreads}")
    a(f"  inputfile: {getattr(inp, 'source', 'deck')}")
    a(f"  datafile: {inp.datafile or 'None'}")
    a(f"  units: {'LJ' if inp.units == UNITS_LJ else 'METAL'}")
    a(f"  atoms: {sim.natoms}")
    a(f"  system_size: [{sim.geom.prd[0]:.2f}, {sim.geom.prd[1]:.2f}, {sim.geom.prd[2]:.2f}]")
    a(f"  unit_cells: [{inp.nx}, {inp.ny}, {inp.nz}]")
    a(f"  density: {inp.rho}")
    a(f"  force_type: {'LJ' if inp.forcetype == FORCE_LJ else 'EAM'}")
    a(f"  force_params: [{inp.epsilon}, {inp.sigma}]")
    a(f"  force_cutoff: {inp.force_cut}")
    a(f"  neighbor_cutoff: {inp.neigh_cut}")
    a(f"  neighbor_bins: [{sim.geom.nb[0]}, {sim.geom.nb[1]}, {sim.geom.nb[2]}]")
    a(f"  cell_capacity: {sim.geom.capacity}")
    a(f"  neighbor_frequency: {inp.neigh_every}")
    a(f"  timestep_size: {inp.dt}")
    a(f"  thermo_frequency: {inp.thermo_nstat}")
    a("")
    a("thermodynamic_output:")
    for r in rows:
        a(f"  - {{step: {int(r[0])}, T: {r[1]:.6e}, U: {r[2]:.6e}, P: {r[3]:.6e}}}")
    a("")
    a(f"conservation_ratio: {conservation_ratio(rows):.6f}")
    if inp.forcetype == FORCE_LJ:
        engcorr, prscorr = tail_corrections(inp.rho, inp.force_cut)
        a(f"long_range_tail_corrections: {{energy: {engcorr:.6e}, "
          f"pressure: {prscorr:.6e}}}")
    a(f"lost_atoms: {lost}")
    a("")
    a("time:")
    a(f"  total: {t_total:.6f}")
    a(f"  force: {t_force:.6f}")
    a(f"  neigh: {t_neigh:.6f}")
    a(f"  comm: {t_comm:.6f}")
    a(f"  other: {t_other:.6f}")
    a("")
    a("performance:")
    if t_total > 0:
        a(f"  atom_steps_per_second: {sim.natoms * inp.ntimes / t_total:.1f}")
    a("")
    a("statistics:")
    stats = run_statistics(sim)
    if extra_stats:
        stats.update(extra_stats)
    for name, vals in stats.items():
        if isinstance(vals, dict):
            a(f"  {name}:")
            for k, vv in vals.items():
                a(f"    {k}: {vv}")
        else:
            a(f"  {name}: {vals}")
    text = "\n".join(lines) + "\n"

    if path is None:
        path = f"miniMD-{time.strftime('%Y%m%d-%H%M%S')}.yaml"
    with open(path, "w") as f:
        f.write(text)
    if screen:
        print(text)
    return path
