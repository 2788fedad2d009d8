#!/usr/bin/env python
"""Candidate-lane efficiency experiment: measure alternative (grid,
capacity) choices against the autotuner's pick on the real chip.

Background: the fused kernels pay 9 stencil rows x 128 candidate lanes per
i-SLOT per step, so per-atom cost is proportional to C / mean_occupancy
(slot utilization) — the structural "~7% useful lanes" ceiling VERDICT r3
flags. The autotuner's cost model (cells.autotune_grid) already minimizes
ncells * C * LANE; this experiment measures whether the model's optimum is
the real optimum, and in particular the VERDICT-suggested C=32-targeted
grids (4C == 128).

Static analysis first (cells.py cost model, CPU, exact):
  LJ 131k  autotuned nb=17^3 C=40: mean occ 26.7 -> 67% slot utilization.
    nb=19^3 C=32 (the 4C=128 grid): util 19.1/32 = 60% -> ~12% MORE work.
    nb=18^3 C=40: util 22.5/40 = 56%; C=32 unsafe (liquid max ~33.7).
    nb=17^3 C=32/36: unsafe — liquid running max ~39 overflows C<40
    (and C=36 computes as C=40: sublane tiles are 8 deep).
  The t=0 FCC crystal has a 32-atom cell on EVERY candidate grid
  (t0max=32 at fracs 1.0..0.85), so base+4 headroom pins C >= 36 -> 40.
  EAM 131k nb=16^3 is lattice-commensurate (32 atoms/cell exactly, 80%
    util); C=32 would be 0-headroom against boundary-plane hops.

This script measures the interesting rows anyway (the round-3 lesson:
op-count models overestimate — measure, don't count).

Run: python scripts/exp_lanes.py [--style lj --n 32]
"""

import argparse
import pathlib
import sys
import time

sys.path.append(str(pathlib.Path(__file__).resolve().parents[1]))

from minimd_tpu.backend import wait_for_backend  # noqa: E402

wait_for_backend()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402

from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402


def slope(sim, a, b, reps=3):
    sim.run(a)
    sim.run(b)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); sim.run(a); ta = time.time() - t0
        t0 = time.time(); sim.run(b); tb = time.time() - t0
        best = min(best, (tb - ta) / (b - a))
    return sim.natoms / best / 1e6


def measure(style, n, nbins, capacity, a=100, b=300):
    inp = builtin_deck(style)
    inp.nx = inp.ny = inp.nz = n
    sim = Simulation.from_input(inp, dtype=jnp.float32, nbins=nbins,
                                capacity=capacity)
    tag = f"{style} -s {n} nbins={nbins or 'auto'} C={capacity or 'auto'}"
    print(f"[{tag}] grid={sim.geom.nb} C={sim.geom.capacity} "
          f"util={sim.natoms / sim.geom.nslots:.0%}", flush=True)
    th = slope(sim, a, b)
    grew = sim.geom.capacity != (capacity or sim.geom.capacity)
    print(f"[{tag}] {th:.2f} Matom-steps/s"
          + (f"  (OVERFLOWED -> regrown to C={sim.geom.capacity})"
             if grew or sim._regrows else ""), flush=True)
    return th


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--style", default="lj")
    ap.add_argument("--n", type=int, default=32)
    args = ap.parse_args()

    if args.style == "lj" and args.n == 60:
        # 864k rows: the autotuned 33^3 C=40 pays 1.437M slots x 9 x 128
        # lanes; C=32 grids cut slots 4.5-12.5% (same 128-lane rows,
        # 3C=96+pad) IF the liquid never pushes a cell past 32 (t=0 FCC
        # max is exactly 32 on every grid — zero headroom; overflow
        # regrows to C=40 and the row reports it)
        rows = [
            (None, None),          # autotuned: nb=33^3 C=40
            ((35, 35, 35), 32),    # mean occ 20.2: -4.5% slots
            ((34, 34, 34), 32),    # mean occ 22.0: -12.5% slots
            ((34, 34, 34), None),  # finer grid at the safe capacity
        ]
    elif args.style == "lj":
        rows = [
            (None, None),        # autotuned: nb=17^3 C=40 at -s 32
            ((19, 19, 19), 32),  # the 4C=128 VERDICT suggestion
            ((18, 18, 18), 40),  # intermediate grid, model says worse
            ((19, 19, 19), 40),  # frac-1.0 grid at safe capacity
        ]
    else:
        rows = [
            (None, None),        # autotuned: nb=16^3 C=40 (commensurate)
            ((16, 16, 16), 32),  # 0-headroom: expect overflow or a win
            ((18, 18, 18), 40),  # incommensurate finer grid
        ]
    for nbins, cap in rows:
        measure(args.style, args.n, nbins, cap)


if __name__ == "__main__":
    main()
