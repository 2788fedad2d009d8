#!/usr/bin/env python
"""Measure recip="nr0" (raw VPU approx reciprocal, NO Newton step) for the
fused LJ kernel: throughput at 864k and force accuracy vs the exact
divide.

The round-3 production kernel used nr1 (one Newton step, 9.3e-7 force
error). The Newton step costs 2-3 VPU ops of the ~24 per candidate lane;
at 864k the force kernel is ~19 of the ~20.3 ms step, so nr0 is worth
~5-8% IF the kernel is ALU-bound at that op. The raw approx is ~1.6e-5
relative on 1/rsq, which propagates to ~1e-4 relative force error.

Measured 2026-08-19 (this script + run_tests): nr0 error 1.02e-4 of
force scale, +6.4% at 864k (45.39 vs 42.67 Matom-steps/s), and PASSES
the reference's statistical acceptance criterion at 4k/10000 steps
(T 0.208, E 0.228, P 0.198 of the 0.38 budget), 32k/2000 and 108k/2000
— nr0 is now the TPU production default (ops/lj_pallas.py).

Run: python scripts/exp_nr0.py
"""

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
import numpy as np  # noqa: E402

from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.ops.lj import LJParams  # noqa: E402
from minimd_tpu.ops.lj_pallas import make_lj_force_pallas  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402


def build(n):
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = n
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    params = LJParams.from_deck(4, inp.epsilon, inp.sigma, inp.force_cut)
    return sim, params


def slope(sim, a, b, reps=3):
    sim.run(a)
    sim.run(b)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); sim.run(a); ta = time.time() - t0
        t0 = time.time(); sim.run(b); tb = time.time() - t0
        best = min(best, (tb - ta) / (b - a))
    return sim.natoms / best / 1e6


def main():
    # accuracy first, at 131k (cheap compiles)
    sim, params = build(32)
    sim.run(40)   # a melted state, not the symmetric lattice
    x, typ = sim.state.x, sim.state.typ
    fs = {}
    for recip in ("div", "nr1", "nr0"):
        ev, _ = make_lj_force_pallas(sim.geom, params, recip=recip)
        fs[recip] = np.asarray(jax.jit(ev)(x, typ)[0])
    ref = fs["div"]
    scale = np.abs(ref).max()
    for recip in ("nr1", "nr0"):
        err = np.abs(fs[recip] - ref).max() / scale
        print(f"{recip}: max |f - f_div| / max|f| = {err:.2e}", flush=True)

    # throughput at 864k: today's nr1 baseline, then nr0
    sim864, params864 = build(60)
    th1 = slope(sim864, 60, 180)
    print(f"864k nr1 (production): {th1:.2f} Matom-steps/s", flush=True)

    sim864.force_fn, sim864.force_fn_noev = make_lj_force_pallas(
        sim864.geom, params864, recip="nr0")
    sim864._jit_cache.clear()
    th0 = slope(sim864, 60, 180)
    print(f"864k nr0             : {th0:.2f} Matom-steps/s", flush=True)
    print(f"nr0/nr1 throughput ratio: {th0 / th1:.3f}")


if __name__ == "__main__":
    main()
