#!/usr/bin/env python
"""Measure xi_src="pack" (own-row coordinates sliced from the candidate
pack's center lanes) vs the default xi_src="grid" (separate raw-grid
inputs) for the fused LJ/EAM Pallas kernels.

What "pack" changes: the three raw (nbz, nby, nbx, C) coordinate grids
(and for EAM the own-fp grid) stop being pallas inputs, so XLA no longer
materializes them in HBM — the flat->grid reshape fuses into the J-pack
concat. Saved per step: 3 grid writes at T(8,128) padding (a C=40-minor
array is 3.2x bytes) + the narrow (nbx, C) xi DMAs per program. Cost: one
static lane-offset slice per coordinate per program (a vreg rotate).

Both variants are bit-identical (interpret-mode parity asserted in
tests); this script pins the throughput question on the chip.

Run: python scripts/exp_xi_pack.py [--style lj --n 32]
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

from minimd_tpu.config import FORCE_LJ, builtin_deck  # noqa: E402
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


def measure(style, n, xi_src, a=100, b=300):
    inp = builtin_deck(style)
    inp.nx = inp.ny = inp.nz = n
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    if xi_src == "pack":
        # rebuild the force closures with the experimental layout
        if inp.forcetype == FORCE_LJ:
            from minimd_tpu.ops.lj import LJParams
            from minimd_tpu.ops.lj_pallas import make_lj_force_pallas
            params = LJParams.from_deck(4, inp.epsilon, inp.sigma,
                                        inp.force_cut)
            sim.force_fn, sim.force_fn_noev = make_lj_force_pallas(
                sim.geom, params, xi_src="pack")
        else:
            from minimd_tpu.ops.eam import EAMTables
            from minimd_tpu.ops.eam_pallas import make_eam_force_pallas
            tables = EAMTables.from_funcfl(None)
            sim.force_fn, sim.force_fn_noev = make_eam_force_pallas(
                sim.geom, tables, xi_src="pack")
        sim._jit_cache.clear()
    th = slope(sim, a, b)
    print(f"[{style} -s {n} xi_src={xi_src}] {th:.2f} Matom-steps/s",
          flush=True)
    return th


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--style", default="lj")
    ap.add_argument("--n", type=int, default=32)
    args = ap.parse_args()
    g = measure(args.style, args.n, "grid")
    p = measure(args.style, args.n, "pack")
    print(f"pack/grid throughput ratio: {p / g:.3f}")


if __name__ == "__main__":
    main()
