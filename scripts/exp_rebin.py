#!/usr/bin/env python
"""Same-session A/B for the rebin kernel structure (rebin_pallas.SLAB):
the per-(z, y)-row pull kernel re-fetches every channel row from HBM nine
times (once per (dz, dy) view) and materializes halo-padded grids for all
8 channels in XLA — ~10.8 ms per call at 864k (7.5 kernel + ~3.3 XLA,
STATUS.md r5 profile), i.e. ~0.54 ms/step amortized at the every=20
cadence. The z-slab kernel holds all y rows of three z-slabs in VMEM
(re-fetch factor 3, y stencil walks VMEM) and wraps z/y in index maps /
in-kernel row indices instead of materialized halos.

Bit-identical output (tests/test_cells.py asserts both kernels against
cells.rebin_local).

Run: python scripts/exp_rebin.py [--n 60 --a 60 --b 180 --reps 3]
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
from minimd_tpu.ops import rebin_pallas  # noqa: E402
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--a", type=int, default=60)
    ap.add_argument("--b", type=int, default=180)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--style", default="lj", choices=["lj", "eam"])
    args = ap.parse_args()

    out = {}
    # row kernel (the incumbent) FIRST: wins only count same-session
    for slab in (False, True):
        rebin_pallas.SLAB = slab
        inp = builtin_deck(args.style)
        inp.nx = inp.ny = inp.nz = args.n
        sim = Simulation.from_input(inp, dtype=jnp.float32)
        out[slab] = slope(sim, args.a, args.b, args.reps)
        print(f"[{args.style} -s {args.n} slab={slab}] "
              f"{out[slab]:.2f} Matom-steps/s", flush=True)
    print(f"--- slab vs row: {(out[True] / out[False] - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
