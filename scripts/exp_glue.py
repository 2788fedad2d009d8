#!/usr/bin/env python
"""Same-session A/B for the two step-glue removals:

- sim.NOEV_FASTPATH: when the thermo cadence is a multiple of the
  reneighbor cadence, interval plain steps are STATICALLY non-thermo —
  call force_noev directly instead of the traced-predicate lax.cond
  (saves the cond's (3, M) operand marshaling per plain step).
- lj_pallas.OUT_STACK: relayout the kernel's (3, nbz, nby, nbx, C)
  force output to flat (3, M) as three per-coordinate reshapes + stack
  instead of one grid->flat reshape whose major dim crosses the
  relayout (XLA lowers that as a 3-iteration dynamic-update-slice
  while loop).

Both are claimed bit-identical (same ops, same order, different
lowering); tests assert that on CPU. This script pins throughput on the
chip at 864k (and optionally 131k), building all four flag combos in
ONE process so the numbers share a session baseline (CLAUDE.md:
cross-session deltas are toolchain noise).

Run: python scripts/exp_glue.py [--n 60 --a 60 --b 180 --reps 3]
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

from minimd_tpu import sim as sim_mod  # noqa: E402
from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.ops import lj_pallas  # noqa: E402
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


def measure(n, noev, ostack, a, b, reps):
    sim_mod.NOEV_FASTPATH = noev
    lj_pallas.OUT_STACK = ostack
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = n
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    th = slope(sim, a, b, reps)
    print(f"[lj -s {n} noev_fastpath={int(noev)} out_stack={int(ostack)}] "
          f"{th:.2f} Matom-steps/s", flush=True)
    return th


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--a", type=int, default=60)
    ap.add_argument("--b", type=int, default=180)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    combos = [(False, False), (True, False), (False, True), (True, True)]
    out = {}
    for noev, ostack in combos:
        out[(noev, ostack)] = measure(args.n, noev, ostack,
                                      args.a, args.b, args.reps)
    base = out[(False, False)]
    print("--- summary (same session) ---")
    for k, v in out.items():
        print(f"noev={int(k[0])} ostack={int(k[1])}: {v:.2f} M "
              f"({(v / base - 1) * 100:+.1f}% vs baseline)")


if __name__ == "__main__":
    main()
