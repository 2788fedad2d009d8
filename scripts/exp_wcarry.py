#!/usr/bin/env python
"""Same-session A/B for sim.W_CARRY (half-kick velocity carry).

The aligned plain-step body currently runs three elementwise passes per
step around the force kernel: kick1+drift (one XLA fusion), then kick2
after the force. W_CARRY carries w = v + dtf*f instead of v, merging
step n's kick2 with step n+1's kick1 — the same two sequential adds —
into one fused pass `(w + dtf*f) + dtf*f`, saving one (3, M) read+write
per plain step. NOT bit-identical — XLA's FMA contraction rounds the
merged pair differently (~1 ulp/kick-pair; tests/test_lj_trace.py bounds
the drift on CPU) — so a default flip would need the reference's
trajectory acceptance criterion, like recip=nr0.

Run: python scripts/exp_wcarry.py [--n 60 --a 60 --b 180 --reps 3]
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
    for wc in (False, True):   # baseline FIRST (CLAUDE.md)
        sim_mod.W_CARRY = wc
        inp = builtin_deck(args.style)
        inp.nx = inp.ny = inp.nz = args.n
        sim = Simulation.from_input(inp, dtype=jnp.float32)
        out[wc] = slope(sim, args.a, args.b, args.reps)
        print(f"[{args.style} -s {args.n} w_carry={int(wc)}] "
              f"{out[wc]:.2f} Matom-steps/s", flush=True)
    print(f"--- w_carry vs base: {(out[True] / out[False] - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
