#!/usr/bin/env python
"""Same-session A/B for sim.TRIPLE_CARRY: carry x/v/f through the
plain-step scan as 3-tuples of flat (M,) arrays instead of one (3, M)
array. A (3, M) f32 carry tiles T(8,128) with the 3-row sublane dim
padded to 8, so every kick/drift pass moves ~2.7x the bytes; dense (M,)
carries remove that. Claimed bit-identical (same elementwise ops per
coordinate slice; tests assert it on CPU).

Also re-probes the committed glue flags (NOEV_FASTPATH / OUT_STACK) at
131k: the r4 bench showed 864k +1.4% but 131k read 50.57 vs the 52.8-52.9
measured before the flags landed — same-session A/B decides whether that
is a real small-size regression or tunnel drift.

Run: python scripts/exp_carry.py [--n 60 --a 60 --b 180 --reps 3]
     combos are (noev, ostack, triple) flag triples.
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


def measure(style, n, noev, ostack, triple, a, b, reps):
    sim_mod.NOEV_FASTPATH = noev
    sim_mod.TRIPLE_CARRY = triple
    lj_pallas.OUT_STACK = ostack
    inp = builtin_deck(style)
    inp.nx = inp.ny = inp.nz = n
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    th = slope(sim, a, b, reps)
    print(f"[{style} -s {n} noev={int(noev)} ostack={int(ostack)} "
          f"triple={int(triple)}] {th:.2f} Matom-steps/s", flush=True)
    return th


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--style", default="lj")
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--a", type=int, default=60)
    ap.add_argument("--b", type=int, default=180)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--combos", nargs="*",
                    default=["110", "111"],
                    help="noev/ostack/triple bit triples, e.g. 110 111 000")
    args = ap.parse_args()

    out = {}
    for combo in args.combos:
        noev, ostack, triple = (c == "1" for c in combo)
        out[combo] = measure(args.style, args.n, noev, ostack, triple,
                             args.a, args.b, args.reps)
    base = out[args.combos[0]]
    print("--- summary (same session) ---")
    for k, v in out.items():
        print(f"noev/ostack/triple={k}: {v:.2f} M "
              f"({(v / base - 1) * 100:+.1f}% vs first combo)")


if __name__ == "__main__":
    main()
