#!/usr/bin/env python
"""Same-session A/B for the candidate-pack lowering idiom
(pairgrid.PACK_SRC): "slices" (two x-axis concats materialize tile-padded
intermediates) vs "padded" (pad x once, lane-concat fusible views).

The pack is ~0.45 ms of the 864k step (STATUS.md profile) against ~0.09 ms
of raw HBM traffic — the gap is intermediate materialization in T(8,128)
tile-padded (…, 40)-minor layout, which the "padded" idiom halves.
Bit-identical values (tests/test_lj_trace.py asserts on CPU).

Run: python scripts/exp_pack.py [--n 60 --a 60 --b 180 --reps 3]
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
from minimd_tpu.ops import pairgrid  # noqa: E402
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
    # production default FIRST (the baseline wins only count same-session)
    for src in ("padded", "flat", "slices"):
        pairgrid.PACK_SRC = src
        inp = builtin_deck(args.style)
        inp.nx = inp.ny = inp.nz = args.n
        sim = Simulation.from_input(inp, dtype=jnp.float32)
        out[src] = slope(sim, args.a, args.b, args.reps)
        print(f"[{args.style} -s {args.n} pack_src={src}] "
              f"{out[src]:.2f} Matom-steps/s", flush=True)
    base = out["padded"]
    for src in ("flat", "slices"):
        print(f"--- {src} vs padded: {(out[src] / base - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
