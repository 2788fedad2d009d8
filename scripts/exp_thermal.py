#!/usr/bin/env python
"""Disentangle chip-state variance from code: measure the LJ 131k slope,
soak the chip with the 864k config, then re-measure 131k.

Motivation: identical builds measure 56-58 Matom-steps/s at 131k in some
sessions and ~52 in others (and 48 vs 42.8 at 864k) with zero code delta
— the round-3 driver bench even recorded a FAST 131k (56.4) and a SLOW
864k (42.7) in one invocation, in that order. If the second 131k reading
here drops to the slow band, the chip down-clocks under sustained load
(thermal or power capping) and every long benchmark under-reads relative
to a cold chip; bench ordering and pacing then matter as much as code.

Run: python scripts/exp_thermal.py
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

from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402


def build(style, n):
    inp = builtin_deck(style)
    inp.nx = inp.ny = inp.nz = n
    return Simulation.from_input(inp, dtype=jnp.float32)


def slope(sim, a, b, reps=3, tag=""):
    sim.run(a)
    sim.run(b)
    best = float("inf")
    for i in range(reps):
        t0 = time.time(); sim.run(a); ta = time.time() - t0
        t0 = time.time(); sim.run(b); tb = time.time() - t0
        s = (tb - ta) / (b - a)
        best = min(best, s)
        print(f"  [{tag}] rep {i}: {sim.natoms / s / 1e6:.2f} M", flush=True)
    return sim.natoms / best / 1e6


def main():
    s131 = build("lj", 32)
    s864 = build("lj", 60)

    th0 = slope(s131, 100, 300, tag="131k cold")
    print(f"131k cold : {th0:.2f} Matom-steps/s", flush=True)

    t0 = time.time()
    s864.run(600)                      # ~12 s of sustained 864k load
    float(s864.state.x[0, 0])          # sync
    print(f"soak: 600 steps of 864k in {time.time() - t0:.1f} s",
          flush=True)
    th864 = slope(s864, 60, 180, tag="864k hot")
    print(f"864k hot  : {th864:.2f} Matom-steps/s", flush=True)

    th1 = slope(s131, 100, 300, tag="131k hot")
    print(f"131k hot  : {th1:.2f} Matom-steps/s", flush=True)

    print("pause 60 s (cool-down)", flush=True)
    time.sleep(60)
    th2 = slope(s131, 100, 300, reps=1, tag="131k rest")
    print(f"131k rest : {th2:.2f} Matom-steps/s", flush=True)

    print(f"\ncold {th0:.2f} -> hot {th1:.2f} -> rested {th2:.2f} "
          f"(hot/cold {th1 / th0:.3f})")


if __name__ == "__main__":
    main()
