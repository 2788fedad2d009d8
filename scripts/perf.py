#!/usr/bin/env python
"""TPU throughput measurement for any builtin deck and size.

Slope-of-two-scan-lengths methodology (see bench.py / CLAUDE.md): warm both
scan lengths, then time each once; the difference cancels per-call dispatch
overhead and defeats the axon result cache (state evolves between calls).
"""

import argparse
import pathlib
import sys
import time

# append (don't prepend) the repo root: prepending shadows a module the
# axon TPU plugin imports (plain PYTHONPATH=/root/repo breaks device init)
sys.path.append(str(pathlib.Path(__file__).resolve().parents[1]))

from minimd_tpu.backend import wait_for_backend  # noqa: E402

wait_for_backend()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402

from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--style", choices=["lj", "eam"], default="eam")
    ap.add_argument("--n", type=int, default=32, help="FCC cells per side")
    ap.add_argument("--steps", type=int, nargs=2, default=(100, 300))
    args = ap.parse_args()

    inp = builtin_deck(args.style)
    inp.nx = inp.ny = inp.nz = args.n
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    natoms = sim.natoms
    print(f"natoms={natoms} grid={sim.geom.nb} C={sim.geom.capacity}")

    a, b = args.steps
    sim.run(a)
    sim.run(b)
    t0 = time.time(); sim.run(a); ta = time.time() - t0
    t0 = time.time(); sim.run(b); tb = time.time() - t0
    per_step = (tb - ta) / (b - a)
    print(f"per_step={per_step*1e3:.3f} ms  "
          f"throughput={natoms/per_step/1e6:.2f} Matom_steps/s  "
          f"overflow={int(sim.state.overflow)}")


if __name__ == "__main__":
    main()
