#!/usr/bin/env python
"""miniMD-tpu headline benchmark.

Runs the reference deck (in.lj.miniMD: 32^3 FCC cells = 131,072 atoms,
rho=0.8442, rc=2.5+0.3 skin, reneigh every 20) on the available accelerator
and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "Matom_steps_per_sec", "vs_baseline": N}

Baseline: 23.67 Matom-steps/s — the reference's README number for a 2x16-core
CPU node (BASELINE.md); the session target is >=2x that per chip.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402

from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402

BASELINE_MATOM_STEPS = 23.67  # README.md:286-288 (864k atoms, 2 MPI x 16 OMP)


def main():
    steps_a, steps_b = 100, 300

    inp = builtin_deck("lj")
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    natoms = sim.natoms

    # compile + warm BOTH scan lengths (each ntimes compiles its own scan)
    sim.run(steps_a)
    sim.run(steps_b)

    t0 = time.time()
    sim.run(steps_a)
    ta = time.time() - t0
    t0 = time.time()
    sim.run(steps_b)
    tb = time.time() - t0
    # slope removes per-call dispatch overhead (and defeats any RPC caching:
    # the state evolves between calls)
    per_step = (tb - ta) / (steps_b - steps_a)
    matom_steps = natoms / per_step / 1e6

    if int(sim.state.overflow) != 0:
        print(json.dumps({"error": "cell overflow — physics invalid"}))
        sys.exit(1)

    print(json.dumps({
        "metric": "lj_131k_throughput",
        "value": round(matom_steps, 2),
        "unit": "Matom_steps_per_sec",
        "vs_baseline": round(matom_steps / BASELINE_MATOM_STEPS, 3),
    }))


if __name__ == "__main__":
    main()
