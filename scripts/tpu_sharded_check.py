#!/usr/bin/env python
"""Real-TPU coverage of the sharded code path: run the sharded loop
COMPILED (non-interpret) on the actual chip over a 1x1x1 mesh and assert
parity with the single-device Simulation.

The pytest multichip suite exercises the same code on the virtual CPU mesh
(interpret-mode Pallas); this script is the on-hardware complement. With
one device every halo is a periodic self-wrap, so the full sharded program
(shard_map + scan + per-device Pallas kernels + migration) compiles and
runs exactly as it would per-device on a real mesh.
"""

import pathlib
import sys

sys.path.append(str(pathlib.Path(__file__).resolve().parents[1]))

from minimd_tpu.backend import wait_for_backend  # noqa: E402

wait_for_backend()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.parallel import ShardedSimulation  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402


def check(style, size, steps, tol):
    inp = builtin_deck(style)
    inp.nx = inp.ny = inp.nz = size
    inp.thermo_nstat = 1   # thermo on every step so rows are comparable
    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:1],
                                        dtype=jnp.float32)
    sim = Simulation.from_input(inp, dtype=jnp.float32, nbins=ssim.geom.nb)
    tr_s = ssim.run(steps)
    tr_1 = sim.run(steps)
    # identical physics, different kernels/summation order: f32 noise
    # amplifies chaotically, so compare the early deterministic window.
    # All three thermo columns: T alone would not catch a sign-flipped
    # virial (P) or a broken pair-energy accumulator (U).
    for col, name in ((0, "T"), (1, "U"), (2, "P")):
        rel = (np.abs(tr_s[:30, col] - tr_1[:30, col])
               / np.abs(tr_1[:30, col]))
        print(f"{style} -s {size}: max rel {name} diff (30 steps) = "
              f"{rel.max():.2e}")
        assert rel.max() < tol, \
            f"{style} {name}: sharded/single divergence {rel.max()}"
    r0s, r01 = ssim.row0, sim._row0
    for col in (1, 2, 3):  # step-0 (T, U, P) near-exact
        assert abs(r0s[col] - r01[col]) / abs(r01[col]) < 1e-6, (r0s, r01)
    return ssim, sim


def throughput_slope(sim, a=40, b=160):
    """Matom-steps/s from the slope between two warmed run lengths (the
    bench.py methodology: cancels the per-call dispatch/fetch overhead,
    which dominates the sharded runner at small sizes over the tunnel)."""
    import time
    sim.run(a)
    sim.run(b)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); sim.run(a); ta = time.time() - t0
        t0 = time.time(); sim.run(b); tb = time.time() - t0
        best = min(best, (tb - ta) / (b - a))
    return sim.natoms / best / 1e6


def main():
    assert jax.default_backend() != "cpu", "this check needs the TPU"
    ssim, sim = check("lj", 16, 60, 1e-3)
    check("eam", 10, 60, 1e-3)
    # the mesh path must be known-FAST, not just known-correct: on one
    # chip the sharded program is the single-device program plus
    # shard_map plumbing + the migration/halo machinery. Measured on the
    # r5 toolchain (2026-08-19): ratio 1.03 at this -s 16 / nstat=1
    # config (both programs pay per-step thermo, so the sharded overhead
    # disappears into it). At the 131k bench config (nstat=100) the
    # companion first read 0.768 — that gap was the sharded constructor
    # bypassing the grid autotuner (choose_grid 19^3 vs autotuned 17^3),
    # fixed 2026-08-20; post-fix the bench companion reads 1.027
    # (bench.py's sharded_1chip_ratio carries it on the record).
    # Threshold = measured-minus-margin: a structural
    # regression — e.g. a halo exchange falling off the fused path —
    # shows up as 2x+, far below this band.
    th_s = throughput_slope(ssim)
    th_1 = throughput_slope(sim)
    print(f"throughput lj -s 16: sharded {th_s:.1f} vs single {th_1:.1f} "
          f"Matom-steps/s (ratio {th_s / th_1:.2f})")
    assert th_s > 0.80 * th_1, \
        f"sharded-on-1-chip slope {th_s:.1f} < 80% of Simulation {th_1:.1f}"
    print("PASS: sharded path compiled + ran on TPU, parity with Simulation")


if __name__ == "__main__":
    main()
