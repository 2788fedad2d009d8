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
    # amplifies chaotically, so compare the early deterministic window
    rel = np.abs(tr_s[:30, 0] - tr_1[:30, 0]) / np.abs(tr_1[:30, 0])
    print(f"{style} -s {size}: max rel T diff (30 steps) = {rel.max():.2e}")
    assert rel.max() < tol, f"{style}: sharded/single divergence {rel.max()}"
    r0s, r01 = ssim.row0, sim._row0
    assert abs(r0s[2] - r01[2]) / abs(r01[2]) < 1e-6, (r0s, r01)
    return True


def main():
    assert jax.default_backend() != "cpu", "this check needs the TPU"
    check("lj", 16, 60, 1e-3)
    check("eam", 10, 60, 1e-3)
    print("PASS: sharded path compiled + ran on TPU, parity with Simulation")


if __name__ == "__main__":
    main()
