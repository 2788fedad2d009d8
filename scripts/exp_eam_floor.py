#!/usr/bin/env python
"""Empirical cost split of the EAM Pallas step: pair GEOMETRY vs pair-table
EVALUATION, per pass.

VERDICT r3 item 2 asks the rho/force passes to stop computing pair geometry
(d, rsq, sqrt, mask — 9 stencil rows x all candidate lanes) twice, citing it
as "the next sizeable lever". The structural analysis (STATUS.md round 4)
shows every dedup transport is blocked:

  - VMEM ring cache: force(z, y) may only run after rho(z+1, y+1) (its fp_j
    halo needs those densities), a pipeline delay of nby+1 programs;
    caching even ONE f32 field (r) for the 9 stencil rows costs
    9*nbx*C*LANE*4 B/row (= 2.95 MB at the 131k EAM grid) x 17 rows in
    flight = 50 MB, x2 fields = 100 MB — at/over the usable VMEM budget
    before the kernel's own slabs.
  - HBM materialization: 9*(nbx*C*LANE)*4 B x nbz*nby rows = 1.2 GB per
    field per step at 131k — ~3 ms of HBM bandwidth to save ~1 ms of
    recompute.

This script pins the actual recompute cost on the chip by swapping
eval_pair_fns for a zero passthrough (per call site: the rho pass evaluates
("R",), the force pass ("G1","G2")), leaving everything else — packing,
geometry, masks, reductions, embedding, fp halo, the full production loop —
identical. Measured through Simulation.run with the bench.py slope
methodology (a bare force-kernel scan is the known TPU-worker-crash config,
CLAUDE.md).

  full     : production step            (geometry x2 + evals)
  no_G     : force's G1+G2 skipped      (isolates the force-pass evals)
  no_eval  : both skipped               -> geometry+reduce+glue floor

(A separate no_R row is NOT runnable: with rho = 0 the embedding
derivative fp = F'(0) is garbage while G1/G2 still fire, so forces
explode and the rebin overflows — measured, capacity regrow 40 -> 50.
It is also redundant: R cost == no_G - no_eval, G cost == full - no_G.
The three runnable rows are all force-free or equilibrium-frozen.)

geometry-dedup headroom <= (no_eval - glue) / 2 — an upper bound on what
any fused kernel could recover.

Run: python scripts/exp_eam_floor.py [--n 32]
"""

import argparse
import contextlib
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
from minimd_tpu.ops import eam_pallas  # noqa: E402
from minimd_tpu.ops.eam_grid import eval_pair_fns  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402


@contextlib.contextmanager
def skipped_evals(skip):
    """Replace the pair evals in `skip` with r*0 (zero forces keep the
    production loop's rebins sane; the Horner work disappears, every other
    op — including all downstream consumers — stays in the program)."""
    def fake_eval(r, polys, names):
        if skip and all(n in skip for n in names):
            return {n: r * 0.0 for n in names}
        return eval_pair_fns(r, polys, names)

    orig = eam_pallas.eval_pair_fns
    eam_pallas.eval_pair_fns = fake_eval
    try:
        yield
    finally:
        eam_pallas.eval_pair_fns = orig


def slope_run(sim, a=100, b=300, reps=3):
    sim.run(a)
    sim.run(b)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); sim.run(a); ta = time.time() - t0
        t0 = time.time(); sim.run(b); tb = time.time() - t0
        best = min(best, (tb - ta) / (b - a))
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    args = ap.parse_args()

    inp = builtin_deck("eam")
    inp.nx = inp.ny = inp.nz = args.n
    # Near-zero initial temperature: zeroed evals mean zero forces, and a
    # thermal system in free flight CLUSTERS (measured: capacity regrow
    # 40 -> 77 mid-run, which invalidates the cost comparison). The Cu FCC
    # lattice sits at its equilibrium spacing, so with ~zero velocities
    # every variant — including `full` — runs the same near-frozen,
    # lattice-commensurate trajectory at identical occupancy. The scan
    # carry still evolves bit-by-bit each step (x += v*dt with v ~ 1e-9
    # of thermal), so the axon result cache can't serve repeats.
    inp.t_request = 1e-18

    rows = [
        ("full", ()),
        ("no_G", ("G1", "G2")),
        ("no_eval", ("R", "G1", "G2", "P")),
    ]
    out = {}
    for tag, skip in rows:
        with skipped_evals(skip):
            sim = Simulation.from_input(inp, dtype=jnp.float32)
            if tag == "full":
                print(f"natoms={sim.natoms} grid={sim.geom.nb} "
                      f"C={sim.geom.capacity}", flush=True)
            ms = slope_run(sim)  # traces (and compiles) under the patch
        out[tag] = ms
        print(f"{tag:8s}: {ms:7.3f} ms/step  (end capacity "
              f"{sim.geom.capacity})", flush=True)

    print(f"\nR eval (rho pass)     : {out['no_G'] - out['no_eval']:.3f} ms")
    print(f"G1+G2 evals (force)   : {out['full'] - out['no_G']:.3f} ms")
    print(f"geometry+reduce+glue floor: {out['no_eval']:.3f} ms")
    print(f"=> geometry-dedup headroom <= {out['no_eval'] / 2:.3f} ms "
          f"of the {out['full']:.3f} ms step "
          f"({out['no_eval'] / 2 / out['full']:.0%})")


if __name__ == "__main__":
    main()
