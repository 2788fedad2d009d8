#!/usr/bin/env python
"""Measure the experimental fused-STEP LJ kernel (ops/lj_step_pallas.py)
against the production plain step on the chip.

The fused step folds the kick/drift/J-pack XLA glue (~1 ms of the 19 ms
864k step, ~0.25 ms at 131k) into the force kernel. Two questions only
hardware can answer:

1. Does Mosaic accept (and not pessimize) the epilogue re-pack — sublane
   rolls feeding a lane concat? (The r3 PROLOGUE-pack negative was this
   pattern 9x per program per step; the epilogue writes each row once.)
2. Net ms/step vs the production loop at the same size.

Method: the production baseline is Simulation.run's slope (the full
loop, including amortized rebin); the fused number is a lax.scan of
step_noev with an evolving carry (no rebin — the fused loop replaces
only the 19 plain steps of each 20-step interval, so its per-step cost
is directly comparable to the plain-step cost, and the production win
is (plain - fused) * 19/20). A short on-chip sanity check (one ev step:
finite eng/vir, drift bounded by dt*v) guards against a silent Mosaic
miscompile before timing.

CAUTION (CLAUDE.md): a rebin-free force scan at 864k crashed the TPU
worker twice in r2 — default is the 131k deck; pass --n 60 only if you
accept that risk, or --wired_only to skip the rebin-free scan and take
just the production plain-vs-fused A/B (rebin included — the safe 864k
measurement VERDICT r4 weak #3 asks for).
Run: python scripts/exp_fused_step.py [--n 32] [--wired_only]
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
import numpy as np  # noqa: E402

from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.ops.lj import LJParams  # noqa: E402
from minimd_tpu.ops.lj_step_pallas import make_lj_step_pallas  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402


def slope(fn, state, a=100, b=300, reps=3):
    """bench.py methodology: evolving-carry scans, slope between two
    lengths, both warmed, best of reps."""
    fa, fb = fn(a), fn(b)
    ra = fa(state); jax.block_until_ready(ra)
    rb = fb(state); jax.block_until_ready(rb)
    float(np.asarray(jax.device_get(ra[1])))   # force a fetch: sync
    float(np.asarray(jax.device_get(rb[1])))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); r = fa(state); float(np.asarray(jax.device_get(r[1]))); ta = time.time() - t0
        t0 = time.time(); r = fb(state); float(np.asarray(jax.device_get(r[1]))); tb = time.time() - t0
        best = min(best, (tb - ta) / (b - a))
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--wired_only", action="store_true",
                    help="skip the rebin-free scan (worker-crash risk at "
                         "864k); measure only plain vs fused through the "
                         "production run() loop")
    args = ap.parse_args()

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = args.n
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    print(f"natoms={sim.natoms} grid={sim.geom.nb} C={sim.geom.capacity}",
          flush=True)

    # production baseline: full loop slope (includes amortized rebin)
    sim.run(100); sim.run(300)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); sim.run(100); ta = time.time() - t0
        t0 = time.time(); sim.run(300); tb = time.time() - t0
        best = min(best, (tb - ta) / 200)
    plain_ms = best * 1e3
    print(f"plain (production run): {plain_ms:7.3f} ms/step", flush=True)

    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)
    for pack_mode in () if args.wired_only else ("store", "concat"):
        s_ev, s_noev, seed = make_lj_step_pallas(
            sim.geom, params, float(inp.dt), sim.dtforce,
            pack_mode=pack_mode)

        # on-chip sanity: one ev step from the current production state
        x, v, f = sim.state.x, sim.state.v, sim.state.f
        try:
            J, xg, wg = jax.jit(seed)(x, v, f)
            J1, xg1, wg1, eng, vir, vsq = jax.jit(s_ev)(J, xg, wg)
            eng, vir, vsq = float(eng), float(vir), float(vsq)
        except Exception as e:   # Mosaic rejection is a result, not a crash
            print(f"[{pack_mode}] REJECTED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"[{pack_mode}] sanity ev step: eng={eng:.6f} vir={vir:.6f} "
              f"vsq={vsq:.3f}", flush=True)
        assert np.isfinite([eng, vir, vsq]).all()
        nbx, nby, nbz = sim.geom.nb
        C = sim.geom.capacity
        M = nbx * nby * nbz * C
        x1 = np.stack([np.asarray(xg1[c]).reshape(M) for c in range(3)])
        x0 = np.asarray(x)
        valid = np.asarray(sim.state.valid)
        dmax = np.abs(x1[:, valid] - x0[:, valid]).max()
        print(f"[{pack_mode}] sanity drift: max |dx| = {dmax:.3e}",
              flush=True)
        assert dmax < 0.2, "fused step moved an atom implausibly far"

        def make_scan(k, s_noev=s_noev):
            def run(carry):
                def body(c, _):
                    J, xg, wg = c
                    J, xg, wg, _e, _v, _q = s_noev(J, xg, wg)
                    return (J, xg, wg), jnp.zeros((), jnp.float32)
                (J, xg, wg), _ = jax.lax.scan(body, carry, None, length=k)
                # return a tiny fetchable so the slope helper can sync
                return J, xg[0][0, 0, 0, 0]
            return jax.jit(run)

        fused_ms = slope(make_scan, (J, xg, wg))
        print(f"[{pack_mode}] fused step (scan): {fused_ms:7.3f} ms/step  "
              f"(vs plain {plain_ms:7.3f}; glue recovered "
              f"{plain_ms - fused_ms:+.3f} ms/step)", flush=True)

    # the decision number: the WIRED production loop (rebins included)
    simf = Simulation.from_input(inp, dtype=jnp.float32, fused_step=True)
    simf.run(100); simf.run(300)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); simf.run(100); ta = time.time() - t0
        t0 = time.time(); simf.run(300); tb = time.time() - t0
        best = min(best, (tb - ta) / 200)
    print(f"fused production run  : {best * 1e3:7.3f} ms/step "
          f"(plain {plain_ms:7.3f})", flush=True)


if __name__ == "__main__":
    main()
