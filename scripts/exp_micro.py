#!/usr/bin/env python
"""Pinned micro-kernels for cross-session toolchain/chip drift attribution.

The r3->r4 compile-cache wipe cost ~10% on every production kernel with
unchanged source (STATUS.md); exp_thermal.py disproved throttling, but
"codegen or the assigned chip's clock changed" was never split. These two
probes are small enough that their compiled form cannot meaningfully
change between toolchains, so their slopes attribute the drift:

  fma   a trace-time-unrolled 24-deep FMA chain over a (256, 128) f32
        block, grid=(G,) programs — pure VPU issue rate. 24 matches the
        LJ body's ~22 effective ops/candidate-lane (ops/lj_pallas.py).
  copy  y = x + 1.0 over the same blocks — HBM read+write bandwidth.

Attribution table (vs the previous session's STATUS entry):
  fma moved, copy moved      -> chip/clock (or assigned-chip change)
  fma stable, production moved -> codegen of the BIG kernels (Mosaic
                                  scheduling/layout), not clock
  copy moved only            -> HBM/DMA path

Method: bench.py slope methodology — in-kernel fori_loop repetition count
is the scan length; slope between two counts, both warmed, best of 3.

Run: python scripts/exp_micro.py [--interpret]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.append(str(pathlib.Path(__file__).resolve().parents[1]))

ap = argparse.ArgumentParser()
ap.add_argument("--interpret", action="store_true",
                help="CPU interpret smoke test (no timing validity)")
args = ap.parse_args()

if args.interpret:
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    from minimd_tpu.backend import wait_for_backend
    wait_for_backend()
    import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SUB, LANE = 256, 128     # (256, 128) f32 block = 32 sublane tiles: enough
G = 64                   # independent vreg ops to hide FMA latency
DEPTH = 24               # unrolled FMA chain depth per loop iteration


def make_fma(reps: int):
    def kernel(x_ref, o_ref):
        def body(_, y):
            for _ in range(DEPTH):
                y = y * 1.000001 + 1e-7
            return y
        o_ref[...] = jax.lax.fori_loop(0, reps, body, x_ref[...])

    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * SUB, LANE), jnp.float32),
        interpret=args.interpret,
    )


CB = 512  # copy-probe blocks: 512 x (256, 128) f32 = 64 MB resident


def make_copy(reps: int):
    # y = x + 1 over CB blocks, swept `reps` times (major grid dim), so
    # the slope over reps isolates pure HBM read+write traffic (each
    # grid step re-fetches its input block and flushes its output block
    # — consecutive steps touch different blocks, so Mosaic cannot keep
    # them resident). One rep moves 2 * 64 MB; the slope contrast must
    # dwarf the ~0.5 ms axon-tunnel per-call noise, which a single-pass
    # size sweep does not (measured: negative slopes).
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    return pl.pallas_call(
        kernel,
        grid=(reps, CB),
        in_specs=[pl.BlockSpec((SUB, LANE), lambda r, i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, LANE), lambda r, i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CB * SUB, LANE), jnp.float32),
        interpret=args.interpret,
    )


def slope(make, a, b, x0, fetch, reps=5):
    # EVOLVING carry: each call consumes the previous call's output —
    # identical-input repeats are served from the axon result cache
    # (CLAUDE.md) and time at ~0 (measured: a cached run reported
    # 19 TB/s "HBM bandwidth"). MEDIAN of slopes, not min: a tunnel
    # hiccup inflating the SHORT leg fabricates an impossibly fast
    # slope, and min selects exactly those (measured: 6 TFMA/s); the
    # legs are also sized ~50-150 ms (see callers) so a ~10 ms hiccup
    # cannot dominate either one.
    fa, fb = jax.jit(make(a)), jax.jit(make(b))
    x = fa(x0); fetch(x)
    x = fb(x); fetch(x)
    ss = []
    for _ in range(reps):
        t0 = time.time(); x = fa(x); fetch(x); ta = time.time() - t0
        t0 = time.time(); x = fb(x); fetch(x); tb = time.time() - t0
        ss.append((tb - ta) / (b - a))
    ss.sort()
    return ss[len(ss) // 2]


def main():
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.random((G * SUB, LANE), np.float32))
    fetch = lambda r: float(np.asarray(jax.device_get(r[0, 0])))

    a, b = (2, 4) if args.interpret else (2000, 6000)
    s = slope(make_fma, a, b, xf, fetch)
    fma_gops = G * SUB * LANE * DEPTH / s / 1e9
    print(f"fma:  {s * 1e6:9.2f} us/rep  -> {fma_gops:9.1f} GFMA/s", flush=True)

    # copy probe: vary the in-grid rep count (traffic scales with reps,
    # per-call fixed cost cancels in the slope)
    ca, cb = (2, 4) if args.interpret else (100, 400)
    xc = jnp.asarray(rng.random((CB * SUB, LANE), np.float32))
    s = slope(make_copy, ca, cb, xc, fetch)
    copy_gbps = 2 * CB * SUB * LANE * 4 / s / 1e9
    print(f"copy: {s * 1e6:9.3f} us/rep -> {copy_gbps:9.1f} GB/s", flush=True)

    print(json.dumps({"fma_gops": round(fma_gops, 1),
                      "copy_gbps": round(copy_gbps, 1)}))


if __name__ == "__main__":
    main()
