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


def make_copy(nblocks: int):
    # one pass: y = x + 1 over nblocks grid steps (HBM in + out per block)
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * SUB, LANE), jnp.float32),
        interpret=args.interpret,
    )


def slope(make, a, b, x_of, fetch, reps=3):
    fa, fb = jax.jit(make(a)), jax.jit(make(b))
    ra = fa(x_of(a)); fetch(ra)
    rb = fb(x_of(b)); fetch(rb)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); fetch(fa(x_of(a))); ta = time.time() - t0
        t0 = time.time(); fetch(fb(x_of(b))); tb = time.time() - t0
        best = min(best, (tb - ta) / (b - a))
    return best


def main():
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.random((G * SUB, LANE), np.float32))
    fetch = lambda r: float(np.asarray(jax.device_get(r[0, 0])))

    a, b = (2, 4) if args.interpret else (200, 600)
    s = slope(make_fma, a, b, lambda _r: xf, fetch)
    fma_gops = G * SUB * LANE * DEPTH / s / 1e9
    print(f"fma:  {s * 1e6:9.2f} us/rep  -> {fma_gops:9.1f} GFMA/s", flush=True)

    # copy probe: vary block count (HBM traffic scales, fixed cost cancels)
    ca, cb = (4, 8) if args.interpret else (512, 2048)
    xc_big = jnp.asarray(rng.random((cb * SUB, LANE), np.float32))
    xs = {ca: xc_big[:ca * SUB], cb: xc_big}
    s = slope(make_copy, ca, cb, lambda r: xs[r], fetch)
    copy_gbps = 2 * SUB * LANE * 4 / s / 1e9
    print(f"copy: {s * 1e6:9.3f} us/block -> {copy_gbps:9.1f} GB/s", flush=True)

    print(json.dumps({"fma_gops": round(fma_gops, 1),
                      "copy_gbps": round(copy_gbps, 1)}))


if __name__ == "__main__":
    main()
