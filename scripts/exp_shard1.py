#!/usr/bin/env python
"""Isolate the sharded-on-1-chip overhead (bench sharded_1chip_ratio
~0.75 at 131k, i.e. ~+0.9 ms/step over the single-device loop).

The profile (scripts/profile_step.py --sharded 1) attributes nearly all
of it to the force branch INSIDE shard_map (branch_0_fun 3.25 ms vs the
single-device step's 2.47 ms total), not to the reneigh cond (~0.1
ms/step) or the migration (~0.16 ms/step amortized). This experiment
pins which layer costs it, by timing the SAME p_noev force closure at
131k in three harnesses:

  P1 plain-jit scan            (the single-device lowering)
  P2 shard_map(1-device) scan  (the sharded lowering, no cond)
  P3 P2 + the ev lax.cond      (the sharded lowering, production body)

Each is an evolving-carry scan (x += eps*f) so the axon result cache
can't serve repeats; slopes between two warmed lengths, median of reps
(CLAUDE.md methodology).
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
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from minimd_tpu.config import builtin_deck  # noqa: E402
from minimd_tpu.ops.lj import LJParams  # noqa: E402
from minimd_tpu.ops.lj_pallas import make_lj_force_pallas  # noqa: E402
from minimd_tpu.sim import Simulation  # noqa: E402


def slope(fn, x, n1, n2, reps=5):
    """median ms/step between two warmed scan lengths."""
    fn(x, n1)[0].block_until_ready()
    fn(x, n2)[0].block_until_ready()
    vals = []
    for _ in range(reps):
        t0 = time.time(); float(fn(x, n1)[1]); ta = time.time() - t0
        t0 = time.time(); float(fn(x, n2)[1]); tb = time.time() - t0
        vals.append((tb - ta) / (n2 - n1) * 1e3)
    return float(np.median(vals))


def main():
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 32
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    geom = sim.geom
    x0 = jax.device_get(sim.state.x)
    typ = sim.state.typ
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)
    eps = jnp.float32(1e-7)
    print(f"grid={geom.nb} C={geom.capacity} natoms={sim.natoms}")

    # P1: plain jit
    _, p1_noev = make_lj_force_pallas(geom, params)
    p1_ev = make_lj_force_pallas(geom, params)[0]

    def body1(x, _):
        f, _e, _w = p1_noev(x, typ)
        return x + eps * f, jnp.float32(0)

    @jax.jit
    def run1(x, n):
        x, _ = jax.lax.scan(body1, x, None, length=n)
        return x, jnp.sum(x[0])

    cache1 = {}

    def fn1(x, n):
        if n not in cache1:
            cache1[n] = jax.jit(lambda x: jax.lax.scan(
                body1, x, None, length=n))
        xo, _ = cache1[n](x)
        return xo, jnp.sum(xo[0])

    # P2/P3: the sharded construction — 1x1x1 mesh, vma-typed kernel
    dev = np.array(jax.devices()[:1]).reshape(1, 1, 1)
    mesh = Mesh(dev, ("z", "y", "x"))
    nbx, nby, nbz = geom.nb
    _, p2_noev = make_lj_force_pallas(geom, params,
                                      nb_local=(nbx, nby, nbz), exchanges={})
    p2_ev = make_lj_force_pallas(geom, params, nb_local=(nbx, nby, nbz),
                                 exchanges={})[0]

    def make_sh(with_cond: bool):
        def body(x, n):
            if with_cond:
                def _noev(a, b):
                    ff, e, w = p2_noev(a, b)
                    return ff, e, w
                ev = (n + 1) % 100 == 0
                f, _e, _w = jax.lax.cond(
                    ev, lambda a, b: p2_ev(a, b), _noev, x, typ)
            else:
                f, _e, _w = p2_noev(x, typ)
            return x + eps * f, jnp.float32(0)

        def scan_fn(x, n_static):
            x, _ = jax.lax.scan(body, x, jnp.arange(n_static))
            return x, jnp.sum(x[0])

        cache = {}

        def fn(x, n):
            if n not in cache:
                cache[n] = jax.jit(jax.shard_map(
                    lambda x: scan_fn(x, n), mesh=mesh,
                    in_specs=(P(),), out_specs=(P(), P()),
                    check_vma=False))
            return cache[n](x)

        return fn

    fn2 = make_sh(False)
    fn3 = make_sh(True)

    x = jnp.asarray(x0)
    n1, n2 = 60, 240
    ms1 = slope(fn1, x, n1, n2)
    ms2 = slope(fn2, x, n1, n2)
    ms3 = slope(fn3, x, n1, n2)
    print(f"P1 plain-jit noev scan:      {ms1:7.3f} ms/step")
    print(f"P2 shard_map(1dev) noev:     {ms2:7.3f} ms/step "
          f"({(ms2 / ms1 - 1) * 100:+.1f}%)")
    print(f"P3 shard_map + ev cond:      {ms3:7.3f} ms/step "
          f"({(ms3 / ms1 - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
