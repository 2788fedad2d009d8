#!/usr/bin/env python
"""Dump the optimized TPU HLO of the production run() scan and print the
glue fusions (everything that is not the Pallas force custom-call), so
per-step glue can be attributed op-by-op against the profile."""

import argparse
import pathlib
import re
import sys

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
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--out", default="/tmp/run_hlo.txt")
    ap.add_argument("--names", nargs="*", default=[
        "maximum_maximum_fusion", "multiply_add_fusion", "fusion.14",
        "slice_reduce_fusion", "broadcast_in_dim.44", "reshape.171",
    ])
    args = ap.parse_args()

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = args.n
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    try:
        sim.run(args.steps)  # build + compile via the jit cache
    except Exception as e:  # the jit cache is populated before dispatch
        print(f"run() raised ({e}); lowering from the cache anyway")
    fn = sim._jit_cache[("run", args.steps)]
    txt = fn.lower(sim.state).compile().as_text()
    pathlib.Path(args.out).write_text(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")

    # print each requested fusion's computation body (first match)
    for name in args.names:
        pat = re.compile(
            r"^%?(" + re.escape(name) + r"[\w.]*)\b.*?(?=^\}|\Z)",
            re.M | re.S)
        m = pat.search(txt)
        if not m:
            print(f"--- {name}: NOT FOUND")


if __name__ == "__main__":
    main()
