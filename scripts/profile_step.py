#!/usr/bin/env python
"""Capture a device trace of a production run and print the per-op time
breakdown (top XLA/Mosaic ops by total duration). Used to attribute the
per-step time between the Pallas force kernel and the XLA glue."""

import argparse
import glob
import gzip
import json
import pathlib
import sys
from collections import defaultdict

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
    ap.add_argument("--style", choices=["lj", "eam"], default="lj")
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--sharded", type=int, default=0, metavar="NDEV",
                    help="profile the ShardedSimulation loop over NDEV "
                         "devices instead of the single-device loop")
    ap.add_argument("--out", default="/tmp/minimd_prof")
    args = ap.parse_args()

    inp = builtin_deck(args.style)
    inp.nx = inp.ny = inp.nz = args.n
    if args.sharded:
        from minimd_tpu.parallel import ShardedSimulation
        sim = ShardedSimulation.from_input(
            inp, devices=jax.devices()[:args.sharded], dtype=jnp.float32)
    else:
        sim = Simulation.from_input(inp, dtype=jnp.float32)
    print(f"natoms={sim.natoms} grid={sim.geom.nb} C={sim.geom.capacity}")
    sim.run(args.steps)  # warm

    with jax.profiler.trace(args.out):
        tr = sim.run(args.steps)
        float(tr[-1][0])  # sync

    files = sorted(glob.glob(args.out + "/**/*.trace.json.gz",
                             recursive=True))
    ev_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        # device lanes only (TensorFlow Op / XLA Op lanes carry pid names)
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        args_d = ev.get("args") or {}
        if "run_id" in args_d or name.startswith("tpu_"):
            continue
        ev_by_name[name] += dur
        cnt_by_name[name] += 1
    rows = sorted(ev_by_name.items(), key=lambda kv: -kv[1])
    print(f"{'ms_total':>10} {'count':>7}  op")
    for name, ms in rows[:40]:
        print(f"{ms:10.2f} {cnt_by_name[name]:7d}  {name[:110]}")


if __name__ == "__main__":
    main()
