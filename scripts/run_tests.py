#!/usr/bin/env python
"""Golden-trace validation sweep — the reference's `run_tests` harness
(ref/run_tests:1-150) as a Python driver.

Sweeps system sizes x force styles (x device counts via --devices, x Newton
half-neighbor paths via --half_neigh) against the golden logs
in tests/golden/ using the reference's statistical acceptance criterion.
Device-count sweeps run on a virtual CPU mesh (the mpirun-on-one-node
analog); pass --tpu to run the f32 fast path on the real chip instead.

Examples:
  python scripts/run_tests.py --scope quick          # 4k LJ+EAM, 500 steps
  python scripts/run_tests.py --scope full           # + 16k/32k, 1000 steps
  python scripts/run_tests.py --input lj --size 10 --steps 2000
"""

import argparse
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SIZES = {10: "4k", 16: "16k", 20: "32k", 30: "108k", 40: "256k", 60: "864k"}


def run_case(input_name, size, steps, precision, backend, devices=1,
             half_neigh=False, ghost_newton=True):
    import jax
    import jax.numpy as jnp

    from minimd_tpu.config import builtin_deck
    from minimd_tpu.sim import Simulation
    from minimd_tpu.validate import compare_traces, parse_golden

    # "lj-data"/"eam-data": exercise the -f/--data_file init path
    # (ref/setup.cpp:215-301). The reference's own 1m.data is distributed
    # separately and not in-tree, so the data file is generated from the
    # matching FCC deck state; the trace must then match the same golden
    # log the builtin path matches (tests the reader end-to-end, including
    # text round-trip of positions/velocities and mass).
    style, _, via_data = input_name.partition("-")
    golden_path = ROOT / "tests" / "golden" / f"{SIZES[size]}.{style}"
    if not golden_path.exists():
        return None, f"no golden log {golden_path.name}"

    golden = parse_golden(golden_path)
    inp = builtin_deck(style)
    inp.nx = inp.ny = inp.nz = size
    inp.thermo_nstat = 100
    dtype = jnp.float64 if precision == 8 else jnp.float32

    if via_data:
        import tempfile

        from minimd_tpu import create
        from minimd_tpu.lammps_data import write_lammps_data
        from minimd_tpu.units import thermo_scales

        mass = 1.0
        if style == "eam":
            from minimd_tpu.ops.eam import EAMTables
            mass = EAMTables.from_funcfl(None).mass
        box = create.create_box(size, size, size, inp.rho)
        x, v = create.create_atoms(size, size, size, inp.rho, box)
        sc = thermo_scales(inp.units, len(x), box.volume)
        v = create.create_velocity(v, inp.t_request, len(x), mass, sc.t_scale)
        tmp = tempfile.NamedTemporaryFile(suffix=".data", delete=False)
        write_lammps_data(tmp.name, box, x, v, mass=mass)
        inp.datafile = tmp.name

    if devices > 1:
        # multi-device golden acceptance on the virtual CPU mesh — the
        # reference's mpirun-on-one-node rank sweep (ref/run_tests:62-150)
        from minimd_tpu.parallel import ShardedSimulation
        if len(jax.devices()) < devices:
            return None, f"only {len(jax.devices())} devices available"
        sim = ShardedSimulation.from_input(inp, devices=jax.devices()[:devices],
                                           dtype=dtype, backend=backend,
                                           half_neigh=half_neigh,
                                           ghost_newton=ghost_newton)
    else:
        sim = Simulation.from_input(inp, dtype=dtype, backend=backend,
                                    half_neigh=half_neigh,
                                    ghost_newton=ghost_newton)
    trace = sim.run(steps)
    rows = sim.thermo_trace(trace)
    res = compare_traces(rows, golden.rows, natoms=sim.natoms,
                         system=style, precision=precision)
    return res, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scope", choices=["quick", "full", "large"],
                    default=None)
    ap.add_argument("--input",
                    choices=["lj", "eam", "lj-data", "eam-data"], default=None)
    ap.add_argument("--size", type=int, default=10)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--tpu", action="store_true",
                    help="run f32 on the accelerator instead of f64 CPU")
    ap.add_argument("--devices", type=int, default=1,
                    help="run the sweep over N virtual CPU devices "
                         "(ShardedSimulation; the reference's multi-rank "
                         "sweep, ref/run_tests:62-150)")
    ap.add_argument("--half_neigh", type=int, default=0, choices=[0, 1],
                    help="1 = sweep the Newton half-neighbor force paths")
    ap.add_argument("--ghost_newton", type=int, default=1, choices=[0, 1],
                    help="with --half_neigh 1: 0 sweeps the reference's "
                         "-gn 0 duplicate-boundary-pair variant (LJ; "
                         "force_lj.cpp:239-249) instead of the Newton fold")
    args = ap.parse_args()

    if args.devices > 1:
        if args.tpu:
            sys.exit("--devices requires the virtual CPU mesh (no --tpu)")
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        precision, backend = 8, "xla"
    else:
        # remote TPU compiles take minutes; the persistent cache makes
        # sweep re-runs start in seconds (CLAUDE.md)
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        precision, backend = 4, "auto"

    cases = []
    # In f32 (precision 4) the acceptance envelopes stay at their floor
    # until step ~4000 (the arctan ramp is precision-scaled,
    # run_one_test:131), so f32 runs must be long enough that post-ramp
    # samples dominate — exactly how the reference exercises its f32
    # builds (10000-step golden logs).
    if args.scope == "quick":
        if args.tpu:
            # lj 10/10000 IS the acceptance run that admitted the kernel's
            # nr0 raw-approx-reciprocal default (force error 1.02e-4 of
            # scale, aggregate 0.21 vs the 0.38 bound) — interpret mode
            # cannot emulate the hardware LUT, so this routinely-run TPU
            # gate is what catches a toolchain regression in the approx
            # reciprocal (ADVICE r4)
            cases = [("lj", 10, 10000), ("eam", 10, 10000)]
        else:
            cases = [("lj", 10, 500), ("eam", 10, 500)]
    elif args.scope == "full":
        if args.tpu:
            cases = [("lj", 10, 10000), ("lj", 20, 2000),
                     ("eam", 10, 10000)]
        else:
            # LJ full trace (10000 steps): the criterion aggregates mostly
            # post-ramp samples; a 1000-step slice oversamples the tight
            # deterministic window and fails marginally even for faithful f64.
            cases = [("lj", 10, 10000), ("lj", 16, 500), ("lj", 20, 500),
                     ("eam", 10, 500), ("eam", 16, 200),
                     ("lj-data", 16, 500), ("eam-data", 16, 200)]
    elif args.scope == "large":
        # The sizes the reference validates beyond the pytest sweep
        # (256k = -s 40, 864k = -s 60). f64 on CPU runs at ~15 s/step at
        # 256k, so these are a separate opt-in scope (~2-3 h total);
        # thermo cadence is 100, so 200 steps yields 3 comparison rows
        # in the deterministic early-trajectory window.
        if args.tpu:
            # eam 20/10000: post-ramp-dominated trace passes in f32
            # (0.28 aggregate); eam 40 stays at 1000 steps because the
            # 10000-step 256k EAM scan reproducibly crashes the axon TPU
            # worker ("kernel fault": 2/2 attempts on the r4 toolchain
            # 2026-08-17, retested 2026-08-20 on the r5 toolchain after
            # the cache wipe and it STILL faults, 3/3 — not healed by
            # recompilation) - and is XFAIL per the parity evidence
            # below either way.
            cases = [("lj", 40, 2000), ("lj", 60, 1000),
                     ("eam", 20, 10000), ("eam", 40, 1000)]
        else:
            cases = [("lj", 40, 200), ("lj", 60, 200),
                     ("eam", 40, 200), ("eam", 60, 200)]
    else:
        cases = [(args.input or "lj", args.size, args.steps)]

    # Large EAM in single precision cannot meet the acceptance envelope:
    # P's pre-ramp tolerance is 0.3 METAL units = 1.8e-6 RELATIVE at
    # P ~ -1.64e5, below what any f32 table evaluation can hold through
    # the virial's cancellation. Measured evidence (2026-08-17): the
    # reference's OWN f32 build (ref/ + MPI-Stubs, PRECISION=1, -s 40
    # -n 1000) FAILS its own criterion at T 0.27 / E 1.00 / P 1.00 with
    # step-0 U off by 0.8%; our polynomial tables fail only P (step-0 P
    # error 0.68 vs the reference build's 163). Parity behavior - the
    # reference validates these sizes in f64, as do we (pytest + the f64
    # scope here).
    xfail_f32 = {("eam", 40), ("eam", 60)}

    failed = 0
    for input_name, size, steps in cases:
        res, skip = run_case(input_name, size, steps, precision, backend,
                             devices=args.devices,
                             half_neigh=bool(args.half_neigh),
                             ghost_newton=bool(args.ghost_newton))
        tag = (f"{input_name} -s {size} -n {steps} (precision {precision}"
               + (f", devices {args.devices}" if args.devices > 1 else "")
               + (", half_neigh" if args.half_neigh else "")
               + (", gn=0" if args.half_neigh and not args.ghost_newton
                  else "") + ")")
        if skip:
            print(f"SKIP   {tag}: {skip}")
            continue
        if (not res.passed and precision == 4
                and (input_name, size) in xfail_f32):
            print(f"XFAIL  {tag}: {res} — expected in f32; the reference's "
                  "own f32 build fails this case worse (see comment above)")
            continue
        print(f"{'PASS' if res.passed else 'FAIL':6} {tag}: {res}")
        failed += not res.passed
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
