"""miniMD-compatible command-line driver (ref/ljs.cpp:61-504).

Flag surface mirrors the reference (ljs.cpp:87-261); flags that encode
CPU-specific execution knobs are accepted for compatibility and noted in
--help as no-ops on TPU (thread counts, SSE). --half_neigh 1 selects the
Newton half-stencil parity path (LJ + EAM, single-device and sharded);
the default remains the scatter-free full-stencil kernels, which measure
faster on TPU (SURVEY.md §2.4 P7).
"""

from __future__ import annotations

import argparse
import sys


from .config import FORCE_EAM, FORCE_LJ, UNITS_LJ, In, builtin_deck, parse_deck
from .timer import TIME_TOTAL, Timer

VARIANT_STRING = "miniMD-TPU 1.0 (JAX/XLA/Pallas)"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="minimd",
        description=f"{VARIANT_STRING} — a TPU-native parallel molecular "
                    "dynamics proxy app (miniMD capabilities)",
    )
    p.add_argument("-i", "--input_file", default=None,
                   help="input deck (default: in.lj.miniMD)")
    p.add_argument("-n", "--nsteps", type=int, default=-1)
    p.add_argument("-s", "--size", type=int, default=-1,
                   help="linear dimension of system box (unit cells)")
    p.add_argument("-nx", type=int, default=-1)
    p.add_argument("-ny", type=int, default=-1)
    p.add_argument("-nz", type=int, default=-1)
    p.add_argument("--ntypes", type=int, default=4)
    p.add_argument("-b", "--neigh_bins", type=int, default=-1,
                   help="linear dimension of the cell grid (default: autotuned)")
    p.add_argument("-u", "--units", default=None, choices=["lj", "metal"])
    p.add_argument("-p", "--force", dest="forcestyle", default=None,
                   choices=["lj", "eam"])
    p.add_argument("-f", "--data_file", default=None)
    p.add_argument("--sort", type=int, default=-1,
                   help="accepted for parity; binning always sorts (free)")
    p.add_argument("-o", "--yaml_output", type=int, default=0)
    p.add_argument("--yaml_screen", action="store_true")
    p.add_argument("--precision", type=int, default=1, choices=[1, 2],
                   help="1=float32 (TPU native), 2=float64")
    p.add_argument("--backend", default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument("--capacity", type=int, default=None,
                   help="cell capacity override (default: data-driven)")
    p.add_argument("--devices", type=int, default=1,
                   help="spatial decomposition over N devices "
                        "(mesh by min-surface factorization)")
    p.add_argument("--timed", action="store_true",
                   help="interval-chunked run with phase timers "
                        "(slightly slower; reference Timer parity)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of the run into DIR "
                        "(view with TensorBoard / xprof)")
    # compatibility no-ops (reference CPU execution knobs)
    p.add_argument("-t", "--num_threads", type=int, default=1,
                   help="[no-op on TPU] reference OpenMP thread count")
    p.add_argument("--teams", type=int, default=1, help="[no-op on TPU]")
    p.add_argument("--half_neigh", type=int, default=0,
                   help="1 = Newton half-neighbor path, LJ + EAM, also "
                        "with --devices (each pair evaluated once, j-side "
                        "accumulation folded/reverse-communicated back; "
                        "~2x slower on TPU, parity option); "
                        "0 = full stencils")
    p.add_argument("-gn", "--ghost_newton", type=int, default=1,
                   help="reference semantics (ljs.cpp:205-206): with half "
                        "lists (--half_neigh 1), 1 = apply Newton's 3rd "
                        "law across rank boundaries (forces on ghosts "
                        "reverse-communicated, comm.cpp:320-361), 0 = "
                        "duplicate boundary pairs on both owners at half "
                        "eng/vir weight with no reverse communication "
                        "(force_lj.cpp:239-249). LJ implements both; with "
                        "full stencils the flag has no effect (the "
                        "reference's compute_fullneigh ignores it too)")
    p.add_argument("-sse", type=int, default=0, help="[no-op]")
    p.add_argument("-d", "--device", type=int, default=0,
                   help="[no-op on TPU] reference GPU device id")
    p.add_argument("-dm", "--device_map", action="store_true",
                   help="[no-op on TPU] reference GPU/rank mapping")
    p.add_argument("-ng", "--num_gpus", type=int, default=2, help="[no-op]")
    p.add_argument("--skip_gpu", type=int, default=-1, help="[no-op]")
    p.add_argument("--check_exchange", action="store_true")
    p.add_argument("--safe_exchange", action="store_true",
                   help="multi-hop atom migration (place atoms arriving "
                        "from any device, ref comm.cpp:599-689); migration "
                        "is always capacity-checked either way")
    return p


def load_input(args) -> In:
    if args.input_file:
        inp = parse_deck(args.input_file)
        inp.source = args.input_file
    else:
        inp = builtin_deck("lj")
        inp.source = "in.lj.miniMD"

    # CLI overrides (precedence over deck, ljs.cpp:330-379)
    if args.nsteps > 0:
        inp.ntimes = args.nsteps
    if args.size > 0:
        inp.nx = inp.ny = inp.nz = args.size
    if args.nx > 0:
        inp.nx = args.nx
        inp.ny = args.ny if args.ny > 0 else (args.nx if args.size < 0 else inp.ny)
        inp.nz = args.nz if args.nz > 0 else (args.nx if args.size < 0 else inp.nz)
    if args.units:
        inp.units = 0 if args.units == "lj" else 1
    if args.forcestyle:
        inp.forcetype = FORCE_EAM if args.forcestyle == "eam" else FORCE_LJ
    if args.data_file:
        inp.datafile = args.data_file
    return inp


def banner(inp: In, sim, args, input_file):
    print(f"# {VARIANT_STRING} output ...")
    print("# Run Settings: ")
    print(f"\t# Devices: {len(__import__('jax').devices())}")
    print(f"\t# Inputfile: {input_file or 'in.lj.miniMD'}")
    print(f"\t# Datafile: {inp.datafile or 'None'}")
    print("# Physics Settings: ")
    print(f"\t# ForceStyle: {'LJ' if inp.forcetype == FORCE_LJ else 'EAM'}")
    print(f"\t# Force Parameters: {inp.epsilon:2.2f} {inp.sigma:2.2f}")
    print(f"\t# Units: {'LJ' if inp.units == UNITS_LJ else 'METAL'}")
    print(f"\t# Atoms: {sim.natoms}")
    print(f"\t# Atom types: {args.ntypes}")
    print(f"\t# System size: {sim.geom.prd[0]:2.2f} {sim.geom.prd[1]:2.2f} "
          f"{sim.geom.prd[2]:2.2f} (unit cells: {inp.nx} {inp.ny} {inp.nz})")
    print(f"\t# Density: {inp.rho:f}")
    print(f"\t# Force cutoff: {inp.force_cut:f}")
    print(f"\t# Timestep size: {inp.dt:f}")
    print("# Technical Settings: ")
    print(f"\t# Neigh cutoff: {inp.neigh_cut:f}")
    print(f"\t# Half neighborlists: {1 if args.half_neigh == 1 else 0}")
    print(f"\t# Cell grid: {sim.geom.nb[0]} {sim.geom.nb[1]} {sim.geom.nb[2]} "
          f"(capacity {sim.geom.capacity})")
    print(f"\t# Neighbor frequency: {inp.neigh_every}")
    print(f"\t# Thermo frequency: {inp.thermo_nstat}")
    print(f"\t# Ghost Newton: {args.ghost_newton}")
    print(f"\t# Backend: {args.backend}")
    print(f"\t# Size of float: {4 if args.precision == 1 else 8}")
    print()


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.half_neigh not in (0, 1):
        print("# Warning: --half_neigh -1 (the reference's unsafe-threaded "
              "mode) has no TPU analog; using full stencils. Supported: "
              "0 (full, default) and 1 (Newton half-neighbor).")
    if args.ghost_newton == 0 and args.half_neigh == 1:
        print("# Note: -gn 0 duplicates boundary pairs on both owners at "
              "half eng/vir weight and skips the reverse force "
              "communication (ref force_lj.cpp:239-249); identical "
              "physics to the gn=1 fold, decomposed differently. On a "
              "TPU mesh the fold is a dense slab ppermute over ICI "
              "(~us), so gn=1 is the faster default here.")
    if args.sse:
        print("ERROR: -sse applies to the miniMD-SSE CPU variant only. Exiting.")
        sys.exit(0)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    if args.precision == 2:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .sim import Simulation

    dtype = jnp.float32 if args.precision == 1 else jnp.float64
    inp = load_input(args)

    if args.devices > 1:
        return main_sharded(args, inp, dtype)

    print("# Create System:")
    nbins = (args.neigh_bins,) * 3 if args.neigh_bins > 0 else None
    from .config import FORCE_EAM as _EAM
    if (args.half_neigh == 1 and inp.forcetype == _EAM
            and args.ghost_newton == 0):
        # the reference FORCES gn=0 for EAM (ljs.cpp:277-281); this
        # build's EAM half path implements the Newton fold instead
        # (identical physics — ops/eam_half.py), so -gn has no effect
        print("# Note: the EAM half-neighbor path uses the ghost-Newton "
              "fold regardless of -gn (identical physics; the reference "
              "forces gn=0 for EAM, ljs.cpp:277-281).")
    sim = Simulation.from_input(
        inp, ntypes=args.ntypes, dtype=dtype, nbins=nbins,
        capacity=args.capacity, backend=args.backend,
        half_neigh=(args.half_neigh == 1),
        ghost_newton=(args.ghost_newton != 0),
    )
    print("# Done .... ")
    banner(inp, sim, args, args.input_file)

    print("# Starting dynamics ...")
    print("# Timestep T U P Time")
    timer = Timer()
    row0 = sim._row0
    print(f"{row0[0]} {row0[1]:e} {row0[2]:e} {row0[3]:e}  0.000")

    import contextlib
    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    timer.barrier_start(TIME_TOTAL)
    with prof:
        if args.timed or args.check_exchange:
            trace = sim.run_timed(timer, check_exchange=args.check_exchange)
        else:
            trace = sim.run()
    timer.barrier_stop(TIME_TOTAL)
    if args.profile:
        print(f"# profiler trace: {args.profile}")

    rows = sim.thermo_trace(trace)
    for r in rows[1:]:
        print(f"{r[0]} {r[1]:e} {r[2]:e} {r[3]:e} {timer.array[TIME_TOTAL]:6.3f}")

    from .output import lost_atom_check, yaml_report

    lost = lost_atom_check(sim)
    if lost:
        print(f"# WARNING: {lost} atoms lost")

    t_total = timer.array[TIME_TOTAL]
    from .timer import TIME_COMM, TIME_FORCE, TIME_NEIGH
    t_force, t_neigh, t_comm = (timer.array[TIME_FORCE],
                                timer.array[TIME_NEIGH],
                                timer.array[TIME_COMM])
    t_other = max(t_total - t_force - t_neigh - t_comm, 0.0)
    perf = sim.natoms * inp.ntimes / t_total if t_total else 0.0
    print("\n\n# Performance Summary:")
    print("# MPI_proc OMP_threads nsteps natoms t_total t_force t_neigh "
          "t_comm t_other performance perf/thread grep_string t_extra")
    print(f"1 1 {inp.ntimes} {sim.natoms} {t_total:f} {t_force:f} "
          f"{t_neigh:f} {t_comm:f} {t_other:f} {perf:f} {perf:f} "
          f"PERF_SUMMARY 0.000000\n\n")

    if args.yaml_output:
        path = yaml_report(sim, rows, timer, screen=args.yaml_screen)
        print(f"# YAML report: {path}")


if __name__ == "__main__":
    main()


def main_sharded(args, inp, dtype):
    """Multi-device run path (spatial decomposition, parallel/) — same
    harness surface as the single-device path: banner, step-0 row, phase
    timers (--timed), lost-atom audit, populated PERF_SUMMARY, YAML report
    with per-device distribution statistics (ref output.cpp:203-547)."""
    import jax

    from .parallel import ShardedSimulation
    from .timer import TIME_COMM, TIME_FORCE, TIME_NEIGH, Timer

    devices = jax.devices()[: args.devices]
    if len(devices) < args.devices:
        print(f"ERROR: requested {args.devices} devices, "
              f"have {len(jax.devices())}")
        sys.exit(1)

    print("# Create System (sharded):")
    nbins = (args.neigh_bins,) * 3 if args.neigh_bins > 0 else None
    ssim = ShardedSimulation.from_input(inp, devices=devices, dtype=dtype,
                                        nbins=nbins, ntypes=args.ntypes,
                                        safe_exchange=args.safe_exchange,
                                        backend=args.backend,
                                        capacity=args.capacity,
                                        half_neigh=(args.half_neigh == 1),
                                        ghost_newton=(args.ghost_newton != 0))
    print("# Done .... ")
    banner(inp, ssim, args, args.input_file)
    print(f"# Mesh: {dict(ssim.mesh.shape)}")

    print("# Starting dynamics ...")
    print("# Timestep T U P Time")
    timer = Timer()
    r0 = ssim.row0
    print(f"{r0[0]} {r0[1]:e} {r0[2]:e} {r0[3]:e}  0.000")

    import contextlib
    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    timer.barrier_start(TIME_TOTAL)
    with prof:
        if args.timed or args.check_exchange:
            trace = ssim.run_timed(timer, inp.ntimes,
                                   check_exchange=args.check_exchange)
        else:
            trace = ssim.run(inp.ntimes)
    timer.barrier_stop(TIME_TOTAL)
    if args.profile:
        print(f"# profiler trace: {args.profile}")

    rows = ssim.thermo_trace(trace)
    t_total = timer.array[TIME_TOTAL]
    for r in rows[1:]:
        print(f"{r[0]} {r[1]:e} {r[2]:e} {r[3]:e} {t_total:6.3f}")

    from .output import lost_atom_check, per_device_statistics, yaml_report

    lost = lost_atom_check(ssim)
    if lost:
        print(f"# WARNING: {lost} atoms lost")

    t_force, t_neigh, t_comm = (timer.array[TIME_FORCE],
                                timer.array[TIME_NEIGH],
                                timer.array[TIME_COMM])
    t_other = max(t_total - t_force - t_neigh - t_comm, 0.0)
    perf = ssim.natoms * inp.ntimes / t_total if t_total else 0.0
    print("\n\n# Performance Summary:")
    print("# devices OMP_threads nsteps natoms t_total t_force t_neigh "
          "t_comm t_other performance perf/device grep_string t_extra")
    print(f"{args.devices} 1 {inp.ntimes} {ssim.natoms} {t_total:f} "
          f"{t_force:f} {t_neigh:f} {t_comm:f} {t_other:f} {perf:f} "
          f"{perf/args.devices:f} PERF_SUMMARY 0.000000\n")

    if args.yaml_output:
        path = yaml_report(ssim, rows, timer, nprocs=args.devices,
                           screen=args.yaml_screen,
                           extra_stats=per_device_statistics(ssim))
        print(f"# YAML report: {path}")
