"""miniMD-TPU: a TPU-native molecular dynamics proxy application.

Public API:

    from minimd_tpu import Simulation, builtin_deck, parse_deck

    sim = Simulation.from_input(builtin_deck("lj"))
    trace = sim.run()                    # (ntimes, 3) T/U/P per step
    rows = sim.thermo_trace(trace)       # thermo-cadence rows incl. step 0

Submodules: cells (binning/geometry), ops (force kernels), parallel
(mesh/sharding/migration), validate (golden-trace comparator),
checkpoint, lammps_data, native (C++ host runtime).
"""

from .config import In, builtin_deck, parse_deck  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: importing Simulation pulls in jax; keep bare `import minimd_tpu`
    # cheap for tooling.
    if name == "Simulation":
        from .sim import Simulation
        return Simulation
    raise AttributeError(name)
