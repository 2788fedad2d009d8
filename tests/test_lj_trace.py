"""End-to-end LJ validation against the reference's golden thermo traces,
using the reference's own statistical acceptance criterion (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from minimd_tpu.config import builtin_deck
from minimd_tpu.sim import Simulation
from minimd_tpu.validate import compare_traces, parse_golden


@pytest.fixture(scope="module")
def sim_4k():
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    return Simulation.from_input(inp, dtype=jnp.float64)


def test_step0_exact(sim_4k, golden_dir):
    golden = parse_golden(golden_dir / "4k.lj")
    step, t, u, p = sim_4k._row0
    g = golden.rows[0]
    assert g[0] == 0
    assert abs(t - g[1]) < 5e-7
    assert abs(u - g[2]) < 5e-7
    assert abs(p - g[3]) < 5e-6


def test_overflow_free(sim_4k):
    assert int(sim_4k.state.overflow) == 0


def test_lj_4k_trace_statistical(sim_4k, golden_dir):
    """500 steps, thermo every 100, vs golden 4k.lj under the run_one_test
    criterion. The first ~1000 steps are deterministic up to FP noise
    (tests/reference_output/README), so envelope failures here mean a
    physics bug, not chaos."""
    golden = parse_golden(golden_dir / "4k.lj")
    nsteps = 500
    sim_4k.inp.thermo_nstat = 100
    trace = sim_4k.run(nsteps)
    rows = sim_4k.thermo_trace(trace)
    res = compare_traces(rows, golden.rows, natoms=4000, system="lj", precision=8)
    assert res.passed, str(res)
    # early steps should in fact be very tight in f64
    by_step = {r[0]: r for r in golden.rows}
    for row in rows:
        if row[0] <= 200:
            g = by_step[row[0]]
            assert abs(row[2] - g[2]) < 2e-4, (row, g)
    assert int(sim_4k.state.overflow) == 0


def test_lj_f32_no_overflow(golden_dir):
    """f32 (the TPU dtype) must not lose atoms to dtype-dependent cell
    assignment (regression: lattice planes exactly on cell boundaries)."""
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    sim = Simulation.from_input(inp, dtype=jnp.float32)
    trace = sim.run(100)
    assert int(sim.state.overflow) == 0
    assert int(sim.state.valid.sum()) == 4000
    golden = parse_golden(golden_dir / "4k.lj")
    g100 = {r[0]: r for r in golden.rows}[100]
    assert abs(float(trace[99][1]) - g100[2]) < 1e-3  # U agrees closely even in f32


def test_capacity_regrow_preserves_physics():
    """Transparent capacity grow (the reference's neighbor-bin resize,
    neighbor.cpp:186-208): re-laying the state out with a larger capacity
    must keep every atom and leave the trajectory unchanged up to
    summation order."""
    import numpy as np

    from minimd_tpu.config import builtin_deck
    from minimd_tpu.sim import Simulation

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    a = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    b = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    a.run(25)
    b.run(25)

    cap0 = b.geom.capacity
    b._regrow(b.state, cap0 + 8)
    assert b.geom.capacity == cap0 + 8
    assert int(np.asarray(b.state.valid).sum()) == b.natoms

    ta = a.run(25)
    tb = b.run(25)
    # same positions, different slot layout: identical physics modulo
    # f64 summation order
    np.testing.assert_allclose(tb[:, 0], ta[:, 0], rtol=1e-12, atol=0)
    assert int(b.state.overflow) == 0
