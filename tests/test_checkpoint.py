"""Checkpoint/resume: a resumed run must continue the same trajectory."""

import jax.numpy as jnp
import numpy as np

from minimd_tpu import checkpoint
from minimd_tpu.config import builtin_deck
from minimd_tpu.sim import Simulation


def test_checkpoint_resume_continues_trajectory(tmp_path):
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    sim = Simulation.from_input(inp, dtype=jnp.float64)
    sim.run(40)
    p = tmp_path / "ck.npz"
    checkpoint.save(p, sim, step=40)

    # continue original
    tr_orig = sim.run(20)

    # resume from checkpoint and continue
    sim2, step = checkpoint.resume(p, dtype=jnp.float64)
    assert step == 40
    assert sim2.natoms == sim.natoms
    tr_res = sim2.run(20)

    # thermodynamics must track very closely (identical physics; only the
    # fold-to-box of storage coordinates differs, an exact symmetry)
    np.testing.assert_allclose(tr_res[:, 0], tr_orig[:, 0], rtol=1e-8, atol=1e-9)


def test_checkpoint_resume_thermo_provenance(tmp_path):
    """The resumed run's step-0 thermo row must be the ORIGINAL
    trajectory's, so conservation ratios continue the original run
    (VERDICT r2: _row0 was recomputed at the restored state before)."""
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    sim = Simulation.from_input(inp, dtype=jnp.float64)
    row0_orig = sim._row0
    sim.run(40)
    p = tmp_path / "ck.npz"
    checkpoint.save(p, sim, step=40)

    sim2, step = checkpoint.resume(p, dtype=jnp.float64)
    assert step == 40
    assert sim2._row0 == row0_orig
    # the restored instant is NOT at t=0: recomputing a fresh step-0 row
    # there would give a different temperature
    t_now = sim2.thermo_row(40)[1]
    assert abs(t_now - row0_orig[1]) > 1e-3


def test_checkpoint_resume_sharded(tmp_path):
    """Multi-device checkpoint roundtrip: save from a sharded run, resume
    sharded, continue — trajectory and provenance preserved."""
    import jax

    from minimd_tpu.parallel import ShardedSimulation

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                        dtype=jnp.float64)
    ssim.run(20)
    p = tmp_path / "ck_sharded.npz"
    checkpoint.save(p, ssim, step=20)
    tr_orig = ssim.run(20)

    ssim2, step = checkpoint.resume_sharded(p, devices=jax.devices()[:8],
                                            dtype=jnp.float64)
    assert step == 20
    assert ssim2.natoms == ssim.natoms
    assert ssim2.row0 == ssim.row0
    tr_res = ssim2.run(20)
    np.testing.assert_allclose(tr_res[:, 0], tr_orig[:, 0],
                               rtol=1e-8, atol=1e-9)

    # cross-topology resume: the same checkpoint restores on ONE device
    sim1, step1 = checkpoint.resume(p, dtype=jnp.float64)
    assert step1 == 20
    tr1 = sim1.run(20)
    np.testing.assert_allclose(tr1[:, 0], tr_orig[:, 0], rtol=1e-8,
                               atol=1e-9)


def test_checkpoint_resume_honors_sim_knobs(tmp_path):
    """resume() builds through Simulation.from_arrays, so the force/
    geometry knobs (backend, half_neigh, capacity pins) and the overflow
    grow-and-replay machinery apply to resumed runs — the old hand-built
    path dropped them all."""
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    sim = Simulation.from_input(inp, dtype=jnp.float64)
    sim.run(40)
    p = tmp_path / "ck.npz"
    checkpoint.save(p, sim, step=40)

    res, _ = checkpoint.resume(p, dtype=jnp.float64, half_neigh=True,
                               backend="xla")
    assert res.backend == "xla"
    assert res._make_force is not None      # regrow-capable
    # the Newton half-neighbor path really runs: physics matches the full
    # path closely (identical pair set, different summation order)
    tr_half = res.run(20)
    res_full, _ = checkpoint.resume(p, dtype=jnp.float64)
    tr_full = res_full.run(20)
    np.testing.assert_allclose(tr_half[:, 0], tr_full[:, 0],
                               rtol=1e-8, atol=1e-9)
    assert not np.array_equal(tr_half, tr_full)  # distinct code paths

    # explicit geometry pins flow through to the built geometry
    res_cap, _ = checkpoint.resume(p, dtype=jnp.float64,
                                   capacity=res.geom.capacity + 16)
    assert res_cap.geom.capacity == ((res.geom.capacity + 16 + 7) // 8) * 8
