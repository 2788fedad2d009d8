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
