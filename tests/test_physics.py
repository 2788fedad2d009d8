"""First-principles physics invariants, independent of the golden logs.

The golden-trace tests (test_lj_trace / test_eam) validate against the
reference's recorded output; these tests anchor the kernels to physics
itself: the analytic LJ pair force (ref/force_lj.cpp:420-430's formula
derived from U(r) = 4 eps (s^12/r^12 - s^6/r^6)), Newton's third law
(global force sum = 0), translation invariance under the periodic wrap,
and momentum conservation through the full velocity-Verlet loop.

All f64 on CPU (tests/conftest.py pins the platform), tiny systems.
"""

import jax.numpy as jnp
import numpy as np

from minimd_tpu import cells, create
from minimd_tpu.config import builtin_deck
from minimd_tpu.ops.lj import LJParams
from minimd_tpu.ops.lj_grid import make_lj_force_grid
from minimd_tpu.sim import Simulation
from minimd_tpu.state import init_state

DT = jnp.float64


def _lj_state(x_np, prd, cutneigh, nbins, capacity):
    geom = cells.build_geometry(np.asarray(prd, float), cutneigh,
                                np.asarray(x_np), nbins=nbins,
                                capacity=capacity)
    n = len(x_np)
    st = init_state(np.asarray(x_np), np.zeros((n, 3)),
                    np.zeros(n, np.int32), geom, dtype=DT)
    assert int(st.overflow) == 0
    return geom, st


def test_lj_two_atom_analytic():
    """One isolated pair: force, energy, and virial against closed form."""
    eps, sigma, cut = 1.0, 1.0, 2.5
    r = 1.2
    x_np = np.array([[2.0, 2.0, 2.0], [2.0 + r, 2.0, 2.0]])
    geom, st = _lj_state(x_np, (10.0, 10.0, 10.0), 2.8, (3, 3, 3), 8)
    params = LJParams.from_deck(1, eps, sigma, cut)
    force_ev, _ = make_lj_force_grid(geom, params, dtype=DT)
    f, eng, vir = force_ev(st.x, st.typ)

    sr2 = sigma * sigma / (r * r)
    sr6 = sr2 ** 3
    # f_i = fc * (x_i - x_j) with fc = 48 eps sr6 (sr6 - 1/2) / r^2
    fc = 48.0 * eps * sr6 * (sr6 - 0.5) / (r * r)
    f_np = np.asarray(f)
    valid = np.asarray(st.valid)
    xs = np.asarray(st.x)[0][valid]
    fx = f_np[0][valid]
    lo, hi = np.argsort(xs)
    assert np.allclose(fx[lo], -fc * r, rtol=1e-12)
    assert np.allclose(fx[hi], +fc * r, rtol=1e-12)
    assert np.allclose(f_np[1:, valid], 0.0, atol=1e-12)
    # full-neighbor raw ordered-pair sums, eng*4 / vir*0.5
    # (force_lj.cpp:441-442): pair counted twice
    assert np.isclose(float(eng), 2 * 4.0 * eps * sr6 * (sr6 - 1.0),
                      rtol=1e-12)
    assert np.isclose(float(vir), (r * r) * fc, rtol=1e-12)


def test_lj_forces_sum_zero():
    """Newton's third law: the global force vector sums to zero (after a
    few steps — the pristine FCC lattice has zero per-atom force by
    symmetry, which would make the check vacuous)."""
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    sim = Simulation.from_input(inp, dtype=DT)
    sim.run(20)
    f = np.asarray(sim.state.f)
    scale = np.abs(f).max()
    assert scale > 0.1      # forces are nontrivial
    total = f.sum(axis=1)
    assert np.all(np.abs(total) < 1e-9 * scale * np.sqrt(sim.natoms)), total


def test_lj_translation_invariance():
    """Shifting every atom by the same vector (periodic wrap included)
    leaves energy and virial unchanged — the cell fold, grid offset, and
    image shifts cancel exactly."""
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 8
    box = create.create_box(8, 8, 8, inp.rho)
    x_np, _ = create.create_atoms(8, 8, 8, inp.rho, box)
    # de-symmetrize: pristine FCC has zero forces by symmetry
    x_np = x_np + np.random.default_rng(7).normal(0.0, 0.05, x_np.shape)
    prd = np.asarray(box.prd)
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)

    delta = np.array([0.37, -1.13, 2.29])
    engs, virs, fscale = [], [], 1.0
    for shift in (np.zeros(3), delta):
        xs = np.mod(x_np + shift, prd)
        geom, st = _lj_state(xs, prd, inp.neigh_cut, (6, 6, 6), 24)
        force_ev, _ = make_lj_force_grid(geom, params, dtype=DT)
        f, eng, vir = force_ev(st.x, st.typ)
        engs.append(float(eng))
        virs.append(float(vir))
        fscale = float(np.abs(np.asarray(f)).max())
        assert fscale > 0.1
        assert np.all(np.abs(np.asarray(f).sum(axis=1)) < 1e-9 * fscale
                      * np.sqrt(len(xs)))
    assert np.isclose(engs[0], engs[1], rtol=1e-11), engs
    assert np.isclose(virs[0], virs[1], rtol=1e-11), virs


def test_eam_forces_sum_zero_and_translation():
    """EAM exact-spline path: Newton's third law + translation invariance
    (the embedding term is per-atom, so invariance exercises the two-pass
    rho -> fp -> force pipeline end to end)."""
    from minimd_tpu.ops.eam import EAMTables, make_eam_force

    tables = EAMTables.from_funcfl(None)
    inp = builtin_deck("eam")
    box = create.create_box(8, 8, 8, inp.rho)
    x_np, _ = create.create_atoms(8, 8, 8, inp.rho, box)
    # de-symmetrize: pristine FCC has zero forces by symmetry
    x_np = x_np + np.random.default_rng(11).normal(0.0, 0.05, x_np.shape)
    prd = np.asarray(box.prd)

    delta = np.array([1.07, -0.53, 2.91])
    engs = []
    for shift in (np.zeros(3), delta):
        xs = np.mod(x_np + shift, prd)
        geom, st = _lj_state(xs, prd, inp.neigh_cut, (5, 5, 5), 32)
        force = make_eam_force(geom, tables, 1, dtype=DT)
        f, eng, vir = force(st.x, st.typ)
        engs.append(float(eng))
        f = np.asarray(f)
        scale = np.abs(f).max()
        assert scale > 0.01
        total = f.sum(axis=1)
        assert np.all(np.abs(total) < 1e-9 * scale * np.sqrt(len(xs))), total
    assert np.isclose(engs[0], engs[1], rtol=1e-11), engs


def test_momentum_conservation_through_run():
    """COM momentum stays zero through the fused scan (rebinning, force,
    kicks): forces obey Newton's third law every step and the integrator
    never injects drift."""
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 8
    sim = Simulation.from_input(inp, dtype=DT)
    v0 = np.asarray(sim.state.v)
    p0 = v0.sum(axis=1)     # mass-uniform
    vscale = np.abs(v0).max()
    assert np.all(np.abs(p0) < 1e-10 * vscale * sim.natoms)
    sim.run(40)
    assert int(sim.state.overflow) == 0
    p1 = np.asarray(sim.state.v).sum(axis=1)
    assert np.all(np.abs(p1) < 1e-9 * vscale * np.sqrt(sim.natoms)), p1


def test_velocity_verlet_time_reversibility():
    """Kick-drift-kick velocity Verlet is exactly time-reversible: negate
    the velocities after n steps and the trajectory retraces itself. The
    temperature sequence (slot-permutation invariant, so rebins don't
    disturb the comparison) must come back in reverse order to f64
    roundoff — an integrator + reneighboring correctness check anchored
    to physics, independent of the golden logs."""
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    inp.thermo_nstat = 1          # a thermo row every step
    n = 40
    sim = Simulation.from_input(inp, dtype=DT)
    t0 = sim._row0[1]
    fwd = np.asarray(sim.run(n))

    sim.state = sim.state._replace(v=-sim.state.v)
    back = np.asarray(sim.run(n))

    # backward step j lands on forward state n-j: T'_j = T_{n-j}
    np.testing.assert_allclose(back[:-1, 0], fwd[:-1, 0][::-1], rtol=1e-9)
    # ... and the final backward step returns to the initial condition
    assert np.isclose(back[-1, 0], t0, rtol=1e-9)
