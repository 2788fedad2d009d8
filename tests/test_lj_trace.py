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


def test_capacity_regrow_retune_recovers_all_atoms():
    """Overflow recovery with retune=True re-autotunes the grid from the
    live occupancy (bumping C across the 128-lane packed-candidate
    boundary halves the Pallas kernel throughput); when the autotuner
    reproduces the overflowing layout it falls back to the capacity
    bump. Either way no atom is lost and the run continues."""
    import numpy as np

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    sim = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    sim.run(10)
    cap0, nb0 = sim.geom.capacity, sim.geom.nb
    sim._regrow(sim.state, cap0 + 8, retune=True)
    # retune either re-grids or (same layout) applies the bump
    assert sim.geom.nb != nb0 or sim.geom.capacity >= cap0 + 8
    assert int(np.asarray(sim.state.valid).sum()) == sim.natoms
    tr = sim.run(10)
    assert np.isfinite(tr).all()
    assert int(sim.state.overflow) == 0

    # user-pinned geometry is never re-gridded
    simp = Simulation.from_input(inp, dtype=jnp.float64, backend="xla",
                                 nbins=nb0, capacity=cap0)
    simp.run(5)
    simp._regrow(simp.state, cap0 + 8, retune=True)
    assert simp.geom.nb == nb0 and simp.geom.capacity == cap0 + 8


def test_half_neighbor_matches_full():
    """--half_neigh 1 parity path (ref force_lj.cpp:185-263): each pair
    evaluated once with Newton halo-fold accumulation must reproduce the
    full-stencil forces/energy/virial to f64 summation-order noise."""
    import jax

    from minimd_tpu import cells, create
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.ops.lj import LJParams
    from minimd_tpu.ops.lj_grid import make_lj_force_grid
    from minimd_tpu.ops.lj_half import make_lj_force_half
    from minimd_tpu.state import init_state

    inp = builtin_deck("lj")
    n = 8
    box = create.create_box(n, n, n, inp.rho)
    x, v = create.create_atoms(n, n, n, inp.rho, box)
    x = x + np.random.default_rng(3).normal(0, 0.03, x.shape)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x)
    st = init_state(x, v, np.zeros(len(x), np.int32), geom,
                    dtype=jnp.float64)
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)

    ff, ef, wf = jax.jit(make_lj_force_grid(geom, params,
                                            dtype=jnp.float64)[0])(
        st.x, st.typ)
    fh, eh, wh = jax.jit(make_lj_force_half(geom, params,
                                            dtype=jnp.float64)[0])(
        st.x, st.typ)
    fscale = float(jnp.abs(ff).max())
    assert float(jnp.abs(fh - ff).max()) / fscale < 1e-13
    assert abs(float(eh - ef) / float(ef)) < 1e-13
    assert abs(float(wh - wf) / float(wf)) < 1e-13

    # noev variant: same forces, zero accumulators
    fh2, eh2, _ = jax.jit(make_lj_force_half(geom, params,
                                             dtype=jnp.float64)[1])(
        st.x, st.typ)
    np.testing.assert_array_equal(np.asarray(fh2), np.asarray(fh))
    assert float(eh2) == 0.0


def test_half_neighbor_gn0_matches_full():
    """ghost_newton=False (the reference's `-gn 0`, force_lj.cpp:239-249)
    [r5]: boundary pairs evaluated from both owning sides at half eng/vir
    weight, force on own atoms only, NO reverse fold — must reproduce the
    full-stencil forces/energy/virial to f64 summation-order noise, like
    the gn=1 fold does. On a single device the 'both owners' are the two
    periodic sides of the same box, so all the duplicate-evaluation and
    half-weighting machinery is exercised."""
    import jax

    from minimd_tpu import cells, create
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.ops.lj import LJParams
    from minimd_tpu.ops.lj_grid import make_lj_force_grid
    from minimd_tpu.ops.lj_half import make_lj_force_half
    from minimd_tpu.state import init_state

    inp = builtin_deck("lj")
    n = 8
    box = create.create_box(n, n, n, inp.rho)
    x, v = create.create_atoms(n, n, n, inp.rho, box)
    x = x + np.random.default_rng(7).normal(0, 0.03, x.shape)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x)
    st = init_state(x, v, np.zeros(len(x), np.int32), geom,
                    dtype=jnp.float64)
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)

    ff, ef, wf = jax.jit(make_lj_force_grid(geom, params,
                                            dtype=jnp.float64)[0])(
        st.x, st.typ)
    f0, e0, w0 = jax.jit(make_lj_force_half(geom, params, dtype=jnp.float64,
                                            ghost_newton=False)[0])(
        st.x, st.typ)
    fscale = float(jnp.abs(ff).max())
    assert float(jnp.abs(f0 - ff).max()) / fscale < 1e-13
    assert abs(float(e0 - ef) / float(ef)) < 1e-13
    assert abs(float(w0 - wf) / float(wf)) < 1e-13

    # noev variant: identical forces, zero accumulators
    f0n, e0n, _ = jax.jit(make_lj_force_half(geom, params,
                                             dtype=jnp.float64,
                                             ghost_newton=False)[1])(
        st.x, st.typ)
    np.testing.assert_array_equal(np.asarray(f0n), np.asarray(f0))
    assert float(e0n) == 0.0

    # end-to-end: a short gn=0 trajectory tracks the gn=1 one in f64
    inp2 = builtin_deck("lj")
    inp2.nx = inp2.ny = inp2.nz = 6
    inp2.thermo_nstat = 5
    tr = {}
    for gn in (True, False):
        sim = Simulation.from_input(inp2, dtype=jnp.float64,
                                    half_neigh=True, ghost_newton=gn)
        tr[gn] = np.asarray(sim.run(20))
    np.testing.assert_allclose(tr[False], tr[True], rtol=1e-9, atol=1e-12)


def test_run_timed_overflow_grow_and_continue():
    """run_timed must recover from a rebin capacity overflow by growing
    and re-laying out (same semantics as run(); VERDICT: raise-only before).
    Overflow is forced deterministically: capacity capped at the initial
    max occupancy, then an atom is teleported into the fullest cell."""
    import numpy as np

    from minimd_tpu.config import builtin_deck
    from minimd_tpu.sim import Simulation
    from minimd_tpu.timer import Timer

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    probe = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    C = probe.geom.capacity
    occ = np.asarray(probe.state.valid).reshape(-1, C).sum(axis=1)
    cap = int(occ.max())

    sim = Simulation.from_input(inp, dtype=jnp.float64, backend="xla",
                                capacity=cap)
    occ = np.asarray(sim.state.valid).reshape(-1, cap).sum(axis=1)
    full_cell = int(occ.argmax())
    assert occ[full_cell] == cap

    # teleport an atom from another cell into the full cell's center
    nbx, nby, nbz = sim.geom.nb
    iz, rem = divmod(full_cell, nby * nbx)
    iy, ix = divmod(rem, nbx)
    center = [sim.geom.offset[d] + (idx + 0.5) * sim.geom.binsize[d]
              for d, idx in enumerate((ix, iy, iz))]
    victim_cell = int(np.argmax(
        (occ > 0) & (np.arange(len(occ)) != full_cell)))
    assert victim_cell != full_cell and occ[victim_cell] > 0
    victim_slot = victim_cell * cap + int(
        np.asarray(sim.state.valid).reshape(-1, cap)[victim_cell].argmax())
    x = np.array(sim.state.x)
    x[:, victim_slot] = center
    sim.state = sim.state._replace(x=jnp.asarray(x))

    trace = sim.run_timed(Timer(), sim.inp.neigh_every)
    assert sim.geom.capacity > cap          # the grow fired
    assert int(sim.state.overflow) == 0
    assert int(np.asarray(sim.state.valid).sum()) == sim.natoms
    assert np.all(np.isfinite(trace))


def test_lj_fused_pallas_kernel_matches_exact():
    """Kernel-level parity for the fused single-device LJ Pallas kernel
    (ops/lj_pallas.py) against the exact dense grid path, interpret mode.

    Covers the reciprocal variants: the full-precision divide ("div")
    must sit at f32 input-rounding error vs the f64 reference, and the
    Newton-corrected approximate reciprocal ("nr2" under interpret,
    where the reciprocal emulation is coarser) must agree with "div" to
    f32 rounding of the force scale. The TPU production default is
    "nr0" (raw approx, 1.02e-4 of force scale, +6.4% at 864k — passes
    the reference's acceptance criterion; see ops/lj_pallas.py); its
    hardware LUT is not reproduced by interpret mode, so its accuracy
    evidence lives in scripts/exp_nr0.py + run_tests --tpu."""
    import jax

    from minimd_tpu.ops.lj import LJParams
    from minimd_tpu.ops.lj_grid import make_lj_force_grid
    from minimd_tpu.ops.lj_pallas import make_lj_force_pallas

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    sim = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    sim.run(5)
    geom, typ = sim.geom, sim.state.typ
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)
    x64 = sim.state.x
    x32 = x64.astype(jnp.float32)

    fe, ee, ve = jax.jit(make_lj_force_grid(geom, params, dtype=jnp.float64)[0])(
        x64, typ)
    valid = np.asarray(sim.state.valid)
    fe_ = np.asarray(fe)[:, valid]
    scale = np.abs(fe_).max()

    out = {}
    for recip in ("div", "nr2"):
        p_ev, p_noev = make_lj_force_pallas(geom, params, dtype=jnp.float32,
                                            interpret=True, recip=recip)
        fp_, ep, vp = jax.jit(p_ev)(x32, typ)
        fp2 = np.asarray(fp_)[:, valid]
        assert np.abs(fp2 - fe_).max() / scale < 2e-5   # f32 input rounding
        assert abs(float(ep) - float(ee)) / abs(float(ee)) < 1e-5
        assert abs(float(vp) - float(ve)) / abs(float(ve)) < 1e-4
        fn, en, vn = jax.jit(p_noev)(x32, typ)
        # ev/noev are separately compiled programs; fusion differences put
        # their forces within f32 rounding, not bit-equal
        assert np.abs(np.asarray(fn)[:, valid] - fp2).max() / scale < 1e-6
        assert float(en) == 0.0 and float(vn) == 0.0
        out[recip] = fp2

    # the NR-corrected approximate reciprocal stays within f32 rounding
    # of the exact divide (measured 1.4e-7 on TPU hardware after 1 step)
    assert np.abs(out["nr2"] - out["div"]).max() / scale < 1e-6

    # triple input (sim.TRIPLE_CARRY): tuple of flat (M,) coordinate
    # arrays in, tuple of (M,) forces out — same ops, bit-identical to
    # the (3, M) call of the same build
    assert getattr(p_noev, "accepts_triple", False)
    fn3, _, _ = jax.jit(p_noev)((x32[0], x32[1], x32[2]), typ)
    assert isinstance(fn3, tuple) and len(fn3) == 3
    fn3_ = np.stack([np.asarray(c) for c in fn3])
    assert np.abs(fn3_[:, valid] - np.asarray(fn)[:, valid]).max() == 0.0

    # xi_src="pack" (own-row coordinates sliced from the candidate pack's
    # center lanes — the raw grids never materialize in HBM) is the SAME
    # arithmetic on the same values: bit-identical, not just close
    k_ev, k_noev = make_lj_force_pallas(geom, params, dtype=jnp.float32,
                                        interpret=True, recip="div",
                                        xi_src="pack")
    fk, ek, vk = jax.jit(k_ev)(x32, typ)
    assert np.abs(np.asarray(fk)[:, valid] - out["div"]).max() == 0.0
    fkn = jax.jit(k_noev)(x32, typ)[0]
    p_noev_d = make_lj_force_pallas(geom, params, dtype=jnp.float32,
                                    interpret=True, recip="div")[1]
    fpn = jax.jit(p_noev_d)(x32, typ)[0]
    assert np.abs(np.asarray(fkn)[:, valid]
                  - np.asarray(fpn)[:, valid]).max() == 0.0

    # PACK_SRC="padded" (pad the x axis once, lane-concat fusible views
    # instead of materializing left/right x-concat intermediates — the
    # production default, +2.4% at 131k) is the same elements with the
    # same shift arithmetic in a different lowering: bit-identical to the
    # "slices" idiom, not just close
    from minimd_tpu.ops import pairgrid
    assert pairgrid.PACK_SRC == "padded"   # production default
    try:
        for src in ("slices", "flat"):
            pairgrid.PACK_SRC = src
            pp_ev = make_lj_force_pallas(geom, params, dtype=jnp.float32,
                                         interpret=True, recip="div")[0]
            fpp = jax.jit(pp_ev)(x32, typ)[0]
            assert np.abs(np.asarray(fpp)[:, valid]
                          - out["div"]).max() == 0.0, src
    finally:
        pairgrid.PACK_SRC = "padded"

    # sigma != 1 exercises the kernel's sig6-multiply branch (the shipped
    # decks all have sigma == 1, where the kernel skips the multiply)
    params_s = LJParams.from_deck(1, inp.epsilon, 1.1, inp.force_cut)
    fe_s = jax.jit(make_lj_force_grid(geom, params_s, dtype=jnp.float64)[0])(
        x64, typ)[0]
    p_ev_s, _ = make_lj_force_pallas(geom, params_s, dtype=jnp.float32,
                                     interpret=True, recip="div")
    fp_s = jax.jit(p_ev_s)(x32, typ)[0]
    fes_ = np.asarray(fe_s)[:, valid]
    assert np.abs(np.asarray(fp_s)[:, valid] - fes_).max() \
        / np.abs(fes_).max() < 2e-5


def test_triple_carry_bit_identical():
    """sim.TRIPLE_CARRY carries x/v/f through the plain-step scan as
    3-tuples of flat (M,) arrays (dense TPU tiling) instead of one (3, M)
    array (3-row sublane dim padded to 8 — ~2.7x bandwidth on every
    kick/drift). Same elementwise ops per coordinate slice => the whole
    run must be BIT-identical, not just close. The Pallas force closures
    advertise accepts_triple; here an adapter over the XLA grid force
    exercises the run()-loop plumbing on CPU."""
    from minimd_tpu import sim as sim_mod

    def build():
        inp = builtin_deck("lj")
        inp.nx = inp.ny = inp.nz = 6
        inp.thermo_nstat = 20   # aligned with neigh_every=20
        s = Simulation.from_input(inp, dtype=jnp.float32, backend="xla")

        def wrap(base):
            def adapter(x, typ):
                if isinstance(x, (tuple, list)):
                    f, e, v = base(jnp.stack(x), typ)
                    return tuple(f[c] for c in range(3)), e, v
                return base(x, typ)

            adapter.accepts_triple = True
            return adapter

        # both variants: the triple carry now spans the reneigh step too,
        # whose evflag cond calls force_fn (ev) on the triple carry
        s.force_fn_noev = wrap(s.force_fn_noev)
        s.force_fn = wrap(s.force_fn)
        return s

    old = sim_mod.TRIPLE_CARRY
    old_noev = sim_mod.NOEV_FASTPATH
    try:
        # force the aligned fastpath on: the "auto" size gates are all
        # False at this grid, and triple/w-carry require `aligned` —
        # without this the two runs compare the same plain path (vacuous)
        sim_mod.NOEV_FASTPATH = True
        sim_mod.TRIPLE_CARRY = False
        a = build()
        tr_a = a.run(60)
        sim_mod.TRIPLE_CARRY = True
        b = build()
        tr_b = b.run(60)
    finally:
        sim_mod.TRIPLE_CARRY = old
        sim_mod.NOEV_FASTPATH = old_noev
    assert np.array_equal(tr_a, tr_b)
    for name in ("x", "v", "f"):
        assert np.array_equal(np.asarray(getattr(a.state, name)),
                              np.asarray(getattr(b.state, name))), name
    assert int(b.state.overflow) == 0


def test_w_carry_drift_bounded():
    """sim.W_CARRY merges step n's second kick with step n+1's first kick
    into one fused pass over a carried half-kick velocity. The merged
    `(w + dtf*f) + dtf*f` is the same two sequential adds, but XLA's FMA
    contraction rounds the merged fusion differently (~1 ulp per kick
    pair), so the flag is physics-identical, NOT bit-identical — this
    test pins that contract: the trajectories must agree to a few-ulp
    envelope over 3 reneigh intervals, and the flag must default OFF
    (a default flip needs the trajectory acceptance bar, like nr0)."""
    from minimd_tpu import sim as sim_mod

    assert sim_mod.W_CARRY is False   # default: off until accepted

    def run(wc):
        sim_mod.NOEV_FASTPATH = True
        sim_mod.W_CARRY = wc
        inp = builtin_deck("lj")
        inp.nx = inp.ny = inp.nz = 6
        inp.thermo_nstat = 20
        s = Simulation.from_input(inp, dtype=jnp.float32, backend="xla")
        tr = s.run(60)
        assert int(s.state.overflow) == 0
        return np.asarray(s.state.x), np.asarray(s.state.v), np.asarray(tr)

    old_noev, old_wc = sim_mod.NOEV_FASTPATH, sim_mod.W_CARRY
    try:
        ax, av, atr = run(False)
        bx, bv, btr = run(True)
    finally:
        sim_mod.NOEV_FASTPATH = old_noev
        sim_mod.W_CARRY = old_wc
    # few-ulp rounding divergence (exact equality would also be fine —
    # it would mean the toolchain contracted both forms identically),
    # amplified mildly over 60 steps; a logic bug (missed/double kick)
    # would show up at the dt*|v| ~ 1e-2 scale, 3+ orders above this
    assert np.abs(bx - ax).max() < 1e-4
    assert np.abs(bv - av).max() < 1e-4
    assert np.abs(btr - atr).max() < 1e-3


def test_lj_gather_variant_matches_grid():
    """ops/lj.py's cell-chunked gather formulation (the pre-grid design,
    kept as the bounded-memory fallback) must match the dense grid kernel
    to f64 rounding on the same state."""
    import jax

    from minimd_tpu.ops.lj import LJParams, make_lj_force
    from minimd_tpu.ops.lj_grid import make_lj_force_grid

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    sim = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    sim.run(5)
    geom, typ, x = sim.geom, sim.state.typ, sim.state.x
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)

    fg, eg, vg = jax.jit(make_lj_force_grid(geom, params, dtype=jnp.float64)[0])(x, typ)
    fc, ec, vc = jax.jit(make_lj_force(geom, params, dtype=jnp.float64))(x, typ)

    valid = np.asarray(sim.state.valid)
    np.testing.assert_allclose(np.asarray(fc)[:, valid],
                               np.asarray(fg)[:, valid],
                               rtol=1e-12, atol=1e-12)
    assert abs(float(ec) - float(eg)) / abs(float(eg)) < 1e-13
    assert abs(float(vc) - float(vg)) / abs(float(vg)) < 1e-12


def test_run_timed_matches_run_program():
    """--timed must measure the production program (round-3 VERDICT weak
    #5): thermo reductions gated on the nstat cadence exactly like run()'s
    fused loop — nstat rows bit-identical, non-nstat rows zeroed, and the
    subsampled thermo_trace identical up to the trailing recomputed row
    (separate-dispatch vs fused-scan FMA rounding: ~1 ulp)."""
    from minimd_tpu.timer import Timer

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 8
    inp.thermo_nstat = 25
    a = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    b = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    tr_a = a.run(60)
    tr_b = b.run_timed(Timer(), 60)
    for n in (24, 49):          # nstat steps: bit-identical
        assert np.array_equal(tr_a[n], tr_b[n]), (n, tr_a[n], tr_b[n])
    assert np.all(tr_b[10] == 0.0)      # non-nstat steps carry no thermo
    ra, rb = a.thermo_trace(tr_a), b.thermo_trace(tr_b)
    assert ra[:-1] == rb[:-1]
    np.testing.assert_allclose(ra[-1], rb[-1], rtol=1e-12)


def test_lj_fused_step_kernel_matches_plain():
    """Fused-STEP kernel parity (ops/lj_step_pallas.py, wired behind the
    opt-in Simulation(fused_step=True) flag — measured slower than the
    plain loop on the r4 toolchain, default OFF): seed + N fused
    invocations must
    reproduce the plain path's kick/drift/force/kick sequence. The force
    body, the FMA order of the two kicks, and the pack (a copy) are
    identical code, so x/w track the plain path to f32 rounding, the
    emitted J' matches the XLA pack of the emitted x' exactly, and the
    ev accumulators (eng/vir, and the in-kernel SUM(v^2) that replaces
    the XLA temperature reduction) match the plain per-step values."""
    import jax

    from minimd_tpu.ops.lj import LJParams
    from minimd_tpu.ops.lj_pallas import make_lj_force_pallas
    from minimd_tpu.ops.lj_step_pallas import make_lj_step_pallas
    from minimd_tpu.ops.pairgrid import fused_lane_pack

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    sim = Simulation.from_input(inp, dtype=jnp.float32, backend="xla")
    sim.run(3)                       # decorrelate from the lattice
    geom, typ = sim.geom, sim.state.typ
    nbx, nby, nbz = geom.nb
    C = geom.capacity
    M = nbx * nby * nbz * C
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)
    dt = jnp.asarray(inp.dt, jnp.float32)
    dtf = jnp.asarray(sim.dtforce, jnp.float32)

    p_ev, p_noev = make_lj_force_pallas(geom, params, dtype=jnp.float32,
                                        interpret=True)
    p_ev, p_noev = jax.jit(p_ev), jax.jit(p_noev)
    x0, v0 = sim.state.x, sim.state.v
    f0 = p_noev(x0, typ)[0]          # consistent (x, v, f) carry

    # ---- reference: N plain steps (the run() loop's exact sequence) ----
    N = 4
    x, v, f = x0, v0, f0
    engs, virs, vsqs = [], [], []
    for _n in range(N):
        v = v + dtf * f
        x = x + dt * v
        f, eng, vir = p_ev(x, typ)
        v = v + dtf * f
        engs.append(float(eng))
        virs.append(float(vir))
        vsqs.append(float(jnp.sum(v * v)))
    w_ref = np.asarray(v + dtf * f)          # the phase-shift boundary:
    x_ref = np.asarray(x + dt * (v + dtf * f))   # one more kick + drift

    # ---- fused path: seed + N kernel invocations ----
    s_ev, s_noev, seed = make_lj_step_pallas(
        geom, params, float(inp.dt), sim.dtforce, interpret=True)
    s_ev, s_noev = jax.jit(s_ev), jax.jit(s_noev)
    J, xg, wg = seed(x0, v0, f0)
    for n in range(N):
        J, xg, wg, eng, vir, vsq = s_ev(J, xg, wg)
        assert abs(float(eng) - engs[n]) / abs(engs[n]) < 1e-5, n
        assert abs(float(vir) - virs[n]) / abs(virs[n]) < 1e-4, n
        # summation ORDER differs (in-kernel per-row partials vs one XLA
        # reduction) — close, not bit-equal
        assert abs(float(vsq) - vsqs[n]) / vsqs[n] < 1e-5, n

    xf = np.stack([np.asarray(xg[c]).reshape(M) for c in range(3)])
    wf = np.stack([np.asarray(wg[c]).reshape(M) for c in range(3)])
    valid = np.asarray(sim.state.valid)
    xscale = np.abs(x_ref[:, valid]).max()
    wscale = np.abs(w_ref[:, valid]).max()
    assert np.abs(xf[:, valid] - x_ref[:, valid]).max() / xscale < 1e-6
    assert np.abs(wf[:, valid] - w_ref[:, valid]).max() / wscale < 1e-5

    # J' must be exactly the XLA pack of the emitted x' (bit-equal: the
    # in-kernel rolls/concat copy the same f32 values)
    LANE = (3 * C + 127) // 128 * 128
    _dec, pack_candidates, _ws = fused_lane_pack(
        (nbx, nby, nbz), C, LANE, geom.prd, None, 5.0e5)
    for c in range(3):
        jref = np.asarray(pack_candidates(xg[c], c))
        assert np.array_equal(np.asarray(J[c]), jref), c

    # noev variant: same state evolution (separately compiled: f32
    # rounding), zero accumulators
    J2, xg2, wg2 = seed(x0, v0, f0)
    for _n in range(N):
        J2, xg2, wg2, eng2, vir2, vsq2 = s_noev(J2, xg2, wg2)
    assert float(eng2) == 0.0 and float(vir2) == 0.0 and float(vsq2) == 0.0
    xf2 = np.stack([np.asarray(xg2[c]).reshape(M) for c in range(3)])
    assert np.abs(xf2[:, valid] - xf[:, valid]).max() / xscale < 1e-6


def test_lj_fused_step_run_wiring():
    """The opt-in fused_step run() path (EXPERIMENTAL) must reproduce the
    plain loop's semantics through rebin boundaries: same zeroed-row
    cadence, thermo rows tracking the plain trace (different force-kernel
    rounding + in-kernel reductions: close, not bit-equal), no atom loss,
    and the final state consistent. CPU = interpret-mode kernel."""
    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 6
    inp.thermo_nstat = 5
    a = Simulation.from_input(inp, dtype=jnp.float32, backend="xla")
    b = Simulation.from_input(inp, dtype=jnp.float32, backend="xla",
                              fused_step=True)
    tr_a = a.run(40)
    tr_b = b.run(40)
    assert tr_a.shape == tr_b.shape
    # identical zero-row cadence (non-nstat steps carry no thermo)
    np.testing.assert_array_equal(tr_a == 0.0, tr_b == 0.0)
    rows = np.nonzero(tr_a[:, 0])[0]
    assert len(rows) >= 8
    # early rows: f32 kernel-rounding differences only; later rows drift
    # chaotically but stay in the same statistical band
    np.testing.assert_allclose(tr_b[rows[0]], tr_a[rows[0]], rtol=2e-4)
    np.testing.assert_allclose(tr_b[rows], tr_a[rows], rtol=0.08)
    assert int(np.asarray(b.state.valid).sum()) == b.natoms
    ra, rb = a.thermo_row(40), b.thermo_row(40)
    np.testing.assert_allclose(rb[1:], ra[1:], rtol=0.08)

    # the flag rejects unsupported configurations loudly
    with pytest.raises(ValueError):
        Simulation.from_input(inp, dtype=jnp.float64, fused_step=True)
    inp2 = builtin_deck("eam")
    with pytest.raises(ValueError):
        Simulation.from_input(inp2, dtype=jnp.float32, fused_step=True)
