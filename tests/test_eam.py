"""EAM validation: funcfl tables, spline values, golden-trace parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from minimd_tpu.config import builtin_deck
from minimd_tpu.eam_file import array2spline, default_potential_path, file2array, read_funcfl
from minimd_tpu.sim import Simulation
from minimd_tpu.validate import compare_traces, parse_golden


def test_funcfl_header():
    f = read_funcfl(default_potential_path())
    assert f.mass == 63.550
    assert f.nrho == 500 and f.nr == 500
    assert np.isclose(f.cut, 4.95)
    assert np.isclose(f.drho, 5.0100200400801306e-04)
    # 1-indexed data: first frho value is 0.0, second is the file's 2nd token
    assert f.frho[1] == 0.0
    assert np.isclose(f.frho[2], -3.1589719908208558e-01)


def test_spline_structure():
    """Spline knot values must equal the regridded function; derivative
    columns scaled by 1/delta (force_eam.cpp:765-793)."""
    f = read_funcfl(default_potential_path())
    nrho, drho, nr, dr, frho, rhor, z2r = file2array(f)
    # the working grid is nr = int((file_nr-1)*dr/dr + 0.5) = file_nr - 1
    # (force_eam.cpp:612): one point fewer than the file grid.
    assert nr == f.nr - 1 and nrho == f.nrho - 1
    sp = array2spline(nr, dr, rhor)
    assert sp.shape == (nr + 1, 7)
    assert np.allclose(sp[1:, 6], rhor[1: nr + 1])
    # regrid onto the identical grid must reproduce the input values
    assert np.allclose(rhor[1: nr + 1], f.rhor[1: nr + 1], rtol=1e-12)
    # z2r units: 27.2*0.529*zr^2
    assert np.allclose(z2r[1: nr + 1], 27.2 * 0.529 * f.zr[1: nr + 1] ** 2, rtol=1e-12)
    # spline continuity: value at p=1 of row m equals knot m+1
    m = np.arange(1, nr - 1)
    val_at_1 = ((sp[m, 3] + sp[m, 4]) + sp[m, 5]) + sp[m, 6]
    assert np.allclose(val_at_1, sp[m + 1, 6], rtol=0, atol=1e-9)


@pytest.fixture(scope="module")
def eam_4k():
    inp = builtin_deck("eam")
    inp.nx = inp.ny = inp.nz = 10
    return Simulation.from_input(inp, dtype=jnp.float64)


def test_eam_step0_exact(eam_4k, golden_dir):
    golden = parse_golden(golden_dir / "4k.eam")
    _, t, u, p = eam_4k._row0
    g = golden.rows[0]
    assert abs(t - g[1]) < 1e-4          # T = 600 exactly requested
    assert abs(u - g[2]) / abs(g[2]) < 1e-6
    assert abs(p - g[3]) / abs(g[3]) < 1e-5


def test_eam_trace_statistical(eam_4k, golden_dir):
    golden = parse_golden(golden_dir / "4k.eam")
    eam_4k.inp.thermo_nstat = 100
    trace = eam_4k.run(100)
    rows = eam_4k.thermo_trace(trace)
    res = compare_traces(rows, golden.rows, natoms=4000, system="eam", precision=8)
    assert res.passed, str(res)
    # f64 100-step values should match the golden log very tightly
    g100 = {r[0]: r for r in golden.rows}[100]
    got = rows[-1]
    assert abs(got[1] - g100[1]) < 0.05, (got, g100)
    assert abs(got[2] - g100[2]) / abs(g100[2]) < 1e-6
    assert int(eam_4k.state.overflow) == 0


def test_eam_grid_cheb_matches_exact():
    """The TPU fast path (dense grid + polynomial-body/exact-tail pair
    tables) vs the exact gather path: in f64, table evaluation error is the
    only difference, and it sits below f32 rounding scale (~5e-7 of the
    force scale — eam_file.build_pair_polys)."""
    import jax

    from minimd_tpu import cells, create
    from minimd_tpu.ops.eam import EAMTables, make_eam_force
    from minimd_tpu.ops.eam_grid import make_eam_force_grid
    from minimd_tpu.state import init_state

    inp = builtin_deck("eam")
    box = create.create_box(6, 6, 6, inp.rho)
    x, v = create.create_atoms(6, 6, 6, inp.rho, box)
    rng = np.random.default_rng(0)
    x = x + rng.normal(0, 0.08, x.shape)  # thermal-ish displacements
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x)
    st = init_state(x, v, np.zeros(len(x), np.int32), geom, dtype=jnp.float64)

    tables = EAMTables.from_funcfl()
    fe, ee, ve = jax.jit(make_eam_force(geom, tables, 1, dtype=jnp.float64))(
        st.x, st.typ)
    fev, fnoev = make_eam_force_grid(geom, tables, 1, dtype=jnp.float64)
    fg, eg, vg = jax.jit(fev)(st.x, st.typ)

    fscale = float(jnp.abs(fe).max())
    assert float(jnp.abs(fg - fe).max()) / fscale < 2e-6
    assert abs(float(eg - ee) / float(ee)) < 1e-8
    assert abs(float(vg - ve) / float(ve)) < 1e-6
    # no-ev variant: same forces, zero energy accumulators
    fg2, eg2, _ = jax.jit(fnoev)(st.x, st.typ)
    np.testing.assert_allclose(np.asarray(fg2), np.asarray(fg))
    assert float(eg2) == 0.0


def test_eam_half_neighbor_matches_full():
    """Newton half-list EAM (ref force_eam.cpp:126-267) must reproduce the
    full-stencil exact path: same forces, energy, virial (f64, both built
    on the exact spline idiom)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minimd_tpu.config import builtin_deck
    from minimd_tpu.sim import Simulation
    from minimd_tpu.ops.eam import EAMTables
    from minimd_tpu.ops.eam_half import make_eam_force_half

    inp = builtin_deck("eam")
    inp.nx = inp.ny = inp.nz = 8
    sim = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    sim.run(5)

    tables = EAMTables.from_funcfl()
    h_ev, h_noev = make_eam_force_half(sim.geom, tables, dtype=jnp.float64)
    f_full, e_full, v_full = jax.jit(sim.force_fn)(sim.state.x, sim.state.typ)
    f_half, e_half, v_half = jax.jit(h_ev)(sim.state.x, sim.state.typ)

    valid = np.asarray(sim.state.valid)
    ff, fh = np.asarray(f_full)[:, valid], np.asarray(f_half)[:, valid]
    scale = np.abs(ff).max()
    assert np.abs(ff - fh).max() / scale < 1e-12
    assert abs(float(e_full) - float(e_half)) / abs(float(e_full)) < 1e-12
    assert abs(float(v_full) - float(v_half)) / abs(float(v_full)) < 1e-12

    # noev variant: same forces, zero accumulators
    f_n, e_n, v_n = jax.jit(h_noev)(sim.state.x, sim.state.typ)
    assert np.abs(np.asarray(f_n)[:, valid] - fh).max() == 0.0
    assert float(e_n) == 0.0 and float(v_n) == 0.0


def test_eam_half_neighbor_full_run():
    """--half_neigh 1 EAM end-to-end: trace matches the full-stencil run."""
    import jax.numpy as jnp
    import numpy as np

    from minimd_tpu.config import builtin_deck
    from minimd_tpu.sim import Simulation

    inp = builtin_deck("eam")
    inp.nx = inp.ny = inp.nz = 6
    sim_f = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    sim_h = Simulation.from_input(inp, dtype=jnp.float64, backend="xla",
                                  half_neigh=True)
    tr_f = sim_f.run(40)
    tr_h = sim_h.run(40)
    np.testing.assert_allclose(tr_h, tr_f, rtol=1e-9, atol=1e-9)


def test_eam_gather_table_kernel_matches_exact():
    """The gather-table pallas kernel (interpret mode) must match the
    exact f64 spline path to the same precision class as the polynomial
    kernel (f32 input rounding dominates both)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minimd_tpu.config import builtin_deck
    from minimd_tpu.sim import Simulation
    from minimd_tpu.ops.eam import EAMTables, make_eam_force
    from minimd_tpu.ops.eam_pallas import make_eam_force_pallas_rows

    inp = builtin_deck("eam")
    inp.nx = inp.ny = inp.nz = 6
    sim = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    sim.run(5)
    geom, typ = sim.geom, sim.state.typ
    tables = EAMTables.from_funcfl()
    x64 = sim.state.x
    x32 = x64.astype(jnp.float32)

    fe, ee, ve = jax.jit(make_eam_force(geom, tables, dtype=jnp.float64))(
        x64, typ)
    r_ev, r_noev = make_eam_force_pallas_rows(geom, tables,
                                              dtype=jnp.float32,
                                              interpret=True)
    fr, er, vr = jax.jit(r_ev)(x32, typ)

    valid = np.asarray(sim.state.valid)
    fe_ = np.asarray(fe)[:, valid]
    fr_ = np.asarray(fr)[:, valid]
    scale = np.abs(fe_).max()
    # bound: f32 position rounding + table error (measured ~3e-5 at 8^3;
    # the polynomial kernel sits at the same scale on identical input)
    assert np.abs(fr_ - fe_).max() / scale < 2e-4
    assert abs(float(er) - float(ee)) / abs(float(ee)) < 1e-5
    assert abs(float(vr) - float(ve)) / abs(float(ve)) < 1e-4

    fn, en, vn = jax.jit(r_noev)(x32, typ)
    assert np.abs(np.asarray(fn)[:, valid] - fr_).max() == 0.0
    assert float(en) == 0.0 and float(vn) == 0.0


def test_eam_fused_pallas_kernel_matches_exact():
    """The fused single-device pallas EAM kernel (periodic wrap in index
    maps, raw-grid packing) must match the exact f64 spline path to the
    f32 table-precision class, interpret mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minimd_tpu.config import builtin_deck
    from minimd_tpu.sim import Simulation
    from minimd_tpu.ops.eam import EAMTables, make_eam_force
    from minimd_tpu.ops.eam_pallas import make_eam_force_pallas

    inp = builtin_deck("eam")
    inp.nx = inp.ny = inp.nz = 6
    sim = Simulation.from_input(inp, dtype=jnp.float64, backend="xla")
    sim.run(5)
    geom, typ = sim.geom, sim.state.typ
    tables = EAMTables.from_funcfl()
    x64 = sim.state.x
    x32 = x64.astype(jnp.float32)

    fe, ee, ve = jax.jit(make_eam_force(geom, tables, dtype=jnp.float64))(
        x64, typ)
    p_ev, p_noev = make_eam_force_pallas(geom, tables, dtype=jnp.float32,
                                         interpret=True)
    fp_, ep, vp = jax.jit(p_ev)(x32, typ)

    valid = np.asarray(sim.state.valid)
    fe_ = np.asarray(fe)[:, valid]
    fp2 = np.asarray(fp_)[:, valid]
    scale = np.abs(fe_).max()
    assert np.abs(fp2 - fe_).max() / scale < 2e-4   # f32 input rounding
    assert abs(float(ep) - float(ee)) / abs(float(ee)) < 1e-5
    assert abs(float(vp) - float(ve)) / abs(float(ve)) < 1e-4

    # xi_src="pack" (own-row coordinates and own-fp sliced from the
    # candidate packs' center lanes — no raw grids in HBM) is the same
    # arithmetic on the same values: bit-identical
    k_ev, _ = make_eam_force_pallas(geom, tables, dtype=jnp.float32,
                                    interpret=True, xi_src="pack")
    fk, ek, vk = jax.jit(k_ev)(x32, typ)
    assert np.abs(np.asarray(fk)[:, valid] - fp2).max() == 0.0
    assert float(ek) == float(ep) and float(vk) == float(vp)

    fn, en, vn = jax.jit(p_noev)(x32, typ)
    assert np.abs(np.asarray(fn)[:, valid] - fp2).max() == 0.0
    assert float(en) == 0.0 and float(vn) == 0.0

    # triple input (sim.TRIPLE_CARRY): tuple of flat (M,) coordinate
    # arrays in, tuple of (M,) forces out — same ops, bit-identical
    assert getattr(p_noev, "accepts_triple", False)
    ft, et, vt = jax.jit(p_noev)((x32[0], x32[1], x32[2]), typ)
    assert isinstance(ft, tuple) and len(ft) == 3
    ft2 = np.stack([np.asarray(c) for c in ft])
    assert np.abs(ft2[:, valid] - np.asarray(fn)[:, valid]).max() == 0.0


def test_embedding_pallas_bit_identical():
    """make_embedding_pallas must reproduce the XLA spline-gather idiom
    (force_eam.cpp:337-347 analog) BIT-FOR-BIT: same rows, same arithmetic
    order — only the gather mechanism differs (128-entry vreg chunks)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minimd_tpu.ops.eam import EAMTables
    from minimd_tpu.ops.eam_pallas import make_embedding_pallas

    tables = EAMTables.from_funcfl()
    rng = np.random.default_rng(7)
    M = 1000   # deliberately not lane-aligned: exercises the pad path
    # span the table range incl. the clamp edges (rho < 0, rho >> rhomax)
    rho = np.concatenate([
        rng.uniform(0.0, tables.nrho * tables.drho, M - 4),
        [-1.0, 0.0, tables.nrho * tables.drho * 2, 1e30],
    ]).astype(np.float32)
    valid = rng.random(M) < 0.9

    frho_sp = jnp.asarray(tables.frho_spline, dtype=jnp.float32)
    rdrho = 1.0 / tables.drho
    nrho = tables.nrho

    def embedding_xla(rho, valid):
        p = rho * rdrho + 1.0
        m = jnp.clip(p.astype(jnp.int32), 1, nrho - 1)
        p = jnp.minimum(p - m.astype(jnp.float32), 1.0)
        fp = (jnp.take(frho_sp[:, 0], m) * p + jnp.take(frho_sp[:, 1], m)) * p \
            + jnp.take(frho_sp[:, 2], m)
        emb = ((jnp.take(frho_sp[:, 3], m) * p + jnp.take(frho_sp[:, 4], m)) * p
               + jnp.take(frho_sp[:, 5], m)) * p + jnp.take(frho_sp[:, 6], m)
        return fp, jnp.where(valid, emb, 0.0)

    rho_j = jnp.asarray(rho)
    valid_j = jnp.asarray(valid)
    fp_ref, emb_ref = jax.jit(embedding_xla)(rho_j, valid_j)

    embed_noev, embed_ev = make_embedding_pallas(tables, M, interpret=True)
    fp_n = jax.jit(embed_noev)(rho_j)
    fp_e, emb_e = jax.jit(embed_ev)(rho_j, valid_j)

    assert np.array_equal(np.asarray(fp_n), np.asarray(fp_ref))
    assert np.array_equal(np.asarray(fp_e), np.asarray(fp_ref))
    assert np.array_equal(np.asarray(emb_e), np.asarray(emb_ref))


def test_pair_poly_merged_tails():
    """The flattened single-polynomial tails must (a) be adopted only where
    they evaluate at least as tightly as the exact spline rows in f32 —
    G1 = rhor'/r has a second-derivative jump at the interior tail knot
    (cubic splines are C2 in value only), so it must keep its rows — and
    (b) track the spline itself within the function's reported max_err
    across the whole tail span (eam_file.build_pair_polys)."""
    from minimd_tpu.eam_file import (_horner_np, _spline_deriv, _spline_value,
                                     build_pair_polys)
    from minimd_tpu.ops.eam import EAMTables

    tabs = EAMTables.from_funcfl()
    p = build_pair_polys(tabs)
    assert p.tail_merged["G1"] is None
    assert p.tail_merged["R"] is not None
    assert p.tail_merged["G2"] is not None
    assert p.tail_merged["P"] is not None

    nr, dr = tabs.nr, tabs.dr
    rhor, z2r = tabs.rhor_spline, tabs.z2r_spline
    fns = {
        "R": lambda r: _spline_value(rhor, nr, dr, r),
        "G2": lambda r: (_spline_deriv(z2r, nr, dr, r) / r**2
                         - _spline_value(z2r, nr, dr, r) / r**3),
        "P": lambda r: _spline_value(z2r, nr, dr, r) / r,
    }
    rs = np.linspace(p.split, p.cut, 5001)
    t = (rs / tabs.dr + 1.0 - p.m0).astype(np.float32)
    xs_body = np.linspace(p.lo, p.split, 50001)
    for name, fn in fns.items():
        exact = fn(rs)
        scale = max(np.abs(fn(xs_body)).max(), np.abs(exact).max())
        got = _horner_np(np.asarray(p.tail_merged[name], np.float32),
                         t).astype(np.float64)
        assert np.abs(got - exact).max() / scale <= p.max_err[name] * 1.01
