"""Multi-device spatial decomposition correctness (virtual 8-device CPU
mesh — the reference's mpirun-on-one-node test mode, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimd_tpu import cells, create
from minimd_tpu.config import builtin_deck
from minimd_tpu.ops.lj import LJParams
from minimd_tpu.ops.lj_grid import make_lj_force_grid
from minimd_tpu.parallel.mesh import make_mesh, min_surface_grid
from minimd_tpu.parallel.step import make_sharded_lj_step
from minimd_tpu.state import init_state
from minimd_tpu.units import thermo_scales


def test_min_surface_grid():
    # cubic box: 8 procs -> 2x2x2 (comm.cpp:86-126 semantics)
    assert sorted(min_surface_grid(8, (10.0, 10.0, 10.0))) == [2, 2, 2]
    assert sorted(min_surface_grid(4, (10.0, 10.0, 10.0))) == [1, 2, 2]
    # elongated box in z: all procs go to z
    px, py, pz = min_surface_grid(4, (10.0, 10.0, 80.0))
    assert pz == 4 and px == py == 1


@pytest.fixture(scope="module")
def shared_system():
    inp = builtin_deck("lj")
    nx = 16
    inp.nx = inp.ny = inp.nz = nx
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    sc = thermo_scales(inp.units, len(x), box.volume)
    v = create.create_velocity(v, inp.t_request, len(x), 1.0, sc.t_scale)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=(8, 8, 8))
    typ = np.zeros(len(x), np.int32)
    st = init_state(x, v, typ, geom, dtype=jnp.float64)
    return inp, box, geom, st, sc


def test_sharded_step_matches_single_device(shared_system):
    """One full MD step on an 8-device mesh must reproduce the single-device
    step bit-for-bit (same adds, same order, modulo psum reduction order)."""
    inp, box, geom, st, sc = shared_system
    natoms = int(st.valid.sum())
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)

    # single-device step (manual): kick-drift, force, kick
    force_ev, _ = make_lj_force_grid(geom, params, dtype=jnp.float64)
    dtf = 0.5 * inp.dt
    f0, e0, w0 = jax.jit(force_ev)(st.x, st.typ)
    v1 = st.v + dtf * f0
    x1 = st.x + inp.dt * v1
    f1, e1, w1 = jax.jit(force_ev)(x1, st.typ)
    v2 = v1 + dtf * f1

    # sharded step from the same initial state
    devices = jax.devices()[:8]
    grid = min_surface_grid(8, box.prd)
    mesh = make_mesh(devices, box.prd, grid)
    step, sharding = make_sharded_lj_step(
        geom, params, mesh, sc, mass=1.0, dt=inp.dt, dtforce=dtf,
        natoms=natoms, dtype=jnp.float64)
    nbx, nby, nbz = geom.nb
    shape = (3, nbz, nby, nbx, geom.capacity)
    xg = jax.device_put(jnp.asarray(st.x).reshape(shape), sharding)
    vg = jax.device_put(jnp.asarray(st.v).reshape(shape), sharding)
    fg = jax.device_put(jnp.asarray(f0).reshape(shape), sharding)
    xg, vg, fg, tup = step(xg, vg, fg)

    np.testing.assert_allclose(np.asarray(xg).reshape(3, -1), np.asarray(x1),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(fg).reshape(3, -1), np.asarray(f1),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vg).reshape(3, -1), np.asarray(v2),
                               rtol=1e-12, atol=1e-13)
    # thermo: sharded psum vs single-device reductions
    t_single = float(jnp.sum(v2 * v2) * sc.t_scale)
    u_single = float(e1) * sc.e_scale / natoms
    assert abs(float(tup[0]) - t_single) < 1e-9
    assert abs(float(tup[1]) - u_single) < 1e-9


def test_dryrun_entrypoints():
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "_graft", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out[0])))
    mod.dryrun_multichip(8)


def test_sharded_full_run_with_migration(shared_system):
    """60 steps on an 8-device mesh, crossing two reneighbor/migration
    events: the temperature trace must match the single-device run to
    machine precision (same pair sums, same adds), atoms conserved."""
    from minimd_tpu.parallel.step import make_sharded_lj_run
    from minimd_tpu.sim import Simulation
    from minimd_tpu.config import builtin_deck
    from jax.sharding import NamedSharding, PartitionSpec as P

    inp, box, geom, st, sc = shared_system
    natoms = int(st.valid.sum())
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)

    sim = Simulation.from_input(
        builtin_deck("lj").__class__(**{**inp.__dict__}), dtype=jnp.float64,
        nbins=(8, 8, 8), backend="xla")
    tr1 = sim.run(60)

    mesh = make_mesh(jax.devices()[:8], box.prd, (2, 2, 2))
    run, _ = make_sharded_lj_run(
        geom, params, mesh, sc, mass=1.0, dt=inp.dt, dtforce=0.5 * inp.dt,
        natoms=natoms, neigh_every=inp.neigh_every, dtype=jnp.float64)

    nbx, nby, nbz = geom.nb
    gs = (3, nbz, nby, nbx, geom.capacity)
    gs1 = (nbz, nby, nbx, geom.capacity)
    f0 = jax.jit(make_lj_force_grid(geom, params, dtype=jnp.float64)[0])(
        st.x, st.typ)[0]
    shard = NamedSharding(mesh, P(None, "z", "y", "x"))
    shard1 = NamedSharding(mesh, P("z", "y", "x", None))
    args = [jax.device_put(np.asarray(a).reshape(gs), shard)
            for a in (st.x, st.v, f0)]
    targ = jax.device_put(np.asarray(st.typ).reshape(gs1), shard1)
    varg = jax.device_put(np.asarray(st.valid).reshape(gs1), shard1)

    xg, vg, fg, tg, okg, ovf, tr8 = run(*args, targ, varg, 60)
    assert int(np.asarray(ovf).sum()) == 0
    assert int(np.asarray(okg).sum()) == natoms
    np.testing.assert_allclose(np.asarray(tr8)[:, 0], tr1[:, 0],
                               rtol=1e-13, atol=0)


def test_sharded_eam_run_with_fp_halo(shared_system):
    """Sharded EAM: the embedding-derivative halo between force passes
    (the reference's mid-force communicate, force_eam.cpp:851-887) must
    reproduce single-device dynamics across migrations."""
    from minimd_tpu import cells, create
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.ops.eam import EAMTables
    from minimd_tpu.ops.eam_grid import make_eam_force_grid
    from minimd_tpu.parallel.step import make_sharded_eam_run
    from minimd_tpu.state import init_state
    from minimd_tpu.units import thermo_scales
    from jax.sharding import NamedSharding, PartitionSpec as P

    inp = builtin_deck("eam")
    nx = 12
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    tables = EAMTables.from_funcfl()
    sc = thermo_scales(1, len(x), box.volume)
    v = create.create_velocity(v, inp.t_request, len(x), tables.mass, sc.t_scale)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=(6, 6, 6))
    st = init_state(x, v, np.zeros(len(x), np.int32), geom, dtype=jnp.float64)
    dtf = 0.5 * inp.dt / sc.mvv2e / tables.mass

    force = make_eam_force_grid(geom, tables, dtype=jnp.float64)[0]
    force_j = jax.jit(force)
    f0 = force_j(st.x, st.typ)[0]
    xx, vv, ff, tt = st.x, st.v, f0, st.typ
    ts = []
    for i in range(45):
        vv = vv + dtf * ff
        xx = xx + inp.dt * vv
        if (i + 1) % inp.neigh_every == 0:
            xx, vv, tt, _ = cells.rebin_lean(xx, vv, tt, geom)
        ff, _, _ = force_j(xx, tt)
        vv = vv + dtf * ff
        ts.append(float(jnp.sum(vv * vv)) * tables.mass * sc.t_scale)

    mesh = make_mesh(jax.devices()[:8], box.prd, (2, 2, 2))
    run, sharding = make_sharded_eam_run(
        geom, tables, mesh, sc, mass=tables.mass, dt=inp.dt, dtforce=dtf,
        natoms=len(x), neigh_every=inp.neigh_every, nstat=1,
        dtype=jnp.float64)
    nbx, nby, nbz = geom.nb
    gs = (3, nbz, nby, nbx, geom.capacity)
    gs1 = (nbz, nby, nbx, geom.capacity)
    sh1 = NamedSharding(mesh, P("z", "y", "x", None))
    args = [jax.device_put(np.asarray(a).reshape(gs), sharding)
            for a in (st.x, st.v, f0)]
    targ = jax.device_put(np.asarray(st.typ).reshape(gs1), sh1)
    varg = jax.device_put(np.asarray(st.valid).reshape(gs1), sh1)
    *_, okg, ovf, tr8 = run(*args, targ, varg, 45)
    assert int(np.asarray(ovf).sum()) == 0
    assert int(np.asarray(okg).sum()) == len(x)
    np.testing.assert_allclose(np.asarray(tr8)[:, 0], np.array(ts),
                               rtol=1e-11, atol=0)


def test_sharded_simulation_api():
    """High-level multi-chip API: both force styles over an 8-device mesh."""
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.parallel import ShardedSimulation

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 16
    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                        dtype=jnp.float64)
    assert dict(ssim.mesh.shape) == {"z": 2, "y": 2, "x": 2}
    tr = ssim.run(40)
    assert np.all(np.isfinite(tr))

    # same physics as the single-device Simulation (bit-level temperature)
    from minimd_tpu.sim import Simulation
    sim = Simulation.from_input(inp, dtype=jnp.float64,
                                nbins=ssim.geom.nb, backend="xla")
    tr1 = sim.run(40)
    np.testing.assert_allclose(tr[:, 0], tr1[:, 0], rtol=1e-12, atol=0)


def test_multihop_halo_force_matches_single_device():
    """Multi-hop halos (reference need[]>1, comm.cpp:150-180): with
    binsize < cutneigh the stencil reaches h=2 cells; on a mesh where a
    device's span is a single cell the halo must be stitched from TWO ring
    neighbors per direction. Forces must be bit-identical to the
    single-device evaluation of the same geometry, and that evaluation in
    turn must match the natural (h=1) binning — same pair set either way."""
    inp = builtin_deck("lj")
    nx = 8
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    sc = thermo_scales(inp.units, len(x), box.volume)
    v = create.create_velocity(v, inp.t_request, len(x), 1.0, sc.t_scale)
    typ = np.zeros(len(x), np.int32)
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)

    from minimd_tpu.ops.pairgrid import halo_extent

    # h=1 natural binning: physics anchor
    geom1 = cells.build_geometry(box.prd, inp.neigh_cut, x)
    st1 = init_state(x, v, typ, geom1, dtype=jnp.float64)
    f1, e1, w1 = jax.jit(make_lj_force_grid(geom1, params, dtype=jnp.float64)[0])(
        st1.x, st1.typ)

    # h=2 fine binning (binsize < cutneigh)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=(6, 6, 6))
    assert halo_extent(geom) == 2
    st = init_state(x, v, typ, geom, dtype=jnp.float64)
    fref, eref, wref = jax.jit(
        make_lj_force_grid(geom, params, dtype=jnp.float64)[0])(st.x, st.typ)
    # energy/virial are pure pair sums: identical pair set across binnings
    assert abs(float(eref - e1) / float(e1)) < 1e-12
    assert abs(float(wref - w1) / float(w1)) < 1e-12

    dtf = 0.5 * inp.dt
    nbx, nby, nbz = geom.nb
    shape = (3, nbz, nby, nbx, geom.capacity)
    for grid in ((1, 1, 6), (2, 2, 1)):  # k=2 multi-hop; k=1 thick slab
        ndev = grid[0] * grid[1] * grid[2]
        mesh = make_mesh(jax.devices()[:ndev], box.prd, grid)
        step, sharding = make_sharded_lj_step(
            geom, params, mesh, sc, mass=1.0, dt=inp.dt, dtforce=dtf,
            natoms=len(x), dtype=jnp.float64)
        xg = jax.device_put(jnp.asarray(st.x).reshape(shape), sharding)
        vg = jax.device_put(jnp.asarray(st.v).reshape(shape), sharding)
        f0 = jax.device_put(jnp.asarray(fref).reshape(shape), sharding)
        xg2, vg2, fg2, tup = step(xg, vg, f0)
        # one kick-drift from identical state: recompute the single-device
        # force at the drifted positions for the comparison
        v1 = st.v + dtf * fref
        x1 = st.x + inp.dt * v1
        fd, _, _ = jax.jit(
            make_lj_force_grid(geom, params, dtype=jnp.float64)[0])(x1, st.typ)
        np.testing.assert_allclose(np.asarray(fg2).reshape(3, -1),
                                   np.asarray(fd), rtol=1e-12, atol=1e-12,
                                   err_msg=f"mesh grid {grid}")


def test_multihop_migration_places_teleported_atoms():
    """Multi-hop migration (reference exchange_all, comm.cpp:599-689):
    atoms displaced several device spans must be forwarded ring-style to
    their owner when hops > 1, and fail loudly (overflow) at hops=1."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from minimd_tpu.parallel.comm import make_exchange_rebin

    inp = builtin_deck("lj")
    nx = 16
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    natoms = len(x)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=(8, 8, 8))
    typ = np.zeros(natoms, np.int32)
    st = init_state(x, v, typ, geom, dtype=jnp.float64)

    # teleport every 50th atom by an arbitrary large displacement
    xs = np.asarray(st.x).copy()
    valid0 = np.asarray(st.valid)
    slots = np.flatnonzero(valid0)[::50]
    prd = np.asarray(geom.prd)
    xs[:, slots] = np.mod(
        xs[:, slots] + prd[:, None] * np.array([[0.37], [0.21], [0.43]]), 
        prd[:, None])

    mesh = make_mesh(jax.devices()[:8], box.prd, (8, 1, 1))  # x-ring of 8
    nbx, nby, nbz = geom.nb
    gs = (3, nbz, nby, nbx, geom.capacity)
    gs1 = (nbz, nby, nbx, geom.capacity)
    shard = NamedSharding(mesh, P(None, "z", "y", "x", None))
    sh1 = NamedSharding(mesh, P("z", "y", "x", None))

    def run_with(hops):
        ex = make_exchange_rebin(geom, mesh, jnp.float64, hops=hops)

        @jax.jit
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(None, "z", "y", "x", None),) * 2
                 + (P("z", "y", "x", None),) * 2,
                 out_specs=(P(None, "z", "y", "x", None),) * 2
                 + (P("z", "y", "x", None),) * 2 + (P(),))
        def go(xg, vg, tg, okg):
            sh = xg.shape
            xo, vo, to, oko, ovf = ex(
                xg.reshape(3, -1), vg.reshape(3, -1),
                tg.reshape(-1), okg.reshape(-1))
            return (xo.reshape(sh), vo.reshape(sh), to.reshape(sh[1:]),
                    oko.reshape(sh[1:]),
                    jax.lax.psum(ovf, ("z", "y", "x")))

        xg = jax.device_put(xs.reshape(gs), shard)
        vg = jax.device_put(np.asarray(st.v).reshape(gs), shard)
        tg = jax.device_put(np.asarray(st.typ).reshape(gs1), sh1)
        okg = jax.device_put(valid0.reshape(gs1), sh1)
        return go(xg, vg, tg, okg)

    # hops=4 (half the ring): every teleporter must be placed
    xo, vo, to, oko, ovf = run_with(4)
    assert int(np.asarray(ovf).sum()) == 0
    ok = np.asarray(oko).reshape(-1)
    assert int(ok.sum()) == natoms
    # every occupied slot holds an atom whose cell matches its position
    xflat = np.asarray(xo).reshape(3, -1)
    C = geom.capacity
    from minimd_tpu.cells import coord_to_cell, pbc_wrap

    xw = pbc_wrap(jnp.asarray(xflat), geom.prd)
    cid, _ = coord_to_cell(xw, geom)
    cid = np.asarray(cid)
    slot_cell = np.arange(geom.nslots) // C
    assert np.all(cid[ok] == slot_cell[ok])

    # hops=1 cannot place multi-device movers: loud MOVEMENT overflow
    # (ovf = [movement, capacity, buffer]; neither capacity nor buffer
    # growth can fix this, so the runner raises with the --safe_exchange
    # remedy instead of spinning in the grow loops)
    *_, ovf1 = run_with(1)
    assert int(np.asarray(ovf1)[0]) > 0
    assert int(np.asarray(ovf1)[1]) == 0
    assert int(np.asarray(ovf1)[2]) == 0


def test_sharded_per_type_params_matches_single_device():
    """Per-type LJ tables on the sharded run loop: the neighbor types ride
    the same halo hooks as positions (ref comm.cpp:740-766 ships type in
    border packs); forces must match the single-device per-type kernel."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from minimd_tpu.parallel.step import make_sharded_lj_run

    inp = builtin_deck("lj")
    nx = 16
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    natoms = len(x)
    sc = thermo_scales(inp.units, natoms, box.volume)
    v = create.create_velocity(v, inp.t_request, natoms, 1.0, sc.t_scale)
    typ = create.assign_types(natoms, 2)
    assert typ.max() == 1  # genuinely mixed types

    # genuinely non-uniform tables: type-pair dependent epsilon/sigma
    eps = np.array([1.0, 1.1, 1.1, 0.9])
    sig = np.array([1.0, 1.02, 1.02, 0.98])
    params = LJParams(ntypes=2, epsilon=eps, sigma6=sig ** 6,
                      cutforcesq=np.full(4, inp.force_cut ** 2))
    assert not params.uniform

    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=(8, 8, 8))
    st = init_state(x, v, typ, geom, dtype=jnp.float64)

    # single-device reference trajectory (per-type XLA grid kernel)
    force = jax.jit(make_lj_force_grid(geom, params, dtype=jnp.float64)[0])
    dtf = 0.5 * inp.dt
    f0 = force(st.x, st.typ)[0]
    xx, vv, ff, tt = st.x, st.v, f0, st.typ
    ts = []
    for i in range(30):
        vv = vv + dtf * ff
        xx = xx + inp.dt * vv
        if (i + 1) % inp.neigh_every == 0:
            xx, vv, tt, _ = cells.rebin_lean(xx, vv, tt, geom)
        ff, _, _ = force(xx, tt)
        vv = vv + dtf * ff
        ts.append(float(jnp.sum(vv * vv)) * sc.t_scale)

    mesh = make_mesh(jax.devices()[:8], box.prd, (2, 2, 2))
    run, sharding = make_sharded_lj_run(
        geom, params, mesh, sc, mass=1.0, dt=inp.dt, dtforce=dtf,
        natoms=natoms, neigh_every=inp.neigh_every, nstat=1,
        dtype=jnp.float64)
    nbx, nby, nbz = geom.nb
    gs = (3, nbz, nby, nbx, geom.capacity)
    gs1 = (nbz, nby, nbx, geom.capacity)
    sh1 = NamedSharding(mesh, P("z", "y", "x", None))
    args = [jax.device_put(np.asarray(a).reshape(gs), sharding)
            for a in (st.x, st.v, f0)]
    targ = jax.device_put(np.asarray(st.typ).reshape(gs1), sh1)
    varg = jax.device_put(np.asarray(st.valid).reshape(gs1), sh1)
    *_, okg, ovf, tr8 = run(*args, targ, varg, 30)
    assert int(np.asarray(ovf).sum()) == 0
    assert int(np.asarray(okg).sum()) == natoms
    np.testing.assert_allclose(np.asarray(tr8)[:, 0], np.array(ts),
                               rtol=1e-12, atol=0)


def test_sharded_datafile_init(tmp_path):
    """Data-file init on the sharded path (ref setup.cpp:215-301 under
    MPI): same reader, same trajectory as the single-device data-file
    run."""
    from minimd_tpu.lammps_data import write_lammps_data
    from minimd_tpu.parallel import ShardedSimulation
    from minimd_tpu.sim import Simulation

    inp = builtin_deck("lj")
    nx = 16
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    sc = thermo_scales(inp.units, len(x), box.volume)
    v = create.create_velocity(v, inp.t_request, len(x), 1.0, sc.t_scale)
    path = tmp_path / "16k.data"
    write_lammps_data(path, box, x, v, mass=1.0)

    inp.datafile = str(path)
    sim = Simulation.from_input(inp, dtype=jnp.float64, nbins=(8, 8, 8),
                                backend="xla")
    tr1 = sim.run(40)

    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                        dtype=jnp.float64, nbins=(8, 8, 8))
    assert ssim.natoms == len(x)
    tr8 = ssim.run(40)
    np.testing.assert_allclose(tr8[:, 0], tr1[:, 0], rtol=1e-12, atol=0)


def test_sharded_pallas_backend_matches_xla():
    """The hand-written Pallas pair kernels run per device inside
    shard_map (interpret mode on the CPU mesh): short LJ and EAM runs
    must track the sharded XLA-grid path within f32 summation-order
    noise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from minimd_tpu.parallel.step import make_sharded_eam_run, make_sharded_lj_run

    inp = builtin_deck("lj")
    nx = 16
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    natoms = len(x)
    sc = thermo_scales(inp.units, natoms, box.volume)
    v = create.create_velocity(v, inp.t_request, natoms, 1.0, sc.t_scale)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=(8, 8, 8))
    typ = np.zeros(natoms, np.int32)
    st = init_state(x, v, typ, geom, dtype=jnp.float32)
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)
    f0 = jax.jit(make_lj_force_grid(geom, params, dtype=jnp.float32)[0])(
        st.x, st.typ)[0]

    mesh = make_mesh(jax.devices()[:8], box.prd, (2, 2, 2))
    nbx, nby, nbz = geom.nb
    gs = (3, nbz, nby, nbx, geom.capacity)
    gs1 = (nbz, nby, nbx, geom.capacity)
    sh1 = NamedSharding(mesh, P("z", "y", "x", None))

    traces = {}
    for backend in ("xla", "pallas"):
        run, sharding = make_sharded_lj_run(
            geom, params, mesh, sc, mass=1.0, dt=inp.dt,
            dtforce=0.5 * inp.dt, natoms=natoms,
            neigh_every=inp.neigh_every, nstat=1, dtype=jnp.float32,
            backend=backend)
        args = [jax.device_put(np.asarray(a).reshape(gs), sharding)
                for a in (st.x, st.v, f0)]
        targ = jax.device_put(np.asarray(st.typ).reshape(gs1), sh1)
        varg = jax.device_put(np.asarray(st.valid).reshape(gs1), sh1)
        *_, ovf, tr = run(*args, targ, varg, 4)
        assert int(np.asarray(ovf).sum()) == 0
        traces[backend] = np.asarray(tr)
    np.testing.assert_allclose(traces["pallas"][:, 0], traces["xla"][:, 0],
                               rtol=5e-6)
    np.testing.assert_allclose(traces["pallas"][:, 1], traces["xla"][:, 1],
                               rtol=5e-5)

    # EAM: pallas two-pass with the fp mid-halo through the same hooks
    from minimd_tpu.ops.eam import EAMTables
    from minimd_tpu.ops.eam_grid import make_eam_force_grid

    einp = builtin_deck("eam")
    nx = 12
    ebox = create.create_box(nx, nx, nx, einp.rho)
    ex, ev = create.create_atoms(nx, nx, nx, einp.rho, ebox)
    tables = EAMTables.from_funcfl()
    esc = thermo_scales(1, len(ex), ebox.volume)
    ev = create.create_velocity(ev, einp.t_request, len(ex), tables.mass,
                                esc.t_scale)
    egeom = cells.build_geometry(ebox.prd, einp.neigh_cut, ex,
                                 nbins=(6, 6, 6))
    est = init_state(ex, ev, np.zeros(len(ex), np.int32), egeom,
                     dtype=jnp.float32)
    edtf = 0.5 * einp.dt / esc.mvv2e / tables.mass
    ef0 = jax.jit(make_eam_force_grid(egeom, tables, dtype=jnp.float32)[0])(
        est.x, est.typ)[0]
    emesh = make_mesh(jax.devices()[:8], ebox.prd, (2, 2, 2))
    nbx, nby, nbz = egeom.nb
    egs = (3, nbz, nby, nbx, egeom.capacity)
    egs1 = (nbz, nby, nbx, egeom.capacity)
    esh1 = NamedSharding(emesh, P("z", "y", "x", None))
    etraces = {}
    for backend in ("xla", "pallas"):
        run, sharding = make_sharded_eam_run(
            egeom, tables, emesh, esc, mass=tables.mass, dt=einp.dt,
            dtforce=edtf, natoms=len(ex), neigh_every=einp.neigh_every,
            nstat=1, dtype=jnp.float32, backend=backend)
        args = [jax.device_put(np.asarray(a).reshape(egs), sharding)
                for a in (est.x, est.v, ef0)]
        targ = jax.device_put(np.asarray(est.typ).reshape(egs1), esh1)
        varg = jax.device_put(np.asarray(est.valid).reshape(egs1), esh1)
        *_, ovf, tr = run(*args, targ, varg, 4)
        assert int(np.asarray(ovf).sum()) == 0
        etraces[backend] = np.asarray(tr)
    np.testing.assert_allclose(etraces["pallas"][:, 0], etraces["xla"][:, 0],
                               rtol=5e-6)
    np.testing.assert_allclose(etraces["pallas"][:, 1], etraces["xla"][:, 1],
                               rtol=5e-5)


def test_sharded_pallas_mixed_axis_meshes():
    """Per-axis halo modes of the mixed-fused kernels: meshes that
    decompose only SOME axes must leave the other axes on the in-kernel
    periodic wrap (ops/lj_pallas.py / ops/eam_pallas.py pack_candidates).
    LJ runs on a (4, 2, 1) grid (x columns + y slabs from neighbors,
    z wrapped); EAM on (1, 2, 2) (x wrapped incl. the boundary-image
    column fix, y/z slabs + the fp mid-halo through the same hooks)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from minimd_tpu.parallel.step import make_sharded_eam_run, make_sharded_lj_run

    inp = builtin_deck("lj")
    nx = 16
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    natoms = len(x)
    sc = thermo_scales(inp.units, natoms, box.volume)
    v = create.create_velocity(v, inp.t_request, natoms, 1.0, sc.t_scale)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=(8, 8, 8))
    st = init_state(x, v, np.zeros(natoms, np.int32), geom,
                    dtype=jnp.float32)
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)
    f0 = jax.jit(make_lj_force_grid(geom, params, dtype=jnp.float32)[0])(
        st.x, st.typ)[0]

    mesh = make_mesh(jax.devices()[:8], box.prd, (4, 2, 1))
    nbx, nby, nbz = geom.nb
    gs = (3, nbz, nby, nbx, geom.capacity)
    gs1 = (nbz, nby, nbx, geom.capacity)
    sh1 = NamedSharding(mesh, P("z", "y", "x", None))
    traces = {}
    for backend in ("xla", "pallas"):
        run, sharding = make_sharded_lj_run(
            geom, params, mesh, sc, mass=1.0, dt=inp.dt,
            dtforce=0.5 * inp.dt, natoms=natoms,
            neigh_every=inp.neigh_every, nstat=1, dtype=jnp.float32,
            backend=backend)
        args = [jax.device_put(np.asarray(a).reshape(gs), sharding)
                for a in (st.x, st.v, f0)]
        targ = jax.device_put(np.asarray(st.typ).reshape(gs1), sh1)
        varg = jax.device_put(np.asarray(st.valid).reshape(gs1), sh1)
        *_, ovf, tr = run(*args, targ, varg, 3)
        assert int(np.asarray(ovf).sum()) == 0
        traces[backend] = np.asarray(tr)
    np.testing.assert_allclose(traces["pallas"][:, 0], traces["xla"][:, 0],
                               rtol=5e-6)
    np.testing.assert_allclose(traces["pallas"][:, 1], traces["xla"][:, 1],
                               rtol=5e-5)

    from minimd_tpu.ops.eam import EAMTables
    from minimd_tpu.ops.eam_grid import make_eam_force_grid

    einp = builtin_deck("eam")
    nx = 12
    ebox = create.create_box(nx, nx, nx, einp.rho)
    ex, ev = create.create_atoms(nx, nx, nx, einp.rho, ebox)
    tables = EAMTables.from_funcfl()
    esc = thermo_scales(1, len(ex), ebox.volume)
    ev = create.create_velocity(ev, einp.t_request, len(ex), tables.mass,
                                esc.t_scale)
    egeom = cells.build_geometry(ebox.prd, einp.neigh_cut, ex,
                                 nbins=(6, 6, 6))
    est = init_state(ex, ev, np.zeros(len(ex), np.int32), egeom,
                     dtype=jnp.float32)
    edtf = 0.5 * einp.dt / esc.mvv2e / tables.mass
    ef0 = jax.jit(make_eam_force_grid(egeom, tables, dtype=jnp.float32)[0])(
        est.x, est.typ)[0]
    emesh = make_mesh(jax.devices()[:4], ebox.prd, (1, 2, 2))
    nbx, nby, nbz = egeom.nb
    egs = (3, nbz, nby, nbx, egeom.capacity)
    egs1 = (nbz, nby, nbx, egeom.capacity)
    esh1 = NamedSharding(emesh, P("z", "y", "x", None))
    etraces = {}
    for backend in ("xla", "pallas"):
        run, sharding = make_sharded_eam_run(
            egeom, tables, emesh, esc, mass=tables.mass, dt=einp.dt,
            dtforce=edtf, natoms=len(ex), neigh_every=einp.neigh_every,
            nstat=1, dtype=jnp.float32, backend=backend)
        args = [jax.device_put(np.asarray(a).reshape(egs), sharding)
                for a in (est.x, est.v, ef0)]
        targ = jax.device_put(np.asarray(est.typ).reshape(egs1), esh1)
        varg = jax.device_put(np.asarray(est.valid).reshape(egs1), esh1)
        *_, ovf, tr = run(*args, targ, varg, 3)
        assert int(np.asarray(ovf).sum()) == 0
        etraces[backend] = np.asarray(tr)
    np.testing.assert_allclose(etraces["pallas"][:, 0], etraces["xla"][:, 0],
                               rtol=5e-6)
    np.testing.assert_allclose(etraces["pallas"][:, 1], etraces["xla"][:, 1],
                               rtol=5e-5)


def test_sharded_half_neighbor_matches_full():
    """--half_neigh 1 on the sharded path (the reference's MPI halfneigh +
    ghost-newton mode): Newton j-side accumulations return to their owners
    through the _make_folds ppermute hooks (reverse_communicate,
    comm.cpp:320-361). f64 traces must match the sharded full-stencil
    path to summation-order noise, on meshes that mix decomposed and
    wrapped axes (both fold modes in one program)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from minimd_tpu.parallel.step import make_sharded_eam_run, make_sharded_lj_run

    inp = builtin_deck("lj")
    nx = 16
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    natoms = len(x)
    sc = thermo_scales(inp.units, natoms, box.volume)
    v = create.create_velocity(v, inp.t_request, natoms, 1.0, sc.t_scale)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=(8, 8, 8))
    st = init_state(x, v, np.zeros(natoms, np.int32), geom,
                    dtype=jnp.float64)
    params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)
    f0 = jax.jit(make_lj_force_grid(geom, params, dtype=jnp.float64)[0])(
        st.x, st.typ)[0]

    mesh = make_mesh(jax.devices()[:8], box.prd, (4, 2, 1))
    nbx, nby, nbz = geom.nb
    gs = (3, nbz, nby, nbx, geom.capacity)
    gs1 = (nbz, nby, nbx, geom.capacity)
    sh1 = NamedSharding(mesh, P("z", "y", "x", None))
    traces = {}
    # full stencils, half+gn=1 (Newton folds), half+gn=0 (duplicate
    # boundary pairs at 0.5 weight, NO reverse ppermutes — the
    # reference's `-gn 0`, force_lj.cpp:239-249) [r5]
    for mode in ("full", "half_gn1", "half_gn0"):
        run, sharding = make_sharded_lj_run(
            geom, params, mesh, sc, mass=1.0, dt=inp.dt,
            dtforce=0.5 * inp.dt, natoms=natoms,
            neigh_every=inp.neigh_every, nstat=1, dtype=jnp.float64,
            backend="xla", half_neigh=mode.startswith("half"),
            ghost_newton=mode != "half_gn0")
        args = [jax.device_put(np.asarray(a).reshape(gs), sharding)
                for a in (st.x, st.v, f0)]
        targ = jax.device_put(np.asarray(st.typ).reshape(gs1), sh1)
        varg = jax.device_put(np.asarray(st.valid).reshape(gs1), sh1)
        *_, ovf, tr = run(*args, targ, varg, 4)
        assert int(np.asarray(ovf).sum()) == 0
        traces[mode] = np.asarray(tr)
    np.testing.assert_allclose(traces["half_gn1"], traces["full"],
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(traces["half_gn0"], traces["full"],
                               rtol=1e-12, atol=1e-12)

    from minimd_tpu.ops.eam import EAMTables
    from minimd_tpu.ops.eam_grid import make_eam_force_grid

    einp = builtin_deck("eam")
    nx = 12
    ebox = create.create_box(nx, nx, nx, einp.rho)
    ex, ev = create.create_atoms(nx, nx, nx, einp.rho, ebox)
    tables = EAMTables.from_funcfl()
    esc = thermo_scales(1, len(ex), ebox.volume)
    ev = create.create_velocity(ev, einp.t_request, len(ex), tables.mass,
                                esc.t_scale)
    egeom = cells.build_geometry(ebox.prd, einp.neigh_cut, ex,
                                 nbins=(6, 6, 6))
    est = init_state(ex, ev, np.zeros(len(ex), np.int32), egeom,
                     dtype=jnp.float64)
    edtf = 0.5 * einp.dt / esc.mvv2e / tables.mass
    ef0 = jax.jit(make_eam_force_grid(egeom, tables, dtype=jnp.float64)[0])(
        est.x, est.typ)[0]
    emesh = make_mesh(jax.devices()[:4], ebox.prd, (1, 2, 2))
    nbx, nby, nbz = egeom.nb
    egs = (3, nbz, nby, nbx, egeom.capacity)
    egs1 = (nbz, nby, nbx, egeom.capacity)
    esh1 = NamedSharding(emesh, P("z", "y", "x", None))
    etraces = {}
    for half in (False, True):
        run, sharding = make_sharded_eam_run(
            egeom, tables, emesh, esc, mass=tables.mass, dt=einp.dt,
            dtforce=edtf, natoms=len(ex), neigh_every=einp.neigh_every,
            nstat=1, dtype=jnp.float64, backend="xla", half_neigh=half)
        args = [jax.device_put(np.asarray(a).reshape(egs), sharding)
                for a in (est.x, est.v, ef0)]
        targ = jax.device_put(np.asarray(est.typ).reshape(egs1), esh1)
        varg = jax.device_put(np.asarray(est.valid).reshape(egs1), esh1)
        *_, ovf, tr = run(*args, targ, varg, 3)
        assert int(np.asarray(ovf).sum()) == 0
        etraces[half] = np.asarray(tr)
    # EAM's Newton folds reorder the f64 rho/force accumulations, so the
    # traces agree to amplified summation noise, not bit-exactly (measured
    # T rel diff ~6e-9 after 3 steps)
    np.testing.assert_allclose(etraces[True][:, 0], etraces[False][:, 0],
                               rtol=1e-7)
    np.testing.assert_allclose(etraces[True][:, 1], etraces[False][:, 1],
                               rtol=1e-7)
    np.testing.assert_allclose(etraces[True][:, 2], etraces[False][:, 2],
                               rtol=1e-6)


def test_sharded_eam_h2_thick_slab_halo():
    """Sharded EAM on a fine grid (binsize < cutneigh -> h=2 stencil):
    2-cell-thick halo slabs AND the fp mid-force halo at h=2 must
    reproduce single-device dynamics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from minimd_tpu.ops.eam import EAMTables
    from minimd_tpu.ops.eam_grid import make_eam_force_grid
    from minimd_tpu.ops.pairgrid import halo_extent
    from minimd_tpu.parallel.step import make_sharded_eam_run

    inp = builtin_deck("eam")
    nx = 8
    box = create.create_box(nx, nx, nx, inp.rho)
    x, v = create.create_atoms(nx, nx, nx, inp.rho, box)
    tables = EAMTables.from_funcfl()
    sc = thermo_scales(1, len(x), box.volume)
    v = create.create_velocity(v, inp.t_request, len(x), tables.mass,
                               sc.t_scale)
    # binsize just under cutneigh: h=2 with a bindist-pruned stencil
    # (keeps the unrolled two-pass EAM graphs small enough for CI)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=(6, 6, 6))
    assert halo_extent(geom) == 2
    st = init_state(x, v, np.zeros(len(x), np.int32), geom,
                    dtype=jnp.float64)
    dtf = 0.5 * inp.dt / sc.mvv2e / tables.mass

    force = jax.jit(make_eam_force_grid(geom, tables, dtype=jnp.float64)[0])
    f0 = force(st.x, st.typ)[0]
    xx, vv, ff, tt = st.x, st.v, f0, st.typ
    ts = []
    for i in range(15):
        vv = vv + dtf * ff
        xx = xx + inp.dt * vv
        if (i + 1) % inp.neigh_every == 0:
            xx, vv, tt, _ = cells.rebin_lean(xx, vv, tt, geom)
        ff, _, _ = force(xx, tt)
        vv = vv + dtf * ff
        ts.append(float(jnp.sum(vv * vv)) * tables.mass * sc.t_scale)

    mesh = make_mesh(jax.devices()[:8], box.prd, (2, 2, 2))
    run, sharding = make_sharded_eam_run(
        geom, tables, mesh, sc, mass=tables.mass, dt=inp.dt, dtforce=dtf,
        natoms=len(x), neigh_every=inp.neigh_every, nstat=1,
        dtype=jnp.float64)
    nbx, nby, nbz = geom.nb
    gs = (3, nbz, nby, nbx, geom.capacity)
    gs1 = (nbz, nby, nbx, geom.capacity)
    sh1 = NamedSharding(mesh, P("z", "y", "x", None))
    args = [jax.device_put(np.asarray(a).reshape(gs), sharding)
            for a in (st.x, st.v, f0)]
    targ = jax.device_put(np.asarray(st.typ).reshape(gs1), sh1)
    varg = jax.device_put(np.asarray(st.valid).reshape(gs1), sh1)
    *_, okg, ovf, tr8 = run(*args, targ, varg, 15)
    assert int(np.asarray(ovf).sum()) == 0
    assert int(np.asarray(okg).sum()) == len(x)
    np.testing.assert_allclose(np.asarray(tr8)[:, 0], np.array(ts),
                               rtol=1e-11, atol=0)


def test_sharded_run_timed_global_thermo_cadence():
    """run_timed dispatches the scan in per-interval chunks; evflag/thermo
    gating must key on GLOBAL step numbers, or thermo steps landing
    mid-chunk (nstat not a multiple of neigh_every) print zeroed rows."""
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.parallel import ShardedSimulation
    from minimd_tpu.sim import Simulation
    from minimd_tpu.timer import Timer

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    inp.neigh_every = 20
    inp.thermo_nstat = 50
    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                        dtype=jnp.float64)
    trace = ssim.run_timed(Timer(), 100)
    rows = ssim.thermo_trace(trace)
    assert [int(r[0]) for r in rows] == [0, 50, 100]
    # step 50 lands mid-chunk; its row must carry real thermo, not zeros
    assert all(abs(r[2]) > 1.0 for r in rows)  # U ~ -6.7, never 0

    sim = Simulation.from_input(inp, dtype=jnp.float64, nbins=ssim.geom.nb,
                                backend="xla")
    rows1 = sim.thermo_trace(sim.run(100))
    assert [int(r[0]) for r in rows1] == [0, 50, 100]
    for r, r1 in zip(rows, rows1):
        np.testing.assert_allclose(r[1:], r1[1:], rtol=1e-10, atol=1e-12)


def test_sharded_nstat0_start_end_rows():
    """thermo_nstat = 0 reserves start + end rows (thermo.cpp:49-50,95-99)."""
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.parallel import ShardedSimulation

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    inp.thermo_nstat = 0
    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                        dtype=jnp.float64)
    rows = ssim.thermo_trace(ssim.run(37))
    assert [int(r[0]) for r in rows] == [0, 37]
    assert all(abs(r[2]) > 1.0 for r in rows)


def test_sharded_overflow_grow_and_replay():
    """The sharded runner must recover from a migration capacity overflow
    by growing and replaying (raise-only before; VERDICT r2 item 8).

    Overflow is forced deterministically with physics left intact: cell
    capacity is capped at the t=0 max occupancy, and natural thermal
    fluctuation pushes a cell one past it at the step-45 migration
    (measured, f64 deterministic)."""
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.parallel import ShardedSimulation

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    inp.neigh_every = 5
    probe = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                         dtype=jnp.float64)
    C = probe.geom.capacity
    valid = np.asarray(jax.device_get(probe.arrays[4]))
    cap = int(valid.reshape(-1, C).sum(axis=1).max())

    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                        dtype=jnp.float64, capacity=cap)
    trace = ssim.run(50)
    assert ssim.geom.capacity > cap          # grow-and-replay fired
    valid = np.asarray(jax.device_get(ssim.arrays[4]))
    assert int(valid.sum()) == ssim.natoms
    assert np.all(np.isfinite(trace))
    # physics must match the probe (which had capacity headroom all along)
    tr_ref = probe.run(50)
    np.testing.assert_allclose(trace[:, 0], tr_ref[:, 0], rtol=1e-10)


def test_sharded_migration_buffer_grow_and_replay():
    """Migration-buffer overflow must grow-and-replay like cell-capacity
    overflow (the reference's growsend/growrecv, comm.cpp:887-909;
    VERDICT r3 missing #6).

    A whole-system rigid translation of +0.6 cells in x is physics-
    invariant (PBC) but pushes every boundary cell layer across its
    device face at the first exchange — a 1-slot buffer drops leavers
    (invalid trajectory), so the runner must restore, grow, and replay,
    ending with every atom conserved and physics identical to the same
    translated run with default buffers (f64 deterministic)."""
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.parallel import ShardedSimulation

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    inp.neigh_every = 5

    def translated(**kw):
        sim = ShardedSimulation.from_input(
            inp, devices=jax.devices()[:8], dtype=jnp.float64, **kw)
        xs = np.array(jax.device_get(sim.arrays[0]))
        xs[0] += 0.6 * sim.geom.binsize[0]   # sentinels stay sentinel-huge
        sim.arrays = (jax.device_put(xs, sim.sharding),) + sim.arrays[1:]
        return sim

    ref = translated()
    ssim = translated(exchange_buf_cap=1)
    trace = ssim.run(10)
    assert ssim._buf_cap > 1                 # buffer growth fired
    valid = np.asarray(jax.device_get(ssim.arrays[4]))
    assert int(valid.sum()) == ssim.natoms   # nothing lost
    tr_ref = ref.run(10)
    np.testing.assert_allclose(trace[:, 0], tr_ref[:, 0], rtol=1e-10)


def test_per_device_statistics_swap_sizes():
    """per_device_statistics reports measured per-axis halo-slab sizes —
    the reference's swap-size stats (output.cpp:496-547)."""
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.output import per_device_statistics
    from minimd_tpu.parallel import ShardedSimulation

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                        dtype=jnp.float64)
    stats = per_device_statistics(ssim)
    assert sum(stats["atoms_per_device_list"]) == ssim.natoms
    for ax in ("x", "y", "z"):
        d = stats[f"swap_atoms_{ax}_per_device"]
        # every device ships a nonzero boundary layer in a dense liquid
        assert d["min"] > 0 and d["max"] <= ssim.natoms


def test_sharded_run_timed_survives_regrow():
    """A capacity regrow firing INSIDE run_timed must rebuild the timed
    replay closures (they capture the geometry's shapes; stale ones crash
    on the regrown arrays) and finish with atoms conserved."""
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.parallel import ShardedSimulation
    from minimd_tpu.timer import Timer

    inp = builtin_deck("lj")
    inp.nx = inp.ny = inp.nz = 10
    inp.neigh_every = 5
    probe = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                         dtype=jnp.float64)
    C = probe.geom.capacity
    valid = np.asarray(jax.device_get(probe.arrays[4]))
    cap = int(valid.reshape(-1, C).sum(axis=1).max())

    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                        dtype=jnp.float64, capacity=cap)
    timer = Timer()
    trace = ssim.run_timed(timer, 50, check_exchange=True)
    assert ssim.geom.capacity > cap          # grow fired mid-timed-run
    valid = np.asarray(jax.device_get(ssim.arrays[4]))
    assert int(valid.sum()) == ssim.natoms
    assert np.all(np.isfinite(trace))
    # physics must match the probe (which had capacity headroom all along).
    # Only the FINAL row is comparable: the check_exchange path splits each
    # interval into run(chunk-1)+run(1) and every scan ev-evaluates its own
    # last step, so the raw trace carries extra nonzero rows at interval
    # seams (thermo_trace only ever prints nstat-cadence + final rows).
    tr_ref = probe.run(50)
    np.testing.assert_allclose(trace[-1], tr_ref[-1], rtol=1e-10)


def test_sharded_custom_potential_and_cell_chunk_guard(tmp_path):
    """ShardedSimulation API parity with Simulation (round-3 VERDICT
    missing #3): potential_path must reach the sharded EAM tables (ref
    force_eam.cpp:74-79 coeff init), and the cell_chunk knob — which has
    no sharded backend — must be rejected loudly, not ignored."""
    from minimd_tpu.eam_file import default_potential_path
    from minimd_tpu.parallel import ShardedSimulation
    from minimd_tpu.sim import Simulation

    # a custom potential: the shipped Cu file with a perturbed mass line —
    # enough to change dtforce and the trajectory if it is actually read
    src = open(default_potential_path()).read().splitlines(keepends=True)
    assert "63.550" in src[1]
    src[1] = src[1].replace("63.550", "70.000")
    pot = tmp_path / "Cu_custom.eam"
    pot.write_text("".join(src))

    inp = builtin_deck("eam")
    inp.nx = inp.ny = inp.nz = 8
    ssim = ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                        dtype=jnp.float64,
                                        potential_path=str(pot))
    assert abs(ssim.mass - 70.0) < 1e-12
    sim = Simulation.from_input(inp, dtype=jnp.float64, backend="xla",
                                nbins=ssim.geom.nb,
                                capacity=ssim.geom.capacity,
                                potential_path=str(pot))
    tr_s = ssim.run(10)
    tr_1 = sim.run(10)
    # sharded grid backend evaluates poly pair tables, the single-device
    # f64 reference the exact splines: agreement is physics-level, not bit
    np.testing.assert_allclose(tr_s[:, 0], tr_1[:, 0], rtol=1e-6)

    with pytest.raises(ValueError, match="cell_chunk"):
        ShardedSimulation.from_input(inp, devices=jax.devices()[:8],
                                     dtype=jnp.float64, cell_chunk=32)
