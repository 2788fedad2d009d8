"""Cell pipeline unit tests: binning, offsets, local rebin equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimd_tpu import cells, create
from minimd_tpu.config import builtin_deck
from minimd_tpu.state import init_state


def _system(s=10, perturb=0.0, seed=1):
    inp = builtin_deck("lj")
    box = create.create_box(s, s, s, inp.rho)
    x, v = create.create_atoms(s, s, s, inp.rho, box)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x)
    typ = create.assign_types(len(x), 4)
    st = init_state(x, v, typ, geom, dtype=jnp.float32)
    if perturb:
        rng = np.random.default_rng(seed)
        dx = rng.normal(0, perturb, (3, geom.nslots)).astype(np.float32)
        st = st._replace(x=st.x + jnp.asarray(dx) * st.valid)
    return geom, st


def test_rebin_local_matches_sort_rebin():
    """The one-hot local rebin must assign the identical atom set to every
    cell, with bit-identical coordinates (it is an exact permutation)."""
    geom, st = _system(perturb=0.8)
    x1, v1, t1, o1 = jax.jit(lambda a, b, c: cells.rebin_lean(a, b, c, geom))(
        st.x, st.v, st.typ)
    x2, v2, t2, o2 = jax.jit(lambda a, b, c: cells.rebin_local(a, b, c, geom))(
        st.x, st.v, st.typ)
    assert int(o1) == 0 and int(o2) == 0
    C = geom.capacity
    x1n, x2n = np.asarray(x1), np.asarray(x2)
    v1n, v2n = np.asarray(v1), np.asarray(v2)
    t1n, t2n = np.asarray(t1), np.asarray(t2)
    for c in range(geom.ncells):
        sl = slice(c * C, (c + 1) * C)
        m1 = x1n[0, sl] < 1e5
        m2 = x2n[0, sl] < 1e5
        rows1 = sorted(map(tuple, np.concatenate(
            [x1n[:, sl].T[m1], v1n[:, sl].T[m1], t1n[sl][m1, None]], axis=1)))
        rows2 = sorted(map(tuple, np.concatenate(
            [x2n[:, sl].T[m2], v2n[:, sl].T[m2], t2n[sl][m2, None]], axis=1)))
        assert rows1 == rows2, f"cell {c} contents differ"


def test_rebin_local_detects_teleporters():
    """Atoms that moved more than one cell must be counted, not lost silently."""
    geom, st = _system()
    # teleport one atom by half the box
    x = st.x.at[0, 0].add(float(geom.prd[0]) * 0.5)
    _, _, _, ovf = jax.jit(lambda a, b, c: cells.rebin_local(a, b, c, geom))(
        x, st.v, st.typ)
    assert int(ovf) >= 1


def test_grid_offset_declares_clearance():
    geom, _ = _system()
    # with the clearance-chosen offset, no atom sits on a cell boundary
    inp = builtin_deck("lj")
    box = create.create_box(10, 10, 10, inp.rho)
    x, _ = create.create_atoms(10, 10, 10, inp.rho, box)
    bs = np.asarray(geom.binsize)
    r = np.mod(x - np.asarray(geom.offset), bs)
    clear = np.minimum(r, bs - r).min()
    assert clear > 1e-3 * bs.min()


@pytest.mark.parametrize("nbins", [None, (6, 6, 6)])
def test_rebin_pallas_matches_rebin_local(nbins):
    """The Pallas rebin kernel (interpret mode on CPU) must reproduce
    cells.rebin_local bit-for-bit: same candidate ordering, same one-hot
    pull, same sentinel restoration. The default grid has C=48 (LANE=256,
    the one-hot contraction branch); the (6,6,6) grid has C=24 (LANE=128,
    the srcl+gather branch)."""
    import jax

    from minimd_tpu import create
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.ops.rebin_pallas import make_rebin_pallas
    from minimd_tpu.state import init_state

    inp = builtin_deck("lj")
    n = 8
    box = create.create_box(n, n, n, inp.rho)
    x, v = create.create_atoms(n, n, n, inp.rho, box)
    geom = cells.build_geometry(box.prd, inp.neigh_cut, x, nbins=nbins)
    st = init_state(x, v, np.zeros(len(x), np.int32), geom,
                    dtype=jnp.float32)
    rng = np.random.default_rng(7)
    xd = st.x + jnp.asarray(0.12 * np.sign(rng.normal(size=st.x.shape)),
                            jnp.float32)

    xr, vr, tr, ov = cells.rebin_local(xd, st.v, st.typ, geom)
    rp = jax.jit(make_rebin_pallas(geom, interpret=True))
    xp, vp, tp, op = rp(xd, st.v, st.typ)
    assert int(ov) == int(op)
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(xp))
    np.testing.assert_array_equal(np.asarray(vr), np.asarray(vp))
    np.testing.assert_array_equal(np.asarray(tr), np.asarray(tp))

    # triple form (sim.TRIPLE_CARRY reneigh path): tuple-of-(M,) in,
    # tuple-of-(M,) out, bit-identical to the stacked form
    assert rp.__wrapped__.accepts_triple
    x3, v3, t3, o3 = jax.jit(rp.__wrapped__)(
        tuple(xd[d] for d in range(3)),
        tuple(st.v[d] for d in range(3)), st.typ)
    assert int(o3) == int(ov)
    for d in range(3):
        np.testing.assert_array_equal(np.asarray(xr[d]), np.asarray(x3[d]))
        np.testing.assert_array_equal(np.asarray(vr[d]), np.asarray(v3[d]))
    np.testing.assert_array_equal(np.asarray(tr), np.asarray(t3))

    # uniform-type kernel (typ channel dropped, reconstructed from
    # occupancy): bit-identical when every atom shares one type
    rp_u = jax.jit(make_rebin_pallas(geom, interpret=True, uniform_typ=0))
    xu, vu, tu, ou = rp_u(xd, st.v, st.typ)
    assert int(ou) == int(ov)
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(xu))
    np.testing.assert_array_equal(np.asarray(vr), np.asarray(vu))
    np.testing.assert_array_equal(np.asarray(tr), np.asarray(tu))
