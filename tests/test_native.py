"""Native C++ host runtime must agree bit-for-bit with the Python paths."""

import numpy as np
import pytest

from minimd_tpu import native
from minimd_tpu.config import builtin_deck
from minimd_tpu.create import Box, create_box
from minimd_tpu.rng import GlibcRand, park_miller_velocity_triplet

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_rand_types_matches_python():
    py = GlibcRand(5413).rand_array(5000, 4)
    nat = native.rand_types(5413, 5000, 4)
    assert np.array_equal(py, nat)


def test_create_atoms_matches_python():
    from minimd_tpu import create
    inp = builtin_deck("lj")
    box = create_box(10, 10, 10, inp.rho)
    bounds = (0.0, box.xprd, 0.0, box.yprd, 0.0, box.zprd)
    nat_x, nat_v = native.create_atoms(10, 10, 10, inp.rho, bounds)
    # python reference path (bypass the native fast path)
    i, j, k = create._blocked_site_order(19, 19, 19)
    keep = ((i + j + k) % 2 == 0)
    i, j, k = i[keep], j[keep], k[keep]
    half = 0.5 * (4.0 / inp.rho) ** (1.0 / 3.0)
    xt, yt, zt = half * i, half * j, half * k
    inbox = (xt < box.xprd) & (yt < box.yprd) & (zt < box.zprd)
    i, j, k = i[inbox], j[inbox], k[inbox]
    py_x = np.stack([xt[inbox], yt[inbox], zt[inbox]], axis=1)
    seed = k.astype(np.int64) * 400 + j.astype(np.int64) * 20 + i + 1
    vx, vy, vz = park_miller_velocity_triplet(seed)
    py_v = np.stack([vx, vy, vz], axis=1)
    assert nat_x.shape == py_x.shape
    assert np.array_equal(nat_x, py_x)
    assert np.array_equal(nat_v, py_v)


def test_read_lammps_data_native(tmp_path):
    from minimd_tpu.lammps_data import write_lammps_data
    rng = np.random.default_rng(3)
    x = rng.random((500, 3)) * 10
    v = rng.standard_normal((500, 3))
    box = Box(10.0, 10.0, 10.0)
    p = tmp_path / "t.data"
    write_lammps_data(p, box, x, v, mass=63.55)
    nbox, nx, nv, nmass = native.read_lammps_data(p)
    assert np.allclose(nx, x, atol=0, rtol=0)
    assert np.allclose(nv, v, atol=0, rtol=0)
    assert nmass == 63.55
    assert np.allclose(nbox, [10, 10, 10])
