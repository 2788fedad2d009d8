"""Spatial decomposition over TPU meshes.

High-level entry point:

    from minimd_tpu.parallel import ShardedSimulation
    ssim = ShardedSimulation.from_input(builtin_deck("lj"), devices=jax.devices())
    trace = ssim.run(100)

mesh.py   — min-surface processor-grid factorization -> jax.sharding.Mesh
step.py   — sharded LJ/EAM run loops (ppermute halos, psum thermo)
comm.py   — atom migration (dim-by-dim leaver buffers + local rebin)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .mesh import make_mesh, min_surface_grid  # noqa: F401


@dataclasses.dataclass
class ShardedSimulation:
    """Multi-device counterpart of Simulation: same deck inputs, state
    sharded over a mesh chosen by min-surface factorization.

    Physics is identical to the single-device path (bit-identical
    temperature traces in the f64 tests); use it when one chip's HBM or
    FLOPs are not enough — capacity weak-scales with devices while halo
    width stays O(cutoff) (SURVEY.md §5.7).
    """

    inp: object
    geom: object
    mesh: object
    run_fn: object
    sharding: object
    natoms: int
    scales: object
    mass: float
    arrays: tuple   # (x, v, f, typ, valid) device arrays, grid-shaped

    @staticmethod
    def from_input(inp, devices=None, *, dtype=None, nbins=None,
                   safe_exchange=False):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .. import cells, create
        from ..config import FORCE_EAM, FORCE_LJ, UNITS_METAL
        from ..ops.lj import LJParams
        from ..ops.lj_grid import make_lj_force_grid
        from ..state import init_state
        from ..units import thermo_scales
        from .step import (local_grid_shape, make_sharded_eam_run,
                           make_sharded_lj_run)

        dtype = dtype or jnp.float32
        devices = list(devices if devices is not None else jax.devices())

        box = create.create_box(inp.nx, inp.ny, inp.nz, inp.rho)
        x_np, v_np = create.create_atoms(inp.nx, inp.ny, inp.nz, inp.rho, box)
        natoms = len(x_np)
        typ_np = create.assign_types(natoms, 1)

        if inp.forcetype == FORCE_EAM:
            from ..ops.eam import EAMTables
            tables = EAMTables.from_funcfl()
            mass, cut = tables.mass, tables.cut
        else:
            tables = None
            mass, cut = 1.0, inp.force_cut

        scales = thermo_scales(inp.units, natoms, box.volume)
        v_np = create.create_velocity(v_np, inp.t_request, natoms, mass,
                                      scales.t_scale)

        grid = min_surface_grid(len(devices), box.prd)
        # cell grid must divide the mesh: snap each dim down to a multiple
        base = cells.choose_grid(box.prd, inp.neigh_cut, nbins)
        nb = tuple(max(g, (b // g) * g) for b, g in zip(base, grid))
        geom = cells.build_geometry(box.prd, inp.neigh_cut, x_np, nbins=nb)
        mesh = make_mesh(devices, box.prd, grid)

        dtforce = 0.5 * inp.dt
        if inp.units == UNITS_METAL:
            dtforce /= scales.mvv2e
        dtforce /= mass

        # --safe_exchange: forward leavers up to half the ring per axis —
        # enough to place an atom arriving from ANY device (the reference's
        # exchange_all, comm.cpp:599-689). Default single hop is guaranteed
        # by the skin-drift bound for normal cadences.
        hops = max(max(mesh.shape.values()) // 2, 1) if safe_exchange else 1

        if inp.forcetype == FORCE_LJ:
            params = LJParams.from_deck(1, inp.epsilon, inp.sigma, inp.force_cut)
            run_fn, sharding = make_sharded_lj_run(
                geom, params, mesh, scales, mass=mass, dt=inp.dt,
                dtforce=dtforce, natoms=natoms,
                neigh_every=inp.neigh_every, dtype=dtype,
                exchange_hops=hops)
            force0 = make_lj_force_grid(geom, params, dtype=dtype)[0]
        else:
            run_fn, sharding = make_sharded_eam_run(
                geom, tables, mesh, scales, mass=mass, dt=inp.dt,
                dtforce=dtforce, natoms=natoms,
                neigh_every=inp.neigh_every, dtype=dtype,
                exchange_hops=hops)
            from ..ops.eam_grid import make_eam_force_grid
            force0 = make_eam_force_grid(geom, tables, dtype=dtype)[0]

        st = init_state(x_np, v_np, typ_np, geom, dtype=dtype)
        f0 = jax.jit(force0)(st.x, st.typ)[0]

        nbx, nby, nbz = geom.nb
        gs = (3, nbz, nby, nbx, geom.capacity)
        gs1 = (nbz, nby, nbx, geom.capacity)
        sh1 = NamedSharding(mesh, P("z", "y", "x", None))
        arrays = (
            jax.device_put(np.asarray(st.x).reshape(gs), sharding),
            jax.device_put(np.asarray(st.v).reshape(gs), sharding),
            jax.device_put(np.asarray(f0).reshape(gs), sharding),
            jax.device_put(np.asarray(st.typ).reshape(gs1), sh1),
            jax.device_put(np.asarray(st.valid).reshape(gs1), sh1),
        )
        return ShardedSimulation(
            inp=inp, geom=geom, mesh=mesh, run_fn=run_fn, sharding=sharding,
            natoms=natoms, scales=scales, mass=mass, arrays=arrays)

    def run(self, ntimes: int):
        """Run ntimes steps; returns the (ntimes, 3) T/U/P trace."""
        import jax
        import numpy as np

        x, v, f, typ, valid, ovf, trace = self.run_fn(*self.arrays, ntimes)
        self.arrays = (x, v, f, typ, valid)
        if int(ovf) > 0:
            raise RuntimeError(f"migration/capacity overflow: {int(ovf)}")
        return np.asarray(jax.device_get(trace))
