"""Fused-STEP Pallas TPU kernel for LJ: force + both velocity-Verlet
kicks + the position drift + the next step's candidate re-pack, in ONE
kernel invocation per plain MD step.

Why (r4 measurement): at 864k the plain step is ~19 ms of which the
force kernel is ~17.9 and the rest is XLA glue — the J-pack copy
(~0.45 ms) and the kick/drift/trace elementwise passes (~0.5 ms). This
kernel absorbs that glue: the only XLA left in a plain step is the
lax.cond dispatch. Expected ~+1 ms/step at 864k — the difference
between 1.92x and ~2.02x vs the reference baseline (STATUS.md round-5
agenda has the full derivation).

Phase convention (the pack forces a half-step phase shift): invocation k
receives the scan carry

    J  = pack(x_k)   (3 lane-packed candidate arrays, the kernel input)
    w  = w_k         (the half-kick velocity that drifted INTO x_k,
                      i.e. w_k = v_{k-1} + dtf*f_{k-1})

and computes, per (z, y) cell row,

    f      = F(x_k)            (identical inner loop to ops/lj_pallas)
    v_k    = w_k + dtf*f       (the step-k velocity — thermo reads this)
    w_{k+1} = v_k + dtf*f      (two SEQUENTIAL FMAs: bit-matches the
                                reference's final- then initial-
                                integrate rounding, integrate.cpp:43-81)
    x_{k+1} = x_k + dt*w_{k+1}
    J_{k+1} = pack(x_{k+1})    (in-row sublane rolls + boundary +-prx)

Outputs: J' (3 packed arrays), x' and w' grids, and on ev steps the
eng/vir accumulators plus an in-kernel SUM(v_k^2) accumulator so the
temperature needs no (3, M) velocity output or XLA reduction at all.

The XLA-side `seed` closure performs the interval's first kick+drift
(from the (x, v, f) carry the rebin step maintains) and the initial
pack; the interval's final rebin step keeps today's XLA path — the
fused carry's (x, w) is exactly the (position, half-kick velocity) pair
the existing reneigh_step feeds to rebin + finish. See sim.py wiring.

Sentinel slots stay inert through the fused update: their candidates
are all beyond the cutoff (cells.py keeps sentinels >= 1e3 apart), so
f == 0, w stays 0, and the drift leaves the sentinel position fixed.
The pack's x-boundary +-prx fix on sentinel coordinates keeps them
large — harmless.

Single-device only (the sharded path's halo exchanges need the flat x
between steps; fusing those is a separate project). Reference
semantics: force_lj.cpp:366-449 (force math), integrate.cpp:38-95
(kick order), the pack replicates pairgrid.fused_lane_pack's
pack_candidates bit-for-bit (copies + the boundary image fix).

STATUS: MEASURED NEGATIVE on the r4 v5e toolchain (2026-08-19, 131k
deck, scripts/exp_fused_step.py). Mosaic accepts the kernel and the
physics is right (interpret parity + run()-wiring tests pass, on-chip
sanity checks pass), but the fused step measures ~2.58 ms vs the FULL
plain production loop's 2.46 — the epilogue costs ~0.3 ms/step at 131k
against ~0.17 ms of recoverable glue, and the gap only widens at 864k:
measured THROUGH THE PRODUCTION run() on the r5 toolchain (2026-08-19,
--wired_only, rebin included — the safe A/B): fused 19.92 vs plain
18.49 ms/step, -7.7%. BOTH pack idioms
measure identically (store 2.581 / concat 2.574), so the cost is not
the concat relayout but the epilogue's narrow (nbx, C=40) vector work
(rolls, kick FMAs, 5 output streams) on lanes the force loop never
touches — consistent with the r3 "narrow row ops are ~3x vreg traffic"
finding. Kept in-tree, tested and wired behind the opt-in
Simulation(fused_step=True) flag, for re-measurement as the toolchain
moves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cells import CellGeometry
from .lj import LJParams
from .pairgrid import fused_lane_pack, halo_extent

_BIG = 5.0e5


def _round_up(n, m):
    return (n + m - 1) // m * m


def make_lj_step_pallas(geom: CellGeometry, params: LJParams,
                        dt: float, dtforce: float,
                        dtype=jnp.float32, interpret: bool = False,
                        recip: str | None = None, pack_mode: str = "concat"):
    """Build the fused-step closures.

    Returns (step_ev, step_noev, seed):

    - seed(x, v, f) -> (J, xg, wg): XLA half-step — w = v + dtf*f,
      x' = x + dt*w, J = pack(x') — producing the fused carry. Runs once
      per reneigh interval (amortized).
    - step_*(J, xg, wg) -> (J', xg', wg', eng, vir, vsq): one fused MD
      step. xg is accepted for carry-shape symmetry and ignored (the
      kernel reads its own row's coordinates from J's center lanes —
      bit-identical, the pack is a copy). noev returns zero eng/vir/vsq
      so the lax.cond operands match.

    eng is the raw ordered-pair sum * 4*eps (as ops/lj_pallas), vir the
    0.5-scaled virial, vsq = sum over atoms of v_k . v_k (temperature =
    vsq * mass * t_scale factors — XLA scalar epilogue).
    """
    assert params.uniform, "fused-step LJ kernel requires uniform params"
    assert dtype == jnp.float32, "fused-step LJ kernel is f32"
    if recip is None:
        recip = "nr2" if interpret else "nr0"   # match ops/lj_pallas
    h = halo_extent(geom)
    assert h == 1, "fused-step LJ kernel assumes binsize >= cutneigh"

    nbx, nby, nbz = geom.nb
    C = geom.capacity
    M = nbx * nby * nbz * C
    LANE = _round_up(3 * C, 128)
    cutsq = float(params.cutforcesq[0])
    eps = float(params.epsilon[0])
    sig6 = float(params.sigma6[0])
    prx, pry, prz = (float(p) for p in geom.prd)
    dt_c = float(dt)
    dtf_c = float(dtforce)

    # single-device: periodic wrap rides the BlockSpec index maps
    _dec, pack_candidates, wrapped_specs = fused_lane_pack(
        (nbx, nby, nbz), C, LANE, geom.prd, None, _BIG)

    def _roll_lr(xp, c):
        """The [x-1] and [x+1] blocks of the re-pack: sublane rolls
        (non-negative shifts) + the +-prx image fix on the wrap rows for
        c == 0. Bit-identical values to pack_candidates' slices."""
        lf = jnp.roll(xp, 1, axis=0)          # row x gets xp[x-1]
        rt = jnp.roll(xp, nbx - 1, axis=0)    # row x gets xp[x+1]
        if c == 0:
            sub = jax.lax.broadcasted_iota(jnp.int32, (nbx, C), 0)
            lf = jnp.where(sub == 0, lf - prx, lf)
            rt = jnp.where(sub == nbx - 1, rt + prx, rt)
        return lf, rt

    def _emit_pack(ref, xp, c):
        """Write the (nbx, LANE) candidate row [x-1 | x | x+1 | _BIG pad]
        for one coordinate. pack_mode picks the Mosaic idiom:

        - "concat": build the row with one lane concatenate, one store.
          Measured on v5e at 131k: the fused step runs 2.580 ms vs the
          plain production loop's 2.468 — the concat of rolled narrow
          (nbx, 40) vectors costs MORE than the XLA glue the fusion
          removes (the r3 prologue-pack negative, epilogue edition).
        - "store": three lane-offset sub-block stores (no concat); lane
          offsets C and 2C are not 128-aligned, so this probes Mosaic's
          unaligned masked-store path instead of the concat relayout.
        """
        lf, rt = _roll_lr(xp, c)
        if pack_mode == "concat":
            parts = [lf, xp, rt]
            if LANE > 3 * C:
                parts.append(jnp.full((nbx, LANE - 3 * C), _BIG, xp.dtype))
            ref[0, 0] = jnp.concatenate(parts, axis=1)
        else:
            ref[0, 0, :, 0:C] = lf
            ref[0, 0, :, C:2 * C] = xp
            ref[0, 0, :, 2 * C:3 * C] = rt
            if LANE > 3 * C:
                ref[0, 0, :, 3 * C:] = jnp.full((nbx, LANE - 3 * C), _BIG,
                                                xp.dtype)

    def kernel(*refs, evflag: bool):
        # refs: 27 packed-candidate rows (coord-major, (dz, dy)
        # row-major) + 3 w rows (nbx, C); outputs 3 J' rows (nbx, LANE),
        # x' (3, nbx, C), w' (3, nbx, C), then eng/vir/vsq (8, 128)
        # accumulators (ev only).
        j_refs = refs[0:27]
        w_refs = refs[27:30]
        jp_refs = refs[30:33]
        xp_ref, wp_ref = refs[33], refs[34]
        if evflag:
            eng_ref, vir_ref, vsq_ref = refs[35], refs[36], refs[37]
        z = pl.program_id(0)
        y = pl.program_id(1)

        if evflag:
            @pl.when((z == 0) & (y == 0))
            def _init():
                eng_ref[...] = jnp.zeros((8, 128), jnp.float32)
                vir_ref[...] = jnp.zeros((8, 128), jnp.float32)
                vsq_ref[...] = jnp.zeros((8, 128), jnp.float32)

        # own-row coordinates from the candidate pack's center block
        xi0 = j_refs[0 * 9 + 4][0, 0][:, C:2 * C]
        xi1 = j_refs[1 * 9 + 4][0, 0][:, C:2 * C]
        xi2 = j_refs[2 * 9 + 4][0, 0][:, C:2 * C]

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 1)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 0)
        self_mask = (lane_i // C == 1) & (lane_i % C == sub_i) & (lane_i < 3 * C)
        self_eps = self_mask.astype(jnp.float32)

        facc0 = jnp.zeros((nbx, C), jnp.float32)
        facc1 = jnp.zeros((nbx, C), jnp.float32)
        facc2 = jnp.zeros((nbx, C), jnp.float32)
        eng = jnp.zeros((), jnp.float32)
        vir = jnp.zeros((), jnp.float32)

        # ---- force at x_k: identical inner loop to ops/lj_pallas ----
        for dz in (-1, 0, 1):
            zs = jnp.where(z + dz < 0, -prz,
                           jnp.where(z + dz >= nbz, prz, 0.0)
                           ).astype(jnp.float32)
            for dy in (-1, 0, 1):
                ys = jnp.where(y + dy < 0, -pry,
                               jnp.where(y + dy >= nby, pry, 0.0)
                               ).astype(jnp.float32)
                k = (dz + 1) * 3 + (dy + 1)
                j0 = j_refs[0 * 9 + k][0, 0][:, None, :]
                j1 = j_refs[1 * 9 + k][0, 0][:, None, :]
                j2 = j_refs[2 * 9 + k][0, 0][:, None, :]
                xi1s = xi1 - ys
                xi2s = xi2 - zs
                d0 = xi0[:, :, None] - j0
                d1 = xi1s[:, :, None] - j1
                d2 = xi2s[:, :, None] - j2
                rsq = d0 * d0 + d1 * d1 + d2 * d2
                mask = rsq < cutsq
                if dz == 0 and dy == 0:
                    mask = mask & ~self_mask[None, :, :]
                    rsq_den = rsq + self_eps[None, :, :]
                else:
                    rsq_den = rsq
                if recip.startswith("nr"):
                    inv = pl.reciprocal(rsq_den, approx=True)
                    for _ in range(int(recip[2:])):
                        inv = inv * (2.0 - rsq_den * inv)
                    sr2 = jnp.where(mask, inv, 0.0)
                else:
                    m = mask.astype(jnp.float32)
                    sr2 = m / rsq_den
                sr6 = sr2 * sr2 * sr2
                if sig6 != 1.0:
                    sr6 = sr6 * sig6
                fc = (sr6 * (48.0 * eps) - (24.0 * eps)) * sr6 * sr2
                facc0 = facc0 + jnp.sum(fc * d0, axis=-1)
                facc1 = facc1 + jnp.sum(fc * d1, axis=-1)
                facc2 = facc2 + jnp.sum(fc * d2, axis=-1)
                if evflag:
                    eng = eng + jnp.sum(sr6 * (sr6 - 1.0))
                    vir = vir + jnp.sum(rsq * fc)

        # ---- epilogue: kicks, drift, re-pack ----
        w0, w1, w2 = (w_refs[c][0, 0] for c in range(3))
        v0 = w0 + dtf_c * facc0        # v_k (reference final integrate)
        v1 = w1 + dtf_c * facc1
        v2 = w2 + dtf_c * facc2
        nw0 = v0 + dtf_c * facc0       # w_{k+1} (next initial integrate)
        nw1 = v1 + dtf_c * facc1
        nw2 = v2 + dtf_c * facc2
        nx0 = xi0 + dt_c * nw0         # x_{k+1}
        nx1 = xi1 + dt_c * nw1
        nx2 = xi2 + dt_c * nw2

        wp_ref[0, 0, 0], wp_ref[1, 0, 0], wp_ref[2, 0, 0] = nw0, nw1, nw2
        xp_ref[0, 0, 0], xp_ref[1, 0, 0], xp_ref[2, 0, 0] = nx0, nx1, nx2
        _emit_pack(jp_refs[0], nx0, 0)
        _emit_pack(jp_refs[1], nx1, 1)
        _emit_pack(jp_refs[2], nx2, 2)

        if evflag:
            vsq = jnp.sum(v0 * v0 + v1 * v1 + v2 * v2)
            cell = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                    == z % 8) & (
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == y % 128)
            eng_ref[...] += jnp.where(cell, eng * (4.0 * eps), 0.0)
            vir_ref[...] += jnp.where(cell, vir * 0.5, 0.0)
            vsq_ref[...] += jnp.where(cell, vsq, 0.0)

    def build(evflag: bool):
        kfn = functools.partial(kernel, evflag=evflag)
        jp_spec = pl.BlockSpec((1, 1, nbx, LANE), lambda z, y: (z, y, 0, 0),
                               memory_space=pltpu.VMEM)
        xw_spec = pl.BlockSpec((3, 1, 1, nbx, C), lambda z, y: (0, z, y, 0, 0),
                               memory_space=pltpu.VMEM)
        wi_spec = pl.BlockSpec((1, 1, nbx, C), lambda z, y: (z, y, 0, 0),
                               memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((8, 128), lambda z, y: (0, 0),
                             memory_space=pltpu.VMEM)
        out_specs = [jp_spec] * 3 + [xw_spec, xw_spec]
        out_shape = [jax.ShapeDtypeStruct((nbz, nby, nbx, LANE), jnp.float32)
                     for _ in range(3)]
        out_shape += [jax.ShapeDtypeStruct((3, nbz, nby, nbx, C),
                                           jnp.float32)] * 2
        if evflag:
            out_specs += [sspec] * 3
            out_shape += [jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 3
        call = pl.pallas_call(
            kfn,
            grid=(nbz, nby),
            in_specs=wrapped_specs(3) + [wi_spec] * 3,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )

        def step(J, xg, wg):
            del xg   # the kernel reads x_k from J's center lanes
            args = [J[c] for c in range(3) for _off in range(9)] + list(wg)
            out = call(*args)
            Jp = list(out[0:3])
            xp, wp = out[3], out[4]
            if evflag:
                eng, vir, vsq = (jnp.sum(out[5]), jnp.sum(out[6]),
                                 jnp.sum(out[7]))
            else:
                zero = jnp.zeros((), jnp.float32)
                eng = vir = vsq = zero
            return (Jp, [xp[c] for c in range(3)],
                    [wp[c] for c in range(3)], eng, vir, vsq)

        return step

    def seed(x, v, f):
        """XLA half-step producing the fused carry from the (x, v, f)
        post-rebin carry: one kick + drift + pack per interval."""
        dt_t = jnp.asarray(dt_c, dtype)
        dtf_t = jnp.asarray(dtf_c, dtype)
        w = v + dtf_t * f
        x1 = x + dt_t * w
        g = [x1[c].reshape(nbz, nby, nbx, C) for c in range(3)]
        wg = [w[c].reshape(nbz, nby, nbx, C) for c in range(3)]
        J = [pack_candidates(g[c], c) for c in range(3)]
        return J, g, wg

    return build(True), build(False), seed
