"""DYNAMO funcfl EAM potential: file reader, regrid, cubic-spline tables.

Host-side NumPy port of the reference's table pipeline
(ref/force_eam.cpp:505-793): read_file -> file2array -> array2spline.
All arrays are kept 1-indexed like the reference (row 0 unused) so the
spline-lookup indices `m = int(r*rdr + 1)` match exactly.

The spline layout here is 2-D (n+1, 7) instead of the reference's
64-aligned flat arrays — alignment is the allocator's business, not the
math's. z2r units: 27.2*0.529 * zri * zrj (Hartree*Bohr -> eV*Angstrom,
force_eam.cpp:725).
"""

from __future__ import annotations

import dataclasses
import pathlib

import numpy as np


@dataclasses.dataclass
class Funcfl:
    mass: float
    nrho: int
    drho: float
    nr: int
    dr: float
    cut: float
    frho: np.ndarray  # (nrho+1,) 1-indexed
    rhor: np.ndarray  # (nr+1,)
    zr: np.ndarray    # (nr+1,)


def read_funcfl(path: str | pathlib.Path) -> Funcfl:
    """Parse a single-element DYNAMO funcfl file (force_eam.cpp:505-582)."""
    toks: list[str] = []
    lines = pathlib.Path(path).read_text().splitlines()
    # line 0: comment; line 1: atomic number, mass; line 2: grid header
    mass = float(lines[1].split()[1])
    nrho, drho, nr, dr, cut = lines[2].split()[:5]
    nrho, nr = int(nrho), int(nr)
    drho, dr, cut = float(drho), float(dr), float(cut)
    for ln in lines[3:]:
        toks.extend(ln.split())
    vals = np.array([float(t) for t in toks[: nrho + 2 * nr]], dtype=np.float64)
    frho = np.concatenate([[0.0], vals[:nrho]])
    zr = np.concatenate([[0.0], vals[nrho: nrho + nr]])
    rhor = np.concatenate([[0.0], vals[nrho + nr: nrho + 2 * nr]])
    return Funcfl(mass=mass, nrho=nrho, drho=drho, nr=nr, dr=dr, cut=cut,
                  frho=frho, rhor=rhor, zr=zr)


def _lagrange_regrid(src: np.ndarray, src_n: int, src_delta: float,
                     n: int, delta: float) -> np.ndarray:
    """4-point Lagrange interpolation onto a new grid (file2array's inner
    loop, force_eam.cpp:630-644). Returns a 1-indexed (n+1,) array."""
    m = np.arange(1, n + 1)
    r = (m - 1) * delta
    p = r / src_delta + 1.0
    k = np.clip(p.astype(np.int64), 2, src_n - 2)
    p = np.minimum(p - k, 2.0)
    sixth = 1.0 / 6.0
    cof1 = -sixth * p * (p - 1.0) * (p - 2.0)
    cof2 = 0.5 * (p * p - 1.0) * (p - 2.0)
    cof3 = -0.5 * p * (p + 1.0) * (p - 2.0)
    cof4 = sixth * p * (p * p - 1.0)
    out = np.zeros(n + 1)
    out[1:] = (cof1 * src[k - 1] + cof2 * src[k]
               + cof3 * src[k + 1] + cof4 * src[k + 2])
    return out


def file2array(f: Funcfl):
    """Regrid file tables to the working grid and build z2r
    (force_eam.cpp:589-728). For a single funcfl the working grid equals the
    file grid, but the interpolation is reproduced for bit parity."""
    dr, drho = f.dr, f.drho
    rmax = (f.nr - 1) * f.dr
    rhomax = (f.nrho - 1) * f.drho
    nr = int(rmax / dr + 0.5)
    nrho = int(rhomax / drho + 0.5)

    frho = _lagrange_regrid(f.frho, f.nrho, f.drho, nrho, drho)
    rhor = _lagrange_regrid(f.rhor, f.nr, f.dr, nr, dr)
    zri = _lagrange_regrid(f.zr, f.nr, f.dr, nr, dr)
    z2r = np.zeros(nr + 1)
    z2r[1:] = 27.2 * 0.529 * zri[1:] * zri[1:]
    return nrho, drho, nr, dr, frho, rhor, z2r


def array2spline(n: int, delta: float, f: np.ndarray) -> np.ndarray:
    """7-coefficient cubic spline rows (force_eam.cpp:765-793).

    Row m: [0..2] derivative coefficients (scaled by 1/delta),
    [3..5] value-polynomial coefficients, [6] the knot value.
    Returns (n+1, 7); row 0 unused.
    """
    sp = np.zeros((n + 1, 7))
    sp[1:, 6] = f[1: n + 1]

    sp[1, 5] = sp[2, 6] - sp[1, 6]
    sp[2, 5] = 0.5 * (sp[3, 6] - sp[1, 6])
    sp[n - 1, 5] = 0.5 * (sp[n, 6] - sp[n - 2, 6])
    sp[n, 5] = sp[n, 6] - sp[n - 1, 6]
    m = np.arange(3, n - 1)
    sp[m, 5] = ((sp[m - 2, 6] - sp[m + 2, 6])
                + 8.0 * (sp[m + 1, 6] - sp[m - 1, 6])) / 12.0

    m = np.arange(1, n)
    sp[m, 4] = 3.0 * (sp[m + 1, 6] - sp[m, 6]) - 2.0 * sp[m, 5] - sp[m + 1, 5]
    sp[m, 3] = sp[m, 5] + sp[m + 1, 5] - 2.0 * (sp[m + 1, 6] - sp[m, 6])
    sp[n, 4] = 0.0
    sp[n, 3] = 0.0

    sp[1:, 2] = sp[1:, 5] / delta
    sp[1:, 1] = 2.0 * sp[1:, 4] / delta
    sp[1:, 0] = 3.0 * sp[1:, 3] / delta
    return sp


def default_potential_path() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parent.parent / "potentials" / "Cu_u6.eam"


# ---------------------------------------------------------------------------
# Chebyshev compression of the pair-hot spline tables (TPU fast path)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ChebTable:
    """Global Chebyshev fit of one spline function on [lo, hi].

    Evaluated with Clenshaw recurrence using lane-uniform scalar
    coefficients: zero gathers on the TPU VPU. `deriv` holds the exact
    analytic derivative of the fitted polynomial, so energy and force stay
    consistent to machine precision.
    """

    lo: float
    hi: float
    coeffs: tuple        # value coefficients c0..cn
    deriv: tuple         # derivative coefficients
    max_rel_err: float   # fit error vs the exact spline, relative to max|f|


def _spline_value(sp, n, delta, x):
    p = x / delta + 1.0
    m = np.clip(p.astype(np.int64), 1, n - 1)
    p = np.minimum(p - m, 1.0)
    return ((sp[m, 3] * p + sp[m, 4]) * p + sp[m, 5]) * p + sp[m, 6]


def _spline_deriv(sp, n, delta, x):
    p = x / delta + 1.0
    m = np.clip(p.astype(np.int64), 1, n - 1)
    p = np.minimum(p - m, 1.0)
    return (sp[m, 0] * p + sp[m, 1]) * p + sp[m, 2]


def fit_cheb(sp, n, delta, lo, hi, degree=28) -> ChebTable:
    xs = np.linspace(lo, hi, 200001)
    ys = _spline_value(sp, n, delta, xs)
    fit = np.polynomial.chebyshev.Chebyshev.fit(xs, ys, degree, domain=[lo, hi])
    err = float(np.abs(fit(xs) - ys).max() / max(np.abs(ys).max(), 1e-300))
    return ChebTable(
        lo=float(lo), hi=float(hi),
        coeffs=tuple(float(c) for c in fit.coef),
        deriv=tuple(float(c) for c in fit.deriv().coef),
        max_rel_err=err,
    )


# ---------------------------------------------------------------------------
# Exact-to-f32 pair tables: polynomial body + exact spline tail (TPU fast path)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PairPolys:
    """Gather-free evaluation of the four pair-hot EAM functions, exact to
    f32 rounding against the reference spline tables (force_eam.cpp:152-158).

    Functions (the 1/r force factors are absorbed so the kernel needs no
    reciprocal — fpair = -((fp_i + fp_j) * G1 + G2) directly):

        R  (r) = rhor(r)                      density    (pass 1)
        G1 (r) = rhor'(r) / r                 embedding force factor
        G2 (r) = z2r'(r)/r^2 - z2r(r)/r^3     pair force factor
        P  (r) = z2r(r)/r                     pair energy phi (evflag only)

    Two-piece evaluation, selected per pair by r:

      body  r in [lo, split):  degree-`degree` polynomial fit, Horner in the
            scaled variable u = r*u_a + u_b in [-1, 1]. The fit is computed
            in the Chebyshev basis and re-expanded to power form; for these
            smooth functions at degree <=24 the scaled-variable power
            coefficients stay O(1), so f32 Horner loses nothing (verified by
            `max_err`, measured in f32).
      tail  r in [split, cut]: the spline's own last rows, one low-degree
            polynomial per knot interval refit in the local variable
            t = r*rdr + 1 - m in [0, 1) (machine-exact: each row is a cubic
            times smooth 1/r factors). The funcfl data truncates to zero at
            the cutoff with a genuine C1 break there, which no global fit
            can absorb — this tail IS the reference table, so the break is
            reproduced exactly.

            Per-function flattening (`tail_merged`): when ONE polynomial in
            t over the whole [split, cut] span evaluates (in f32, against
            the spline) within the function's overall max_err, the kernel
            uses it instead — same accuracy, ~5 fewer VPU ops per
            candidate lane. For Cu_u6 this holds for R/G2/P (their
            last spline rows are C2-smooth joins) but NOT G1 = rhor'/r,
            whose second derivative jumps at the interior knot (cubic
            splines are only C2 in value), so G1 keeps the exact rows.

    r < lo clamps to the body edge (no physical pairs there: the shipped
    Cu deck never sees r < 2.3 even at 2x temperature; r >= cut is masked
    by the caller).
    """

    lo: float
    split: float
    cut: float
    rdr: float
    u_a: float              # body variable map u = r*u_a + u_b
    u_b: float
    body: dict              # name -> descending power coeffs (floats)
    m0: int                 # spline row of the first tail interval
    nrows: int
    tail: dict              # name -> tuple of per-row descending power coeffs
    # name -> descending coeffs of ONE polynomial in t over [0, nrows]
    # replacing the row chain (only when its f32 error stays within the
    # function's overall max_err), else None
    tail_merged: dict
    max_err: dict           # name -> max |fit - exact| / max|exact|, f32 eval


def _horner_np(coeffs, x):
    acc = np.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


# Starting body degrees per function (measured minimal for Cu_u3) and the
# f64 fit tolerances the adaptive loop raises them toward. The tolerances
# are propagation-aware: R feeds rho -> fp = F'(rho) where errors amplify
# ~100x into forces, so it must sit far below f32 rounding; G1/G2 fit
# error concentrates at the body's upper edge where the r-weighting in
# fpair*d amplifies it ~2x, and dropping them to 18 measurably blows the
# grid-vs-exact force error from 2.8e-7 to 2.4e-6 of force scale despite a
# near-identical max fit error — so they stay at 20 wherever forces are
# validated in FORCE space (CPU/f64/interpret). P errors add coherently
# over all pairs in the potential-energy sum, so it needs the same tight
# tolerance (and only runs on evflag/thermo steps anyway).
_DEFAULT_DEGREE = {"R": 20, "G1": 20, "G2": 20, "P": 20}
_BODY_TOL = {"R": 5e-9, "G1": 1e-6, "G2": 2e-7, "P": 2e-9}
_MAX_DEGREE = 24

# TPU-hardware production degrees, judged at the TRAJECTORY level — the
# reference's own statistical acceptance criterion (run_one_test:121-138),
# the same bar that admitted the LJ nr0 reciprocal. Measured 2026-08-19
# on-chip (scripts/exp_eam_degree.py), 10000-step golden traces:
#   G1/G2=18, R=19: PASS with margin (4k: T 0.030 E 0.079 P 0.287;
#                   16k: T 0.020 E 0.030 P 0.218; bound 0.38)  [+5.8%]
#   G1/G2=16:       FAIL (aggregates 0.46-0.61)
#   G1/G2=14:       FAIL (aggregates 0.72-0.91)
# — EAM trajectories are ~50x more sensitive to the pair tables' coherent
# polynomial bias than LJ is to nr0's quasi-random reciprocal error
# (d16's 4.7e-6-of-scale fit error already fails where nr0's 1.02e-4
# force error passes). The hardware default is therefore exactly the
# lowest PASSING config; CPU validation paths keep the adaptive
# (force-space-exact) fit.
HARDWARE_DEGREE = {"G1": 18, "G2": 18, "R": 19}


def resolve_degree(degree, dtype, interpret: bool = False):
    """Resolve a kernel builder's `degree` argument: None on TPU-hardware
    f32 means the trajectory-validated HARDWARE_DEGREE; "adaptive" forces
    the fit-error-driven default everywhere (the escape hatch, like
    recip="nr1" for LJ); anything else passes through to
    build_pair_polys."""
    import jax
    import jax.numpy as jnp

    if isinstance(degree, str):
        if degree != "adaptive":
            raise ValueError(f"unknown eam degree mode {degree!r}")
        return None
    if (degree is None and dtype == jnp.float32 and not interpret
            and jax.default_backend() != "cpu"):
        return dict(HARDWARE_DEGREE)
    return degree


def build_pair_polys(tables, lo: float = 1.8, split: float | None = None,
                     degree=None, tail_degree: int = 3) -> PairPolys:
    """Fit the four pair functions of an EAMTables instance. `split` must
    sit on a spline knot and leave the truncation kink (the last ~2 rows
    before the cutoff) to the tail; None picks the knot two rows before the
    cutoff.

    `degree`: None fits adaptively from the per-function defaults, raising
    the degree until the f64 fit error reaches `_BODY_TOL` (so the kernel
    spends the minimum Horner ops the potential file allows). An explicit
    int (all functions) or {name: int} dict PINS those functions at
    exactly that degree — no adaptive raise — the throughput-vs-accuracy
    sweep knob (scripts/exp_eam_degree.py; a pinned degree trades fit
    error for Horner ops and must be validated at the TRAJECTORY level,
    the reference's statistical acceptance criterion, like the LJ nr0
    reciprocal was)."""
    nr, dr, cut = tables.nr, tables.dr, tables.cut
    rdr = 1.0 / dr
    rhor, z2r = tables.rhor_spline, tables.z2r_spline
    if split is None:
        split = (int(cut * rdr + 1.0) - 2) * dr
    pinned: set = set()
    if degree is None:
        degree = dict(_DEFAULT_DEGREE)
    elif isinstance(degree, int):
        degree = {name: degree for name in _DEFAULT_DEGREE}
        pinned = set(degree)
    else:
        pinned = set(degree)
        degree = dict(_DEFAULT_DEGREE, **degree)

    fns = {
        "R":  lambda r: _spline_value(rhor, nr, dr, r),
        "G1": lambda r: _spline_deriv(rhor, nr, dr, r) / r,
        "G2": lambda r: (_spline_deriv(z2r, nr, dr, r) / r ** 2
                         - _spline_value(z2r, nr, dr, r) / r ** 3),
        "P":  lambda r: _spline_value(z2r, nr, dr, r) / r,
    }

    u_a = 2.0 / (split - lo)
    u_b = -(split + lo) / (split - lo)
    m0 = int(split * rdr + 1.0 + 0.5)       # split is knot-aligned
    assert abs((m0 - 1) * dr - split) < 1e-9, "split must be a spline knot"
    nrows = int(cut * rdr + 1.0) - m0 + 1   # rows covering [split, cut]

    body, tail, tail_merged, max_err = {}, {}, {}, {}
    xs = np.linspace(lo, split, 200001)
    u64 = xs * u_a + u_b
    u32 = u64.astype(np.float32)
    for name, fn in fns.items():
        ys = fn(xs)
        scale = max(np.abs(ys).max(), 1e-300)
        prev = np.inf
        stale = 0
        for deg in range(degree[name], _MAX_DEGREE + 1):
            fit = np.polynomial.chebyshev.Chebyshev.fit(xs, ys, deg,
                                                        domain=[lo, split])
            power = np.polynomial.polynomial.Polynomial.cast(
                np.polynomial.chebyshev.Chebyshev(fit.coef))  # u, ascending
            coeffs = tuple(float(c) for c in power.coef[::-1])
            if name in pinned:
                break
            # adaptive criterion is the true (f64) fit error: the f32 kernel
            # adds its own rounding on top regardless of degree
            err64 = np.abs(_horner_np(np.asarray(coeffs), u64) - ys).max() \
                / scale
            if err64 <= _BODY_TOL[name]:
                break
            stale = stale + 1 if err64 > 0.5 * prev else 0
            if stale >= 2:      # fit floor (spline roughness), stop paying
                break
            prev = err64
        body[name] = coeffs
        # reported error is what the f32 kernel sees (fit + rounding)
        got = _horner_np(np.asarray(coeffs, np.float32),
                         u32).astype(np.float64)
        err = np.abs(got - ys).max() / scale

        rows = []
        row_err = 0.0
        for k in range(nrows):
            r0, r1 = (m0 + k - 1) * dr, (m0 + k) * dr
            rs = np.linspace(r0, min(r1, cut), 2001)
            t = rs * rdr + 1.0 - (m0 + k)
            yr = fn(rs)
            rfit = np.polynomial.polynomial.Polynomial.fit(
                t, yr, tail_degree, domain=[0.0, 1.0], window=[0.0, 1.0])
            rc = tuple(float(c) for c in rfit.coef[::-1])
            rows.append(rc)
            got = _horner_np(np.asarray(rc, np.float32),
                             t.astype(np.float32)).astype(np.float64)
            row_err = max(row_err, np.abs(got - yr).max() / scale)
        tail[name] = tuple(rows)

        # try to flatten the row chain into ONE polynomial over the whole
        # tail span (in t over [0, nrows]) — accepted only when the f32
        # evaluation error stays within the function's current max_err
        # (the f32 body Horner already rounds at ~2e-7 of scale, so a
        # tighter-than-that tail fit cannot worsen anything; see the class
        # docstring — G1's interior-knot derivative kink keeps the rows)
        rs = np.linspace(split, cut, 20001)
        t = rs * rdr + 1.0 - m0
        yr = fn(rs)
        tail_merged[name] = None
        merged_err = row_err
        for deg in range(tail_degree, 8):
            mfit = np.polynomial.polynomial.Polynomial.fit(
                t, yr, deg, domain=[0.0, float(nrows)],
                window=[0.0, float(nrows)])
            mc = tuple(float(c) for c in mfit.coef[::-1])
            got = _horner_np(np.asarray(mc, np.float32),
                             t.astype(np.float32)).astype(np.float64)
            e = np.abs(got - yr).max() / scale
            if e <= max(row_err, err):
                tail_merged[name] = mc
                merged_err = e
                break
        max_err[name] = float(max(err, merged_err if tail_merged[name]
                                  is not None else row_err))

    return PairPolys(lo=float(lo), split=float(split), cut=float(cut),
                     rdr=float(rdr), u_a=float(u_a), u_b=float(u_b),
                     body=body, m0=m0, nrows=nrows, tail=tail,
                     tail_merged=tail_merged, max_err=max_err)


@dataclasses.dataclass(frozen=True)
class PairRows:
    """Gather-table evaluation of the four pair-hot EAM functions — the
    TPU dynamic-gather alternative to PairPolys' Horner bodies.

    Mosaic's per-lane gather (tpu.dynamic_gather) requires the table to
    fit one vreg along the gather dimension, i.e. <= 128 entries. The grid
    is therefore two-segment piecewise-uniform with n_entries <= 128:

      body  r in [lo, split):   n_body uniform pieces of width h
      tail  r in [split, cut]:  one piece per source spline knot interval
            (split sits on a knot, same as PairPolys), so the funcfl
            truncation kink at the cutoff lands exactly on a piece
            boundary and is reproduced like the reference table
            (force_eam.cpp:152-158)

    Each piece holds a per-function polynomial in the local variable
    t = idxf - floor(idxf) in [0, 1), where idxf is the piecewise-linear
    index map — so index AND local coordinate come out of one fused
    computation. Per-function degrees: R and P errors accumulate
    coherently (rho sums / the energy sum), so they get higher degrees;
    G1/G2 are force factors where the f32 floor dominates. f32 eval errors
    are at rounding scale (measured in max_err; validated end-to-end by
    the force-error test in tests/test_eam.py)."""

    lo: float
    split: float
    cut: float
    inv_h: float              # body: idxf = (r - lo) * inv_h
    rdr: float                # tail: idxf = n_body + (r - split) * rdr
    n_body: int
    n_entries: int
    coeffs: dict              # name -> (degree+1, n_entries) f32, descending
    max_err: dict


_ROWS_DEGREE = {"R": 3, "G1": 3, "G2": 3, "P": 3}


def build_pair_rows(tables, lo: float = 1.8, n_body: int = 125,
                    degree: dict | None = None) -> PairRows:
    nr, dr, cut = tables.nr, tables.dr, tables.cut
    rdr = 1.0 / dr
    rhor, z2r = tables.rhor_spline, tables.z2r_spline
    fns = {
        "R":  lambda r: _spline_value(rhor, nr, dr, r),
        "G1": lambda r: _spline_deriv(rhor, nr, dr, r) / r,
        "G2": lambda r: (_spline_deriv(z2r, nr, dr, r) / r ** 2
                         - _spline_value(z2r, nr, dr, r) / r ** 3),
        "P":  lambda r: _spline_value(z2r, nr, dr, r) / r,
    }
    degree = dict(_ROWS_DEGREE, **(degree or {}))

    # split two knots before the cutoff, like build_pair_polys
    split = (int(cut * rdr + 1.0) - 2) * dr
    h = (split - lo) / n_body
    n_tail = int(round((cut - split) * rdr))
    edges = [lo + k * h for k in range(n_body)]         + [split + j * dr for j in range(n_tail)]
    widths = [h] * n_body + [dr] * n_tail
    n_entries = n_body + n_tail
    assert n_entries <= 128, "gather table must fit one vreg of lanes"

    coeffs, max_err = {}, {}
    for name, fn in fns.items():
        scale = np.abs(fn(np.linspace(lo, cut, 50001))).max()
        deg = degree[name]
        tab = np.zeros((deg + 1, n_entries), np.float64)
        worst = 0.0
        for k, (e, w) in enumerate(zip(edges, widths)):
            r1 = min(e + w, cut)
            rs = np.linspace(e + 1e-12, r1, 801)
            t = (rs - e) / w
            ys = fn(rs)
            c = np.polynomial.polynomial.Polynomial.fit(
                t, ys, deg, domain=[0.0, 1.0], window=[0.0, 1.0]).coef[::-1]
            tab[:, k] = c
            got = _horner_np(np.asarray(c, np.float32),
                             t.astype(np.float32)).astype(np.float64)
            worst = max(worst, np.abs(got - ys).max() / scale)
        coeffs[name] = tab.astype(np.float32)
        max_err[name] = float(worst)

    return PairRows(lo=float(lo), split=float(split), cut=float(cut),
                    inv_h=float(1.0 / h), rdr=float(rdr), n_body=n_body,
                    n_entries=n_entries, coeffs=coeffs, max_err=max_err)
