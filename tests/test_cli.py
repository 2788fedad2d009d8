"""CLI driver tests: flag surface, end-to-end runs, sharded path."""

import io
import contextlib

import jax
import pytest

from minimd_tpu.cli import build_parser, main


def _run(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    return buf.getvalue()


def test_parser_accepts_reference_command_lines():
    # the reference harness's exact invocation shape (run_one_test:50)
    p = build_parser()
    a = p.parse_args(["-t", "4", "-s", "16", "-n", "100", "--half_neigh",
                      "0", "-gn", "0", "--yaml_output", "0", "-dm",
                      "-i", "in.lj.miniMD"])
    assert a.size == 16 and a.nsteps == 100


def test_cli_end_to_end_tiny():
    out = _run(["-s", "6", "-n", "20", "--ntypes", "2"])
    assert "# Timestep T U P Time" in out
    assert "PERF_SUMMARY" in out
    # step-0 row is the golden LJ value regardless of size (BASELINE.md)
    assert "0 1.440000e+00" in out


def test_cli_sharded_end_to_end():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    out = _run(["-s", "16", "-n", "20", "--devices", "8"])
    assert "Mesh: {'z': 2, 'y': 2, 'x': 2}" in out
    assert "PERF_SUMMARY" in out
    # step-0 golden row on the sharded path too (harness parity)
    assert "0 1.440000e+00" in out


def test_cli_sharded_timed_yaml(tmp_path, monkeypatch):
    """Sharded harness parity: --timed populates the force/neigh/comm
    buckets in PERF_SUMMARY and --yaml_output writes per-device stats
    (ref output.cpp:203-547 + integrate.cpp:101-107)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.chdir(tmp_path)
    out = _run(["-s", "10", "-n", "40", "--devices", "8", "--timed",
                "--yaml_output", "1", "--yaml_screen"])
    perf = next(l for l in out.splitlines() if "PERF_SUMMARY" in l
                and not l.startswith("#"))
    f = perf.split()
    # devices, threads, nsteps, natoms, t_total, t_force, t_neigh, t_comm
    assert f[0] == "8" and f[2] == "40" and f[3] == "4000"
    assert float(f[5]) > 0 and float(f[6]) > 0 and float(f[7]) > 0
    assert "atoms_per_device" in out and "lost_atoms: 0" in out
    assert "comm:" in out
    # per-device TIME stats from the interval stamps (ref
    # output.cpp:280-475): uniform-by-measurement across devices (SPMD
    # lockstep, stated in the note), with interval distributions
    assert "time_force_per_device" in out
    assert "time_comm_intervals" in out
    assert "time_per_device_note" in out
    yamls = list(tmp_path.glob("miniMD-*.yaml"))
    assert len(yamls) == 1


def test_cli_device_overcommit_errors():
    with pytest.raises(SystemExit):
        main(["-s", "16", "-n", "5", "--devices", "4096"])


def test_cli_profile_writes_trace(tmp_path):
    """--profile wraps the run in jax.profiler.trace (SURVEY.md 5.1)."""
    d = tmp_path / "trace"
    out = _run(["-s", "6", "-n", "10", "--profile", str(d)])
    assert "# profiler trace:" in out
    assert any(d.rglob("*"))


def test_cli_half_neigh_runs():
    """--half_neigh 1 drives the Newton parity kernel end-to-end; the
    step-0 golden row must be unchanged (identical physics)."""
    out = _run(["-s", "6", "-n", "10", "--half_neigh", "1"])
    assert "0 1.440000e+00" in out
    assert "PERF_SUMMARY" in out


def test_cli_timed_check_exchange_yaml(tmp_path, monkeypatch):
    """Single-device --timed populates phase buckets; --check_exchange
    runs its drift audit; --yaml_output writes the report."""
    monkeypatch.chdir(tmp_path)
    out = _run(["-s", "6", "-n", "40", "--timed", "--check_exchange",
                "--yaml_output", "1", "--yaml_screen"])
    perf = next(l for l in out.splitlines() if "PERF_SUMMARY" in l
                and not l.startswith("#"))
    f = perf.split()
    assert float(f[5]) > 0    # t_force measured
    assert "conservation_ratio" in out and "lost_atoms: 0" in out
    assert list(tmp_path.glob("miniMD-*.yaml"))


def test_cli_datafile_and_precision2(tmp_path):
    """-f <datafile> initializes from LAMMPS data; --precision 2 runs
    f64 and reproduces the golden step-0 digits from the file."""
    import numpy as np

    from minimd_tpu import create
    from minimd_tpu.config import builtin_deck
    from minimd_tpu.lammps_data import write_lammps_data
    from minimd_tpu.units import thermo_scales

    inp = builtin_deck("lj")
    n = 6
    box = create.create_box(n, n, n, inp.rho)
    x, v = create.create_atoms(n, n, n, inp.rho, box)
    sc = thermo_scales(inp.units, len(x), box.volume)
    v = create.create_velocity(v, inp.t_request, len(x), 1.0, sc.t_scale)
    path = tmp_path / "t.data"
    write_lammps_data(path, box, x, v, mass=1.0)

    out = _run(["-f", str(path), "-s", str(n), "-n", "10", "--precision", "2"])
    # step-0 T from the data file's velocities is the rescaled 1.44
    assert "0 1.440000e+00" in out
    assert "PERF_SUMMARY" in out


def test_cli_sse_exits():
    with pytest.raises(SystemExit):
        main(["-sse", "1"])


def test_cli_nstat0_start_end_rows():
    """thermo_nstat = 0 prints exactly the start + end rows
    (ref thermo.cpp:49-50,95-99)."""
    import re
    import tempfile
    import pathlib

    deck = pathlib.Path(tempfile.mkdtemp()) / "in.nstat0"
    base = pathlib.Path(__file__).resolve().parent.parent / "inputs" / "in.lj.miniMD"
    lines = base.read_text().splitlines()
    lines[-1] = "0              thermo calculation every this many steps (0 = start,end)"
    deck.write_text("\n".join(lines) + "\n")

    out = _run(["-i", str(deck), "-s", "6", "-n", "30"])
    rows = [l for l in out.splitlines()
            if re.match(r"^\d+ -?\d\.\d+e[+-]\d+ ", l)]
    assert [int(r.split()[0]) for r in rows] == [0, 30]
    # the end row carries real energy (not a zeroed no-ev row)
    assert abs(float(rows[1].split()[2])) > 1.0


def test_cli_sharded_check_exchange_and_half_neigh():
    """--check_exchange is routed on the sharded path (drift audit runs);
    --half_neigh 1 now drives the sharded Newton fold path (step.py
    _make_folds) instead of being dropped — thermo rows must match the
    full-stencil sharded run to f32 summation noise."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    out = _run(["-s", "10", "-n", "20", "--devices", "8",
                "--check_exchange", "--half_neigh", "1"])
    assert "not supported" not in out
    assert "PERF_SUMMARY" in out
    full = _run(["-s", "10", "-n", "20", "--devices", "8"])
    import re

    def rows(text):
        # [T, U, P] only — the 4th field is wall-clock
        return [[float(v) for v in l.split()[1:4]] for l in text.splitlines()
                if re.match(r"^\d+ -?\d\.\d+e[+-]\d+ ", l)]

    import numpy as np
    np.testing.assert_allclose(np.array(rows(out)), np.array(rows(full)),
                               rtol=2e-5, atol=1e-6)


def test_cli_eam_half_neigh_runs():
    out = _run(["-i", "inputs/in.eam.miniMD", "-s", "4", "-n", "10",
                "--half_neigh", "1", "--precision", "2"])
    assert "PERF_SUMMARY" in out
    # EAM step-0 golden temperature (metal units)
    assert "0 6.000000e+02" in out


def test_cli_ghost_newton_variants():
    """-gn selects the real reference semantics with half lists [r5]:
    gn=1 = Newton fold (reverse-communicate analog), gn=0 = duplicate
    boundary pairs at half eng/vir weight, no reverse fold
    (ref force_lj.cpp:239-249). Both must produce the same physics: the
    step-0 thermo rows agree and the banner reports the flag."""
    out0 = _run(["-s", "6", "-n", "5", "--half_neigh", "1", "-gn", "0",
                 "--precision", "2"])
    assert "duplicates boundary pairs" in out0
    assert "# Ghost Newton: 0" in out0
    assert "PERF_SUMMARY" in out0
    out1 = _run(["-s", "6", "-n", "5", "--half_neigh", "1", "-gn", "1",
                 "--precision", "2"])
    assert "duplicates boundary pairs" not in out1
    assert "# Ghost Newton: 1" in out1

    def rows(out):
        return [ln for ln in out.splitlines()
                if ln and ln[0].isdigit()]

    # identical physics: f64 thermo rows match to printed precision
    # (the decompositions differ only in summation grouping)
    r0, r1 = rows(out0), rows(out1)
    assert r0[0] == r1[0]          # step-0 row exact
    for a, b in zip(r0[1:], r1[1:]):
        ta, tb = a.split(), b.split()
        for va, vb in zip(ta[1:4], tb[1:4]):
            assert abs(float(va) - float(vb)) <= 1e-9 * max(
                1.0, abs(float(vb)))
