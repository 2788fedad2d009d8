"""LAMMPS data-file reader (ref/setup.cpp:55-301).

Parses the header (natoms, atom types, box bounds) and the Atoms /
Velocities / Masses sections. Returns host NumPy arrays; used by the
`-f/--data_file` path and the in.*-data.miniMD decks.
"""

from __future__ import annotations

import pathlib

import numpy as np

from .create import Box

_SECTIONS = ("Atoms", "Velocities", "Masses")


def read_lammps_data(path: str | pathlib.Path):
    """Returns (box, x, v, mass). Atom ids in the file are 1-based and may
    be unordered; rows are scattered by id like the reference
    (setup.cpp:169-189)."""
    from . import native
    if native.available():
        nbox, x, v, mass = native.read_lammps_data(path)
        box = Box(nbox[0], nbox[1], nbox[2])
        box.xhi, box.yhi, box.zhi = box.xprd, box.yprd, box.zprd
        return box, x, v, mass

    lines = pathlib.Path(path).read_text().splitlines()

    natoms = 0
    ntypes = 1
    xlo = xhi = ylo = yhi = zlo = zhi = 0.0
    i = 1  # skip first line
    n = len(lines)

    # header
    while i < n:
        ln = lines[i].split("#")[0]
        s = ln.strip()
        i += 1
        if not s:
            continue
        parts = s.split()
        if "atoms" in s and len(parts) >= 2 and parts[1] == "atoms":
            natoms = int(parts[0])
        elif "atom types" in s:
            ntypes = int(parts[0])
        elif "xlo xhi" in s:
            xlo, xhi = float(parts[0]), float(parts[1])
        elif "ylo yhi" in s:
            ylo, yhi = float(parts[0]), float(parts[1])
        elif "zlo zhi" in s:
            zlo, zhi = float(parts[0]), float(parts[1])
        elif parts[0] in _SECTIONS:
            i -= 1
            break

    box = Box(xhi - xlo, yhi - ylo, zhi - zlo)
    box.xhi, box.yhi, box.zhi = box.xprd, box.yprd, box.zprd

    x = np.zeros((natoms, 3))
    v = np.zeros((natoms, 3))
    mass = 1.0

    while i < n:
        s = lines[i].strip()
        i += 1
        if not s:
            continue
        if s.split()[0] == "Atoms":
            i += 0
            count = 0
            while count < natoms:
                row = lines[i].split()
                i += 1
                if not row:
                    continue
                idx = int(row[0]) - 1
                x[idx] = [float(row[2]), float(row[3]), float(row[4])]
                count += 1
        elif s.split()[0] == "Velocities":
            count = 0
            while count < natoms:
                row = lines[i].split()
                i += 1
                if not row:
                    continue
                idx = int(row[0]) - 1
                v[idx] = [float(row[1]), float(row[2]), float(row[3])]
                count += 1
        elif s.split()[0] == "Masses":
            while i < n:
                row = lines[i].split()
                if row and row[0].isdigit():
                    mass = float(row[1])
                    i += 1
                    break
                i += 1

    return box, x, v, mass


def write_lammps_data(path, box: Box, x: np.ndarray, v: np.ndarray,
                      mass: float = 1.0, ntypes: int = 1):
    """Writer counterpart (the reference has none; used by tests and
    checkpointing)."""
    n = len(x)
    with open(path, "w") as f:
        f.write("LAMMPS data file (minimd-tpu)\n\n")
        f.write(f"{n} atoms\n{ntypes} atom types\n\n")
        f.write(f"0.0 {box.xprd:.17g} xlo xhi\n")
        f.write(f"0.0 {box.yprd:.17g} ylo yhi\n")
        f.write(f"0.0 {box.zprd:.17g} zlo zhi\n\n")
        f.write("Masses\n\n")
        f.write(f"1 {mass:.6g}\n\n")
        f.write("Atoms\n\n")
        for i in range(n):
            f.write(f"{i+1} 1 {x[i,0]:.17g} {x[i,1]:.17g} {x[i,2]:.17g}\n")
        f.write("\nVelocities\n\n")
        for i in range(n):
            f.write(f"{i+1} {v[i,0]:.17g} {v[i,1]:.17g} {v[i,2]:.17g}\n")
