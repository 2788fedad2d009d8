#!/usr/bin/env python
"""Generate LAMMPS data files for the -f/--data_file path.

The reference's 1m.data (1,048,576-atom LJ fluid in a 261.76x130.88x523.52
box, tests/reference_output/1049k.lj-data) is distributed separately and is
not in the reference tree; this script generates equivalent inputs: an FCC
lattice with Park-Miller velocities in an arbitrary (possibly non-cubic)
box, written in the same format the reader consumes.

    python scripts/make_data.py --nx 64 --ny 32 --nz 128 -o 1m.data
"""

import argparse
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from minimd_tpu import create  # noqa: E402
from minimd_tpu.lammps_data import write_lammps_data  # noqa: E402
from minimd_tpu.units import thermo_scales  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=32)
    ap.add_argument("--nz", type=int, default=128)
    ap.add_argument("--rho", type=float, default=0.8442)
    ap.add_argument("--temp", type=float, default=1.44)
    ap.add_argument("--mass", type=float, default=1.0)
    ap.add_argument("-o", "--output", default="system.data")
    args = ap.parse_args()

    box = create.create_box(args.nx, args.ny, args.nz, args.rho)
    x, v = create.create_atoms(args.nx, args.ny, args.nz, args.rho, box)
    sc = thermo_scales(0, len(x), box.volume)
    v = create.create_velocity(v, args.temp, len(x), args.mass, sc.t_scale)
    write_lammps_data(args.output, box, x, v, mass=args.mass)
    print(f"wrote {args.output}: {len(x)} atoms, box "
          f"{box.xprd:.2f} x {box.yprd:.2f} x {box.zprd:.2f}")


if __name__ == "__main__":
    main()
