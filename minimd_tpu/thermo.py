"""Thermodynamic reductions: temperature, potential energy, pressure.

Matches ref/thermo.cpp:119-194. Works on the padded cell-major arrays —
invalid slots carry zero velocity so no masking is needed for T; energy and
virial come pre-reduced from the force kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from .units import ThermoScales


def temperature(v, mass: float, scales: ThermoScales):
    """t = sum(m * v^2) * t_scale (thermo.cpp:140-174)."""
    return jnp.sum(v * v) * mass * scales.t_scale


def energy(eng_vdwl, natoms: int, scales: ThermoScales, halfneigh: bool = False):
    """Potential energy per atom (thermo.cpp:119-136)."""
    e = eng_vdwl * (2.0 if halfneigh else 1.0) * scales.e_scale
    return e / natoms


def pressure(t, virial, scales: ThermoScales):
    """(T*dof_boltz + sum virial) * p_scale (thermo.cpp:181-194)."""
    return (t * scales.dof_boltz + virial) * scales.p_scale
