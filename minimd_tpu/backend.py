"""Backend-availability helper for accelerator scripts.

The axon TPU worker occasionally crashes and takes 15-60 minutes to
recover; during recovery `jax.devices()` either raises UNAVAILABLE or
hangs, and jax.xla_bridge caches a FAILED init for the life of the
process. Probing must therefore happen out-of-process: only once a
subprocess probe succeeds does the caller touch the backend itself.

Import and call `wait_for_backend()` BEFORE the first jax device use in
any script that talks to the TPU (bench.py, scripts/perf.py,
scripts/profile_step.py, scripts/tpu_sharded_check.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_PROBE = "import jax; jax.devices()"


def wait_for_backend(budget_s: float = 2400.0,
                     probe_timeout_s: float = 300.0,
                     exit_json: bool = False) -> None:
    """Block until a JAX backend initializes, probing in subprocesses.

    budget_s bounds the total wait; on exhaustion either raises
    RuntimeError or (exit_json=True, for bench.py's driver contract)
    prints a one-line JSON error and exits 1."""
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE],
                               timeout=probe_timeout_s,
                               capture_output=True, env=os.environ)
            if r.returncode == 0:
                return
            err = (r.stderr or b"").decode(errors="replace").strip()[-200:]
        except subprocess.TimeoutExpired:
            err = f"probe hung > {probe_timeout_s:.0f}s"
        waited = time.time() - t0
        if waited > budget_s:
            msg = f"no JAX backend after {waited:.0f}s: {err}"
            if exit_json:
                print(json.dumps({"error": msg}))
                sys.exit(1)
            raise RuntimeError(msg)
        print(f"# backend probe {attempt} failed ({err}); retrying "
              f"({waited:.0f}s elapsed)", file=sys.stderr)
        time.sleep(60)
