"""Timing helpers that survive the axon tunnel's quirks.

Two hazards when benchmarking through the axon TPU tunnel:

* (executable, input-buffer) -> result caching for small-output programs:
  re-running on the same buffers measures cache-fetch, not compute. Every
  timed rep must use a never-before-run input buffer; host->device transfer
  runs at ~8 MB/s, so inputs are perturbed ON DEVICE.
* Per-dispatch overhead grows with the number of live executables/buffers in
  the process (measured 0.1 -> 7 ms for a trivial add). A trivial-op baseline
  is measured alongside each timing and reported for drift tracking.
"""

from __future__ import annotations

import time

import numpy as np


class Bench:
    def __init__(self):
        import os
        import jax

        self._jax = jax
        # random base: the tunnel's result cache appears content-addressed,
        # so a per-process counter restarting at 1 replays earlier processes'
        # exact input values and hits the cache across processes
        self._eps = int.from_bytes(os.urandom(4), "little") % 1_000_000
        self._perturb = jax.jit(lambda x, e: x + e)
        self._noop = jax.jit(lambda x: x + 1.0)
        self._probe = jax.device_put(np.zeros((8, 128), np.float32))
        self.rows = []

    def fresh(self, arr):
        """A never-before-run on-device copy of ``arr`` (float arrays only)."""
        self._eps += 1
        out = self._perturb(arr, np.float32(self._eps * 1e-7))
        self._jax.block_until_ready(out)
        return out

    def baseline_ms(self) -> float:
        self._probe = self.fresh(self._probe)
        t0 = time.time()
        self._jax.block_until_ready(self._noop(self._probe))
        return (time.time() - t0) * 1e3

    def timeit(self, fn, args, perturb_idx=(0,), reps=3, label=""):
        """Time ``fn(*args)``; args at ``perturb_idx`` are freshly perturbed
        per rep (defeats result caching). Returns (mean_s, last_out)."""
        jax = self._jax
        out = fn(*args)
        jax.block_until_ready(out)  # compile
        rep_args = []
        for _ in range(reps):
            a = list(args)
            for i in perturb_idx:
                a[i] = self.fresh(a[i])
            rep_args.append(a)
        base = self.baseline_ms()
        t0 = time.time()
        for a in rep_args:
            out = fn(*a)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        self.rows.append({"label": label, "ms": dt * 1e3, "baseline_ms": base})
        print(f"{label:36s} {dt*1e3:9.3f} ms   (dispatch baseline {base:.2f} ms)",
              flush=True)
        return dt, out
