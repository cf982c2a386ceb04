"""Box-weather probes (shared by bench.py and tools/bench_scaling.py).

This box is hypervisor-shared: slow-cycle windows inflate wall time at
~0% recorded /proc/stat steal (observed 99 s vs 152 s for identical
crawl passes at <=0.4% steal), and memory-bus co-tenancy once halved
certified crawl throughput while the compute probe read clean. Every
timed window is therefore bracketed by BOTH probes so round-over-round
deltas are adjudicable from the recorded JSON alone (BENCH.md §1.2):

* ``cpu_probe_ms`` — fixed single-thread sha256 workload (~90 ms on a
  healthy core): effective CPU speed at this instant. sha256 (single C
  thread) is immune to BLAS thread-count effects.
* ``membw_probe_ms`` — fixed single-thread 32 MB memory copy, min-rep
  x 8 (a sustained-pressure floor a descheduling blip cannot inflate):
  effective DRAM bandwidth at this instant.

The implementations are byte-identical to the round-4 scaling-harness
worker (tools/bench_scaling.py WORKER) so probe floors stay comparable
across the recorded bench_scaling_r4*.json history.
"""

from __future__ import annotations

import hashlib
import time

import numpy as _np

_PROBE_BUF = b"\x5a" * (16 << 20)

_MEMBW_SRC = _np.ones(32 << 20, dtype=_np.uint8)  # 32 MB
_MEMBW_DST = _np.empty_like(_MEMBW_SRC)
_MEMBW_DST[:] = _MEMBW_SRC  # touch pages: first-touch faults cost 10-20x


def cpu_probe_ms() -> float:
    t0 = time.perf_counter()
    for _ in range(6):
        hashlib.sha256(_PROBE_BUF).digest()
    return round((time.perf_counter() - t0) * 1000.0, 1)


def membw_probe_ms() -> float:
    reps = []
    for _ in range(8):
        t0 = time.perf_counter()
        _MEMBW_DST[:] = _MEMBW_SRC
        reps.append(time.perf_counter() - t0)
    return round(min(reps) * 8 * 1000.0, 1)


def probe_pair() -> dict[str, float]:
    """One bracketing sample of both probes."""
    return {"cpu_probe_ms": cpu_probe_ms(), "membw_probe_ms": membw_probe_ms()}
