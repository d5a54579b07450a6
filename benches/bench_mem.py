"""Memory behavior of the evaluation paths (reference: benches/bench_mem.py
with memory_profiler; here we report both host RSS and device HBM stats).

Checks the no-realloc contract: repeated preallocated-output evals must not
grow host RSS or device memory.

Run: python benches/bench_mem.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import interpn_tpu as it


def rss_mb() -> float:
    # Current (not peak) resident set, so repeated evals can be compared;
    # ru_maxrss is monotone and would report transient staging buffers as
    # growth.
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024
    return 0.0


def device_bytes():
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("bytes_in_use", 0)


def main() -> None:
    rng = np.random.default_rng(0)
    axes = [np.linspace(0, 1, 20) for _ in range(3)]
    mesh = np.meshgrid(*axes, indexing="ij")
    vals = (mesh[0] + mesh[1] * mesh[2]).ravel()
    interp = it.MulticubicRegular.new(
        [20, 20, 20], np.zeros(3), np.full(3, axes[0][1]), vals
    )
    n = 200_000
    obs = [rng.uniform(-0.2, 1.2, n) for _ in range(3)]
    out = np.zeros(n)

    interp.eval(obs, out)  # compile + warm
    r0, d0 = rss_mb(), device_bytes()
    for _ in range(50):
        interp.eval(obs, out)
    r1, d1 = rss_mb(), device_bytes()
    print(f"host RSS: {r0:.1f} MB -> {r1:.1f} MB (delta {r1-r0:+.1f} MB over 50 evals)")
    print(f"device:   {d0/1e6:.1f} MB -> {d1/1e6:.1f} MB (delta {(d1-d0)/1e6:+.1f} MB)")
    assert r1 - r0 < 96, "host memory grew unexpectedly"


if __name__ == "__main__":
    main()
