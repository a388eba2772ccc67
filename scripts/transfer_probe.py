#!/usr/bin/env python3
"""Tunnel transfer characterization: aggregate download vs stream count.

The 220^3 headline wall is ~97% result download (PERF_NOTES.md): 256 MB
of float64 A at the relay's ~16-25 MB/s.  The only end-to-end lever is
whether concurrent fetch streams aggregate.  This probe times fetching
three (n, n, n) float64 arrays split into z-slabs across S concurrent
device_get threads, for S in a sweep, interleaved over two rounds (the
link rate drifts minute-to-minute; interleaving de-confounds drift from
the stream-count effect).

Usage: python3 scripts/transfer_probe.py [n=220] [streams...=1 3 6 12 24]
"""

import concurrent.futures as cf
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 220
streams = [int(v) for v in sys.argv[2:]] or [1, 3, 6, 12, 24]
mb = 3 * n**3 * 8 / 1e6

xs = [
    jax.device_put(jnp.asarray(np.random.default_rng(i).standard_normal((n, n, n))))
    for i in range(3)
]
jax.block_until_ready(xs)
ref = [np.asarray(jax.device_get(x)) for x in xs]  # warm + oracle

def fetch(S):
    """Split the 3 components into ~S z-slab fetch tasks (the production
    layout: potential/vector_potential.py host_curl fetch)."""
    per_comp = max(1, -(-S // 3))
    bounds = [(k * n) // per_comp for k in range(per_comp)] + [n]
    tasks = [
        (i, bounds[k], bounds[k + 1])
        for i in range(3)
        for k in range(per_comp)
        if bounds[k + 1] > bounds[k]
    ]
    host = [np.empty((n, n, n)) for _ in range(3)]
    slabs = [xs[i][z0:z1] for (i, z0, z1) in tasks]
    jax.block_until_ready(slabs)

    def one(k):
        i, z0, z1 = tasks[k]
        host[i][z0:z1] = np.asarray(slabs[k])

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(len(tasks)) as ex:
        list(ex.map(one, range(len(tasks))))
    dt = time.perf_counter() - t0
    for a, b in zip(ref, host):
        assert np.array_equal(a, b)
    return dt

results = {S: [] for S in streams}
for rnd in range(2):
    for S in streams:
        dt = fetch(S)
        results[S].append(dt)
        print(
            f"round {rnd} S={S:3d}: {dt:7.2f} s  ({mb / dt:6.1f} MB/s aggregate)",
            flush=True,
        )
print("== medians ==")
for S in streams:
    med = float(np.median(results[S]))
    print(f"S={S:3d}: {med:7.2f} s  ({mb / med:6.1f} MB/s)")
