#!/usr/bin/env python3
"""Tunnel transfer characterization: is download bandwidth per-stream?

Times device->host fetches of three (n, n, n) float64 arrays done
serially vs concurrently (3 threads).  If the relay caps per-stream
throughput, concurrent device_get of the vector-potential components
would cut the dominant cost of the 220^3 headline by up to 3x.

Usage: python3 scripts/transfer_probe.py [n=220]
"""

import concurrent.futures as cf
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 220
mb = n**3 * 8 / 1e6

xs = [
    jax.device_put(jnp.asarray(np.random.default_rng(i).standard_normal((n, n, n))))
    for i in range(3)
]
jax.block_until_ready(xs)

# warm one small fetch
np.asarray(jax.device_get(jnp.ones((8, 128))))

t0 = time.perf_counter()
outs = [jax.device_get(x) for x in xs]
serial = time.perf_counter() - t0
print(f"serial   : {serial:7.2f} s  ({3 * mb / serial:6.1f} MB/s aggregate)")

t0 = time.perf_counter()
with cf.ThreadPoolExecutor(3) as ex:
    outs2 = list(ex.map(jax.device_get, xs))
conc = time.perf_counter() - t0
print(f"threaded : {conc:7.2f} s  ({3 * mb / conc:6.1f} MB/s aggregate)")
for a, b in zip(outs, outs2):
    assert np.array_equal(a, b)
print(f"speedup  : {serial / conc:.2f}x")
