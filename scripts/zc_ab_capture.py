#!/usr/bin/env python3
"""A/B bitwise comparison harness for zc kernel changes on chip.

  python3 scripts/zc_ab_capture.py save /tmp/zc_ab.npz   # committed kernel
  python3 scripts/zc_ab_capture.py check /tmp/zc_ab.npz  # modified kernel

`check` exits 0 iff every variant's output is BITWISE equal to the
saved run — the strongest possible gate for a pure dataflow/buffering
change (rounding-level oracle comparisons can't separate a DMA race
from jit-formulation noise)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ndsm_tpu.ops import pallas_zc as z  # noqa: E402


def _field(shape, seed):
    n = int(np.prod(shape))
    i = lax.iota(jnp.float32, n).reshape(shape)
    return jnp.sin(0.001 * i + seed) + 0.1 * jnp.cos(0.013 * i)


def outputs():
    out = {}
    for m, tag in ((256, "a"), (128, "b")):
        shape = (m, m, m)
        dq = np.array([1.0 / (m - 1)] * 3)
        bcs = (("D", "D"), ("D", "D"), ("N", "N"))
        u, r, c = _field(shape, 0.0), _field(shape, 1.0), _field(shape, 2.0)
        for ns in (1, 2):
            out[f"{tag}_sm{ns}"] = z.zc_smooth_3d(bcs, dq, shape, ns)(u, r)
        out[f"{tag}_cor"] = z.zc_smooth_cor_3d(bcs, dq, shape, 2)(u, c, r)
        ur, rr = z.zc_smooth_residual_3d(bcs, dq, shape, 2)(u, r)
        out[f"{tag}_res_u"], out[f"{tag}_res_r"] = ur, rr
        bn = (("N", "N"),) * 3
        sub = jnp.full((8, 128), 0.015625, jnp.float32)
        um, sums = z.zc_smooth_mean_3d(bn, dq, shape)(u, r, sub)
        out[f"{tag}_mean_u"], out[f"{tag}_mean_s"] = um, sums
    return {k: np.asarray(v) for k, v in out.items()}


if __name__ == "__main__":
    mode, path = sys.argv[1], sys.argv[2]
    got = outputs()
    if mode == "save":
        np.savez(path, **got)
        print("saved", sorted(got))
    else:
        ref = np.load(path)
        bad = []
        for k in sorted(got):
            a, b = got[k], ref[k]
            if a.shape != b.shape:
                # per-window sums under a different tile pick: the grid
                # (hence reduction order) changed — compare the total
                # at rounding level, the semantic quantity the engine
                # consumes (sum/N is the next pass's mean)
                sa, sb = float(np.sum(a)), float(np.sum(b))
                okk = abs(sa - sb) <= 1e-5 * max(abs(sb), 1.0)
                print(f"  {k:10s}: grids {a.shape} vs {b.shape}, "
                      f"sums {sa:.6e} vs {sb:.6e} "
                      f"{'SUM-OK' if okk else 'FAIL'}")
            else:
                d = float(np.max(np.abs(a - b)))
                okk = d == 0
                print(f"  {k:10s}: "
                      f"{'BITWISE' if okk else f'max|diff|={d:.3e} FAIL'}")
            if not okk:
                bad.append(k)
        sys.exit(1 if bad else 0)
