#!/usr/bin/env python3
"""Phase-level decomposition of the sharded engine's single-shard
overhead (round-4 follow-up to perf_shard1's 1.267x): K-differenced
timings on a 1-device mesh at 256^3 of

  1. _extend_block + crop of u alone (the per-pass halo concat),
  2. one per-shard kernel pass (extend + ns=2 kernel),
  3. a full ms=5 sharded smooth,
  4. the dense MGEngine ms=5 smooth (reference).

Identifies whether the 1-device overhead is the XLA extend concats
(fix: halo assembly inside the kernel's DMAs / extended-layout
outputs) or the transfer/defect machinery.

Usage: python3 scripts/perf_shard_phases.py [n=256]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax, shard_map  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

REPS = int(os.environ.get("NDSM_PERF_REPS", "3"))
K = 12


def kdiff(name, make_prog):
    f = jax.jit(make_prog, static_argnums=0)
    jax.block_until_ready(f(K))
    jax.block_until_ready(f(3 * K))
    rates = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(f(K))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(f(3 * K))
        d2 = time.perf_counter() - t0
        rates.append((d2 - d1) / (2 * K))
    per = float(np.median(rates))
    print(f"  {name:34s}: {per*1e3:8.3f} ms/iter", flush=True)
    return per


def main(n):
    from ndsm_tpu import GridHierarchy, Options
    from ndsm_tpu.mg.poisson import PoissonBVP
    from ndsm_tpu.parallel.shard import make_mesh
    from ndsm_tpu.parallel.sm_engine import ShardedPoissonBVP

    x = np.linspace(0, 1, n)
    h = GridHierarchy.from_mesh((x, x, x))
    bcs = (("N", "N"), ("D", "D"), ("D", "D"))
    opts = Options(precision="mixed")
    mesh = make_mesh(1)
    eng = ShardedPoissonBVP(h, bcs, opts, mesh=mesh, axis_names=("z",))
    dense = PoissonBVP(h, bcs, opts)._inner

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)

    spec = P("z")

    def smwrap(body2):
        return shard_map(
            body2, mesh=mesh, in_specs=(spec, spec), out_specs=spec
        )

    print(f"== sharded single-shard phases, {n}^3 ==", flush=True)

    ns_star = 2
    H = eng._H_map(ns_star)

    def prog_ext(k):
        def local(a, b):
            def body(_, v):
                return eng._unextend_block(eng._extend_block(v, 0, H), H)

            return lax.fori_loop(0, k, body, a)

        return smwrap(local)(u, r)

    kdiff("extend+crop only (H=2*ns)", prog_ext)

    fz = eng._zc_sharded_fn(0, ns_star)
    if fz is not None:

        def prog_pass(k):
            def local(a, b):
                C = eng._zc_mask_code(a.shape, 0)
                Ce = eng._extend_block(C, 0, H)
                re_ = eng._extend_block(b, 0, H)

                def body(_, v):
                    return fz(eng._extend_block(v, 0, H), re_, Ce)

                return lax.fori_loop(0, k, body, a)

            return smwrap(local)(u, r)

        kdiff("sharded kernel pass (ext + ns=2)", prog_pass)

    fzh = eng._zc_sharded_fn(0, ns_star, halo_args=True)
    if fzh is not None:
        ax0, nm0 = eng.parts[0]
        Hz = H[0]

        def prog_edges(k):
            def local(a, b):
                def body(_, v):
                    lo, hi = eng._edge_planes(v, ax0, nm0, Hz)
                    return v + 0.0 * (
                        jnp.sum(lo) + jnp.sum(hi)
                    )  # keep them live

                return lax.fori_loop(0, k, body, a)

            return smwrap(local)(u, r)

        kdiff("edge planes only (halo path)", prog_edges)

        def prog_halo_pass(k):
            def local(a, b):
                C = eng._zc_mask_code(a.shape, 0)
                c_lo, c_hi = eng._edge_planes(C, ax0, nm0, Hz)
                r_lo, r_hi = eng._edge_planes(b, ax0, nm0, Hz)

                def body(_, v):
                    v_lo, v_hi = eng._edge_planes(v, ax0, nm0, Hz)
                    return fzh(v, v_lo, v_hi, b, r_lo, r_hi, C, c_lo, c_hi)

                return lax.fori_loop(0, k, body, a)

            return smwrap(local)(u, r)

        kdiff("halo-args kernel pass (ns=2)", prog_halo_pass)

    def prog_smooth(k):
        def local(a, b):
            # production entry points prime the mask-code cache before
            # their cycle loops; mirror that here (hoisted constants)
            eng._prime_c_codes()
            try:
                return lax.fori_loop(
                    0, k, lambda _, v: eng._smooth(v, b, 0, 5), a
                )
            finally:
                eng._c_trace_cache = None

        return smwrap(local)(u, r)

    os.environ["NDSM_TPU_ZC_HALO_ARGS"] = "1"
    kdiff("sharded smooth ms=5 (halo args)", prog_smooth)
    os.environ["NDSM_TPU_ZC_HALO_ARGS"] = "0"
    kdiff("sharded smooth ms=5 (ext inputs)", prog_smooth)
    del os.environ["NDSM_TPU_ZC_HALO_ARGS"]

    def prog_smooth_unprimed(k):
        def local(a, b):
            return lax.fori_loop(0, k, lambda _, v: eng._smooth(v, b, 0, 5), a)

        return smwrap(local)(u, r)

    kdiff("sharded smooth ms=5 (in-loop C)", prog_smooth_unprimed)

    def prog_dense(k):
        return lax.fori_loop(0, k, lambda _, v: dense.t_smooth(v, r, 0), u)

    kdiff("dense smooth ms=5 (MGEngine)", prog_dense)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
