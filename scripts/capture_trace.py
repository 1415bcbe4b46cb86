"""Capture a TPU profiler trace of the MSDA forward (or fwd+bwd).

Evidence tool for the fwd-f32 performance analysis in
docs/PERF_NOTES.md: the claim is that Mosaic's coarse store-drain
serializes the VPU slab build against the MXU dots (measured 3.49 ms
dependency-free floor vs ~5.4 ms shipped).  A TensorBoard-loadable trace
of the shipped kernel lets a reviewer see the serialization on the
device timeline instead of trusting a table of timings.

The reference has no trace tooling at all (its benchmark is
triton.testing.do_bench wall-clocks, /root/reference/scripts/benchmark.py:52).

Usage:
    python scripts/capture_trace.py [--mode fwd|fwdbwd] [--dtype float32]
        [--queries 10000] [--iters 30] [--out outputs/traces/NAME]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MSDA_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["fwd", "bwd", "fwdbwd"],
                    default="fwd")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--queries", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--impl", default=None,
                    help="default: pallas on TPU, reference elsewhere")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from msda_tpu.ops import multiscale_deformable_attention as msda
    from msda_tpu.utils import profile, reference_workload

    impl = args.impl or (
        "pallas" if jax.default_backend() == "tpu" else "reference")
    out = args.out or (
        f"outputs/traces/{args.mode}_{args.dtype}_{impl}")

    dtype = jnp.dtype(args.dtype)
    img, shapes, pts, wts, og = reference_workload(
        num_queries=args.queries, dtype=dtype)

    if args.mode == "fwd":
        def step(carry):
            img, pts, acc = carry
            o = msda(img, shapes, pts, wts, "border", True, impl=impl)
            return (img, pts + jnp.asarray(1e-9, dtype),
                    acc + o[0, 0, 0, 0].astype(jnp.float32) * 1e-6)
    elif args.mode == "bwd":
        # backward kernel ONLY (no forward in the trace): the bwd's own
        # device timeline for the floor analysis in docs/PERF_NOTES.md
        if impl != "pallas":
            raise SystemExit("--mode bwd traces the Pallas backward; "
                             "use --impl pallas on a TPU backend")
        from msda_tpu.ops.pallas_bwd import pallas_msda_bwd

        def step(carry):
            img, pts, acc = carry
            ig, pg, wg = pallas_msda_bwd(
                img, shapes, pts, wts, og, "border", True)
            eps = jnp.asarray(1e-12, dtype)
            return (img + ig * eps, pts + pg * eps,
                    acc + ig[0, 0, 0, 0].astype(jnp.float32) * 1e-6)
    else:
        def step(carry):
            img, pts, acc = carry
            def f(i, p, w):
                return msda(i, shapes, p, w, "border", True, impl=impl)
            o, vjp = jax.vjp(f, img, pts, wts)
            ig, pg, _ = vjp(og)
            eps = jnp.asarray(1e-12, dtype)
            return (img + ig * eps, pts + pg * eps,
                    acc + o[0, 0, 0, 0].astype(jnp.float32) * 1e-6)

    @jax.jit
    def loop(carry):
        return jax.lax.scan(
            lambda c, _: (step(c), None), carry, None, length=args.iters
        )[0]

    carry = (img, pts, jnp.float32(0))
    # compile + warm OUTSIDE the trace so the capture is pure device steps
    warm = loop(carry)
    jax.block_until_ready(warm)
    print(f"warm OK (backend={jax.default_backend()}, impl={impl}); "
          f"tracing {args.iters} iters -> {out}", flush=True)

    with profile.trace(out):
        res = loop(carry)
        jax.block_until_ready(res)
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
