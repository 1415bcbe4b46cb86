"""Autotune the Pallas kernel block parameters on the current chip.

The analogue of the reference's ``@triton.autotune`` over ``num_warps``
(reference kernels.py:259-265): sweeps the forward query-block width
(N_BLOCK), the build/dot band height (YB), and the backward block/band
sizes at a chosen workload, timing each with the in-jit scan harness, and
prints the best configuration to paste into pallas_fwd.py / pallas_bwd.py
(they are compile-time constants: Mosaic kernels specialize on them, so a
runtime-selected value would force recompiles per call site).

Usage:  python scripts/autotune.py [--queries 10000] [--dtype float32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MSDA_FORCE_CPU") == "1":
    # outage escape hatch (same contract as tests/conftest.py): pin
    # jax to host CPU via the config route before any device access
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=10000)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--stream", action="store_true",
                    help="sweep the STREAMED kernels' constants "
                         "(N_BLOCK_STREAM / BAND_ROWS_STREAM) at the "
                         "large 256-base pyramid instead of the resident "
                         "kernels' constants")
    args = ap.parse_args()

    import numpy as np

    import msda_tpu.ops.pallas_fwd as pf
    import msda_tpu.ops.pallas_bwd as pb
    from msda_tpu.utils import reference_workload, timeit_op

    dtype = jnp.dtype(args.dtype)
    big_shapes = np.array(
        [(256, 256), (128, 128), (64, 64), (32, 32)], np.int32)
    img, shapes, pts, wts, og = reference_workload(
        num_queries=args.queries, dtype=dtype,
        shapes=big_shapes if args.stream else None)

    if args.stream:
        import msda_tpu.ops.pallas_stream as ps

        # route every dispatch through the streamed kernels, whatever the
        # footprint model would decide
        ps.RESIDENT_VMEM_BUDGET = 0

        def time_stream():
            ps.stream_fwd.clear_cache()
            ps.stream_bwd.clear_cache()

            def step(carry):
                p, acc = carry
                out = pf.pallas_multiscale_deformable_attention(
                    img, shapes, p, wts, "border", True)
                ig, pg, wg = pb.pallas_msda_bwd(
                    img, shapes, p, wts, og, "border", True)
                return (p + (pg * 1e-20).astype(dtype),
                        acc + out[0, 0, 0, 0].astype(jnp.float32))

            return timeit_op(step, (pts, jnp.float32(0)),
                             n=args.iters, repeats=3) * 1e3

        print(f"# stream autotune @ N={args.queries}, dtype={args.dtype}, "
              f"pyramid 256-base, device={jax.devices()[0]}", flush=True)
        sbest = None
        for nbs in (256, 512, 1024):
            for brs in (1024, 2048, 4096):
                ps.N_BLOCK_STREAM, ps.BAND_ROWS_STREAM = nbs, brs
                try:
                    t = time_stream()
                except Exception as e:
                    print(f"stream N_BLOCK_STREAM={nbs:5d} "
                          f"BAND_ROWS_STREAM={brs:5d}: failed "
                          f"({type(e).__name__})", flush=True)
                    continue
                print(f"stream N_BLOCK_STREAM={nbs:5d} "
                      f"BAND_ROWS_STREAM={brs:5d}: {t:9.3f} ms fwd+bwd",
                      flush=True)
                if sbest is None or t < sbest[0]:
                    sbest = (t, nbs, brs)
        print(f"best stream: N_BLOCK_STREAM={sbest[1]}, "
              f"BAND_ROWS_STREAM={sbest[2]}  ({sbest[0]:.3f} ms)")
        return

    def time_fwd():
        pf._pallas_fwd.clear_cache()

        def step(carry):
            p, acc = carry
            out = pf.pallas_multiscale_deformable_attention(
                img, shapes, p, wts, "border", True)
            return (p + (out[0, 0, 0, 0] * 1e-20).astype(dtype),
                    acc + out[0, 0, 0, 0].astype(jnp.float32))

        return timeit_op(step, (pts, jnp.float32(0)), n=args.iters) * 1e3

    def time_bwd():
        pb._pallas_bwd.clear_cache()

        def step(carry):
            p, acc = carry
            ig, pg, wg = pb.pallas_msda_bwd(
                img, shapes, p, wts, og, "border", True)
            return (p + (pg * 1e-20).astype(dtype),
                    acc + ig[0, 0, 0, 0].astype(jnp.float32))

        return timeit_op(step, (pts, jnp.float32(0)), n=args.iters) * 1e3

    print(f"# autotune @ N={args.queries}, dtype={args.dtype}, "
          f"device={jax.devices()[0]}", flush=True)
    best = None
    for nb in (512, 1024, 2048):
        for br in (512, 1024, 2048):
            pf.N_BLOCK, pf.BAND_ROWS = nb, br
            t = time_fwd()
            tag = f"fwd  N_BLOCK={nb:5d} BAND_ROWS={br:5d}: {t:8.3f} ms"
            print(tag)
            if best is None or t < best[0]:
                best = (t, nb, br)
    print(f"best fwd: N_BLOCK={best[1]}, BAND_ROWS={best[2]}  "
          f"({best[0]:.3f} ms)")
    pf.N_BLOCK, pf.BAND_ROWS = best[1], best[2]

    bbest = None
    for nb in (256, 512, 1024):
        for yb in (8, 16, 32):
            pb.N_BLOCK, pb.YB_BWD = nb, yb
            try:
                t = time_bwd()
            except Exception as e:  # e.g. VMEM overflow at large blocks
                print(f"bwd  N_BLOCK={nb:5d} YB={yb:3d}: failed "
                      f"({type(e).__name__})")
                continue
            print(f"bwd  N_BLOCK={nb:5d} YB={yb:3d}: {t:8.3f} ms")
            if bbest is None or t < bbest[0]:
                bbest = (t, nb, yb)
    print(f"best bwd: N_BLOCK={bbest[1]}, YB_BWD={bbest[2]}  "
          f"({bbest[0]:.3f} ms)")


if __name__ == "__main__":
    main()
