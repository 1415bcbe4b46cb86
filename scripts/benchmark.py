"""MSDA benchmark sweep (analogue of /root/reference/scripts/benchmark.py).

Sweeps num_queries over the reference grid {10, 100, 300, 900, 1000, 10000}
with the reference workload (B=4, H=8, C=32, P=4, pyramid
(64,64),(32,32),(16,16),(8,8), fp32, border, align_corners=True —
scripts/benchmark.py:24-31) and measures:

  * fwd latency        (reference benchmark_fwd)
  * fwd+bwd latency    (reference benchmark_fwdbwd)
  * peak device memory (reference benchmark_memory)

for each implementation (pallas / reference interpreter / fused XLA), plus
a bf16 variant of the pallas path.  Timing uses in-jit iteration with a
data-dependent carry (see msda_tpu.utils.bench for why per-call wall
clocks are unusable through remote TPU tunnels).

Writes a CSV to outputs/benchmark_results.csv and prints a table.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MSDA_FORCE_CPU") == "1":
    # outage escape hatch (same contract as tests/conftest.py): pin
    # jax to host CPU via the config route before any device access
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (same contract as tests/conftest.py): the
# sweep's wall clock is dominated by distinct jit/Pallas compiles — and the
# memory probes each run in a FRESH subprocess (see bench_memory), so
# without a disk cache every probe re-pays its compiles from scratch
# (measured ~6 min/probe at the big pyramid; ~seconds warm).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "MSDA_TPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from msda_tpu.ops import multiscale_deformable_attention as msda
from msda_tpu.utils import timeit_op, device_memory_stats

# NOTE on process structure: exactly one process can hold the TPU, and
# JAX's peak_bytes_in_use is monotonic per process.  So the memory probes
# (a) run in fresh subprocesses and (b) must run BEFORE this process
# initializes the device for the timing sweep.

PYRAMIDS = {
    # the reference benchmark pyramid (scripts/benchmark.py:24-31)
    "ref": np.array([(64, 64), (32, 32), (16, 16), (8, 8)], np.int32),
    # large-pyramid geometry: exceeds the resident kernels' VMEM budget,
    # so impl="pallas" auto-routes to the streamed kernels
    # (ops/pallas_stream.py) — the capability class the reference kernel
    # serves from HBM (kernels.py:184-210)
    "big": np.array([(256, 256), (128, 128), (64, 64), (32, 32)],
                    np.int32),
}
SHAPES = PYRAMIDS["ref"]
B, H, C, P = 4, 8, 32, 4
L = len(SHAPES)
I = int((SHAPES[:, 0] * SHAPES[:, 1]).sum())  # noqa: E741
PADDING, ALIGN = "border", True


def set_pyramid(name):
    global SHAPES, I
    SHAPES = PYRAMIDS[name]
    I = int((SHAPES[:, 0] * SHAPES[:, 1]).sum())  # noqa: E741
BASELINES = {  # reference Triton numbers on RTX 2060 (README.md:18-19)
    ("fwd", 10000): 3.78,
    ("fwdbwd", 10000): 22.78,
}


def make_data(n, dtype=jnp.float32, seed=0):
    from msda_tpu.utils import reference_workload

    img, _, pts, wts, og = reference_workload(
        num_queries=n, dtype=dtype, shapes=SHAPES, seed=seed,
        batch=B, heads=H, channels=C, points=P)
    return img, pts, wts, og


def bench_fwd(impl, n, dtype=jnp.float32, iters=150):
    img, pts, wts, _ = make_data(n, dtype)

    def step(carry):
        img, pts, acc = carry
        out = msda(img, SHAPES, pts, wts, PADDING, ALIGN, impl=impl)
        return (img, pts + jnp.asarray(1e-9, dtype), acc + out[0, 0, 0, 0].astype(jnp.float32) * 1e-6)

    return timeit_op(step, (img, pts, jnp.float32(0)), n=iters, repeats=4)


def bench_fwdbwd(impl, n, dtype=jnp.float32, iters=100):
    img, pts, wts, og = make_data(n, dtype)

    def step(carry):
        img, pts, acc = carry
        def f(i, p, w):
            return msda(i, SHAPES, p, w, PADDING, ALIGN, impl=impl)
        out, vjp = jax.vjp(f, img, pts, wts)
        ig, pg, wg = vjp(og)
        eps = jnp.asarray(1e-12, dtype)
        return (img + ig * eps, pts + pg * eps,
                acc + out[0, 0, 0, 0].astype(jnp.float32) * 1e-6)

    return timeit_op(step, (img, pts, jnp.float32(0)), n=iters, repeats=4)


def _memory_probe(impl, n, dtype=jnp.float32):
    """Extra device memory for one fwd+bwd beyond the inputs (reference
    scripts/benchmark.py:156-172 analogue).

    Uses XLA's compiled memory analysis (temp + output buffers), which is
    the compiler's exact allocation plan — this runtime's
    device.memory_stats() returns None, so runtime peak deltas are
    unavailable.  Runs in a fresh process so it can grab the device for
    compilation even while a sweep parent exists."""
    img, pts, wts, og = make_data(n, dtype)

    @jax.jit
    def run(img, pts, wts, og):
        def f(i, p, w):
            return msda(i, SHAPES, p, w, PADDING, ALIGN, impl=impl)
        out, vjp = jax.vjp(f, img, pts, wts)
        return out, vjp(og)

    try:
        compiled = run.lower(img, pts, wts, og).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            return float("nan")
        return (ma.temp_size_in_bytes + ma.output_size_in_bytes) / 1e6
    except Exception:
        # runtime-stats fallback (works on runtimes with memory_stats)
        stats0 = device_memory_stats()
        r = run(img, pts, wts, og)
        jax.block_until_ready(r)
        stats1 = device_memory_stats()
        if (
            not stats0
            or stats0.get("peak_bytes_in_use") is None
            or stats1.get("peak_bytes_in_use") is None
        ):
            return float("nan")
        return (stats1["peak_bytes_in_use"] - stats0["bytes_in_use"]) / 1e6


def _force_stream():
    """Route every pallas dispatch through the streamed kernels."""
    from msda_tpu.ops import pallas_stream as ps

    ps.RESIDENT_VMEM_BUDGET = 0


_FORCED_STREAM = False


def bench_memory(impl, n, dtype=jnp.float32):
    """Run the memory probe in a fresh subprocess (see _memory_probe)."""
    import subprocess

    pyr = next(k for k, v in PYRAMIDS.items() if v is SHAPES)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--memory-probe",
         impl, str(n), jnp.dtype(dtype).name, pyr,
         "1" if _FORCED_STREAM else "0"],
        capture_output=True, text=True, timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("MEMORY_MB "):
            return float(line.split()[1])
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", nargs="+", default=None)
    ap.add_argument("--queries", nargs="+", type=int,
                    default=[10, 100, 300, 900, 1000, 10000])
    ap.add_argument("--bf16", action="store_true",
                    help="also run the pallas path in bfloat16")
    ap.add_argument("--no-memory", action="store_true",
                    help="skip the (subprocess-based) memory probes")
    ap.add_argument("--memory-probe", nargs=5,
                    metavar=("IMPL", "N", "DT", "PYR", "STREAM"),
                    help=argparse.SUPPRESS)  # internal, fresh-process probe
    ap.add_argument("--pyramid", choices=list(PYRAMIDS), default="ref",
                    help="'big' benchmarks the large-pyramid geometry "
                         "(256x256 base level; the fwd still fits VMEM "
                         "residency there — the bwd streams)")
    ap.add_argument("--force-stream", action="store_true",
                    help="force impl='pallas' onto the streamed kernels "
                         "regardless of VMEM fit (captures the streamed "
                         "path's cost at geometries the resident kernels "
                         "would otherwise serve)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="skip (impl, dtype, N) rows already present in "
                         "--out or its .partial — lets a retry loop survive "
                         "this machine's intermittent TPU-tunnel hangs "
                         "without re-paying measured rows")
    args = ap.parse_args()
    if args.out is None:
        suffix = "_stream" if args.force_stream else ""
        args.out = ("outputs/benchmark_results.csv"
                    if args.pyramid == "ref" and not args.force_stream
                    else f"outputs/benchmark_{args.pyramid}{suffix}.csv")
    set_pyramid(args.pyramid)
    if args.force_stream:
        global _FORCED_STREAM
        _FORCED_STREAM = True
        _force_stream()

    if args.impls is None:
        # decided without touching jax in this process (the memory probes
        # below must be able to grab the device first): TPU availability
        # is probed by the first subprocess
        args.impls = (
            ["pallas", "reference"]
            if os.environ.get("MSDA_BENCH_IMPLS", "tpu") == "tpu"
            else ["reference", "fused"]
        )

    if args.memory_probe:
        impl, n, dt, pyr, stream = args.memory_probe
        set_pyramid(pyr)
        if stream == "1":
            _force_stream()
        mem = _memory_probe(impl, int(n), jnp.dtype(dt))
        print(f"MEMORY_MB {mem}")
        return

    configs = [(impl, jnp.float32) for impl in args.impls]
    if args.bf16:
        configs.append(("pallas", jnp.bfloat16))

    # rows already measured by an earlier (killed/partial) run
    done = {}
    if args.resume:
        for path in (args.out, args.out + ".partial"):
            if not os.path.exists(path):
                continue
            with open(path, newline="") as f:
                for row in csv.DictReader(f):
                    key = (row["impl"], row["dtype"],
                           int(row["num_queries"]))
                    done.setdefault(key, row)
        if done:
            print(f"resume: {len(done)} rows already measured", flush=True)

    # memory probes first — before this process touches the device
    mems = {}
    if not args.no_memory:
        for impl, dtype in configs:
            for n in args.queries:
                if (impl, jnp.dtype(dtype).name, n) in done:
                    continue
                mems[(impl, dtype, n)] = bench_memory(impl, n, dtype)
                print(f"mem probe {impl} {jnp.dtype(dtype).name} N={n}: "
                      f"{mems[(impl, dtype, n)]:.1f} MB", flush=True)

    # incremental CSV: each row is flushed (to args.out + ".partial") as
    # soon as it is measured, so a wall-clock bound (timeout ...) that
    # kills a long sweep mid-flight still leaves a loadable partial
    # artifact — while the previous COMPLETE args.out is preserved until
    # the new sweep finishes (atomic os.replace at the end)
    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    partial = args.out + ".partial"
    fieldnames = ["impl", "dtype", "num_queries",
                  "fwd_ms", "fwdbwd_ms", "peak_mem_mb"]
    with open(partial, "w", newline="") as csv_f:
        csv_w = csv.DictWriter(csv_f, fieldnames=fieldnames)
        csv_w.writeheader()
        csv_f.flush()

        for impl, dtype in configs:
            dt = jnp.dtype(dtype).name
            for n in args.queries:
                if (impl, dt, n) in done:
                    row = dict(done[(impl, dt, n)])
                    csv_w.writerow(row)
                    csv_f.flush()
                    print(f"{impl:10s} {dt:8s} N={n:6d}: resumed "
                          f"(fwd {row['fwd_ms']} ms, "
                          f"fwd+bwd {row['fwdbwd_ms']} ms)", flush=True)
                    continue
                # the XLA-gather reference is ~30x slower at large N (and
                # the big pyramid multiplies its gather table 16x); scale
                # the iteration count so one row stays under ~a minute
                slow = impl == "reference" and (
                    n >= 900 or args.pyramid != "ref")
                # the big pyramid's per-iteration cost is ~16x the
                # reference pyramid's (dense fold pays O(ipad)); mid-tier
                # iteration counts keep the sweep's wall clock bounded
                # while the slowest row still averages >= 25 measured
                # steps x 4 repeats
                mid = args.pyramid != "ref" and not slow
                print(f"... fwd {impl} {dt} N={n} (compiling+timing)",
                      flush=True)
                t_f = bench_fwd(
                    impl, n, dtype,
                    iters=20 if slow else (50 if mid else 150)) * 1e3
                print(f"... fwd done ({t_f:.3f} ms); fwd+bwd {impl} {dt} "
                      f"N={n}", flush=True)
                t_fb = bench_fwdbwd(
                    impl, n, dtype,
                    iters=10 if slow else (25 if mid else 100)) * 1e3
                mem = mems.get((impl, dtype, n), float("nan"))
                csv_w.writerow(dict(
                    impl=impl, dtype=dt, num_queries=n,
                    fwd_ms=round(t_f, 3), fwdbwd_ms=round(t_fb, 3),
                    peak_mem_mb=round(mem, 1)))
                csv_f.flush()
                base_f = (BASELINES.get(("fwd", n))
                          if args.pyramid == "ref" else None)
                base_fb = BASELINES.get(("fwdbwd", n))
                extra = ""
                if base_f:
                    extra = (f"  [baseline fwd {base_f} ms -> "
                             f"{base_f/t_f:.2f}x; "
                             f"fwd+bwd {base_fb} ms -> {base_fb/t_fb:.2f}x]")
                print(f"{impl:10s} {dt:8s} N={n:6d}: fwd {t_f:8.3f} ms, "
                      f"fwd+bwd {t_fb:8.3f} ms, mem {mem:8.1f} MB{extra}",
                      flush=True)

    os.replace(partial, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
