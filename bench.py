"""Headline benchmark for the driver: one JSON line on stdout.

Workload = the reference's benchmark config at its headline point
(scripts/benchmark.py:24-31 in /root/reference): B=4, H=8, C=32, P=4,
pyramid (64,64),(32,32),(16,16),(8,8), fp32, padding=border,
align_corners=True, num_queries=10000, fwd+bwd.

Baseline = the reference Triton kernel on an RTX 2060: fwd+bwd 22.78 ms
(reference README.md:19, recorded in BASELINE.md).  ``vs_baseline`` is the
speedup factor baseline_ms / our_ms (>1 means faster than baseline).

Outage behavior: this machine's TPU tunnel can die such that backend
attach blocks indefinitely (observed 2026-08-17/18: >25 min hangs).  To
keep the driver's record diagnosable, the script (a) probes backend
attach in short-timeout subprocesses with retries BEFORE committing this
process to jax initialization, (b) prints heartbeat lines to stderr after
attach and after first compile, and (c) on any abort path emits a JSON
line with an ``"error"`` key so a dead tunnel is distinguishable from a
kernel regression.
"""

import json
import os
import subprocess
import sys
import threading
import time

_T0 = time.monotonic()
# three metrics = 6 scan compiles through the remote compile helper at
# 2-4 min each on a loaded service, so the wall budget must cover
# ~15-20 min; each metric line is flushed the moment it is measured, so
# even a harder external kill preserves what's captured
_WATCHDOG_SECS = int(os.environ.get("MSDA_BENCH_WATCHDOG_SECS", "1500"))
# healthy attach takes ~20-40 s on this machine; 120 s is generous while
# keeping the worst case (2 hung probes + a full CPU fallback measurement)
# inside a ~15 min driver budget
_PROBE_SECS = int(os.environ.get("MSDA_BENCH_PROBE_SECS", "120"))
_PROBE_TRIES = int(os.environ.get("MSDA_BENCH_PROBE_TRIES", "2"))


def _hb(msg):
    sys.stderr.write(f"bench.py[{time.monotonic() - _T0:7.1f}s]: {msg}\n")
    sys.stderr.flush()


def _fail(error, detail=""):
    """Emit a machine-readable failure record and exit nonzero."""
    print(json.dumps({
        "metric": "MSDA fwd+bwd latency @10k queries fp32",
        "value": None,
        "unit": "ms",
        "vs_baseline": None,
        "error": error,
        "detail": detail,
        "elapsed_s": round(time.monotonic() - _T0, 1),
    }), flush=True)
    os._exit(3)


def _probe_attach():
    """Check TPU attach in a disposable subprocess so a hung tunnel never
    blocks THIS process.  Returns the backend name, or ``None`` after the
    retry budget (caller falls back to a CPU-pinned measurement so the
    driver still records a number plus the outage diagnosis)."""
    code = "import jax; print(jax.default_backend())"
    for attempt in range(1, _PROBE_TRIES + 1):
        _hb(f"attach probe {attempt}/{_PROBE_TRIES} "
            f"(timeout {_PROBE_SECS}s)...")
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=_PROBE_SECS,
            )
        except subprocess.TimeoutExpired:
            _hb("attach probe timed out (tunnel hung)")
            continue
        if proc.returncode == 0 and proc.stdout.strip():
            backend = proc.stdout.strip().splitlines()[-1]
            _hb(f"attach probe OK: backend={backend}")
            return backend
        _hb(f"attach probe rc={proc.returncode}: "
            f"{(proc.stderr or '').strip()[-300:]}")
    _hb(
        f"{_PROBE_TRIES} attach probes failed/timed out at {_PROBE_SECS}s "
        "each — TPU tunnel dead or backend attach hung; falling back to a "
        "CPU-pinned interpreter measurement so the round still records a "
        "number (clearly labeled) alongside the outage diagnosis"
    )
    return None


_EMITTED = 0  # metric lines already printed (see _watchdog)


def _watchdog():
    if _EMITTED:
        # at least one metric line (incl. the compatibility-named first
        # line) is already on stdout — exiting 0 preserves it as the
        # parsed record instead of overwriting it with an error line
        _hb(f"watchdog: wall budget spent after {_EMITTED} metric(s); "
            "stopping early, keeping what was measured")
        os._exit(0)
    _fail(
        "bench_watchdog_timeout",
        f"no result within ~{_WATCHDOG_SECS}s total wall time — compile "
        "service stall or kernel-runtime hang (attach itself succeeded "
        "or fell back to CPU)",
    )


# The probe and watchdog arm only when executed as a script (the driver's
# invocation) — an importer should not inherit a process-killing timer.
# Both must happen HERE, before `import jax`: the hang being guarded
# against is the backend attach inside jax initialization.
_FORCE_CPU = os.environ.get("MSDA_FORCE_CPU") == "1"
_OUTAGE = ""
if __name__ == "__main__":
    if not _FORCE_CPU and _probe_attach() is None:
        _FORCE_CPU = True
        _OUTAGE = (
            "tpu_attach_timeout: TPU tunnel dead or backend attach hung "
            "(environment outage, not a kernel regression); value below is "
            "the CPU-interpreter fallback, NOT the TPU headline"
        )
    # deduct the probes' elapsed time so the TOTAL wall budget stays
    # ~_WATCHDOG_SECS: a driver hard-kill must never beat the watchdog to
    # the punch, or the diagnostic JSON this script guarantees is lost
    _remaining = max(60.0, _WATCHDOG_SECS - (time.monotonic() - _T0))
    _timer = threading.Timer(_remaining, _watchdog)
    _timer.daemon = True  # never outlive a successful run
    _timer.start()

import jax

if _FORCE_CPU:
    # outage escape hatch (same contract as tests/conftest.py): pin jax
    # to host CPU via the config route — verified to keep the hanging TPU
    # client from being constructed even mid-outage.  The emitted metric
    # names the impl, so a CPU-interpreter number cannot be mistaken for
    # the TPU headline.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def _bench_one(msda, timeit_op, reference_workload, impl, dtype, mode,
               n_iters, repeats):
    """Median ms/iteration for one (dtype, fwd|fwdbwd) headline config."""
    img, shapes, pts, wts, og = reference_workload(
        num_queries=10000, dtype=dtype)

    if mode == "fwdbwd":
        def step(carry):
            img, pts, acc = carry
            def f(i, p, w):
                return msda(i, shapes, p, w, "border", True, impl=impl)
            out, vjp = jax.vjp(f, img, pts, wts)
            ig, pg, wg = vjp(og)
            eps = jnp.asarray(1e-12, dtype)
            return (img + ig * eps, pts + pg * eps,
                    acc + out[0, 0, 0, 0].astype(jnp.float32) * 1e-6)
    else:
        def step(carry):
            img, pts, acc = carry
            out = msda(img, shapes, pts, wts, "border", True, impl=impl)
            return (img, pts + jnp.asarray(1e-9, dtype),
                    acc + out[0, 0, 0, 0].astype(jnp.float32) * 1e-6)

    return timeit_op(step, (img, pts, jnp.float32(0)), n=n_iters,
                     repeats=repeats) * 1e3


def main():
    sys.path.insert(0, ".")
    from msda_tpu.ops import multiscale_deformable_attention as msda
    from msda_tpu.utils import reference_workload, timeit_op

    _hb(f"backend attached: {jax.default_backend()}")

    impl = "pallas" if jax.default_backend() == "tpu" else "reference"

    # Three headline metrics (anchors: reference README.md:18-19 on RTX
    # 2060 — fwd+bwd 22.78 ms, fwd 3.78 ms; the bf16 row reuses the fp32
    # fwd+bwd anchor, the reference publishes no half-precision number).
    # The fp32 fwd+bwd line stays FIRST and keeps its historical metric
    # name so BENCH_r01..r04 comparisons stay valid; each line is emitted
    # as soon as it is measured so a watchdog abort preserves the lines
    # already captured.  The XLA-interpreter CPU fallback is ~35x slower
    # per step, so an outage run keeps only the compatibility metric with
    # a scaled-down iteration count to stay inside the watchdog.
    configs = [
        ("MSDA fwd+bwd latency @10k queries fp32", jnp.float32,
         "fwdbwd", 22.78),
    ]
    if impl == "pallas":
        configs += [
            ("MSDA fwd+bwd latency @10k queries bf16", jnp.bfloat16,
             "fwdbwd", 22.78),
            ("MSDA fwd latency @10k queries fp32", jnp.float32,
             "fwd", 3.78),
        ]

    # large n amortizes the per-dispatch tunnel overhead (~30 ms/dispatch
    # measured), matching the reference's warmup=100/rep=1000 methodology
    n_iters = 150 if impl == "pallas" else 15
    repeats = 3 if impl == "pallas" else 2

    for name, dtype, mode, baseline_ms in configs:
        _hb(f"timing {name} (includes the 2 scan compiles)...")
        ms = _bench_one(msda, timeit_op, reference_workload, impl, dtype,
                        mode, n_iters, repeats)
        record = {
            "metric": f"{name} ({impl})",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(baseline_ms / ms, 4),
        }
        if _OUTAGE:
            record["error"] = _OUTAGE
        print(json.dumps(record), flush=True)
        global _EMITTED
        _EMITTED += 1
    _hb("timing done")


if __name__ == "__main__":
    main()
