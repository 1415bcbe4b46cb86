"""Headline benchmark for the driver: one JSON line on stdout.

Workload = the reference's benchmark config at its headline point
(scripts/benchmark.py:24-31 in /root/reference): B=4, H=8, C=32, P=4,
pyramid (64,64),(32,32),(16,16),(8,8), fp32, padding=border,
align_corners=True, num_queries=10000, fwd+bwd.

Baseline = the reference Triton kernel on an RTX 2060: fwd+bwd 22.78 ms
(reference README.md:19, recorded in BASELINE.md).  ``vs_baseline`` is the
speedup factor baseline_ms / our_ms (>1 means faster than baseline).
"""

import json
import os
import sys
import threading

# Watchdog BEFORE touching jax: a dead TPU tunnel makes backend attach
# block indefinitely (observed on this machine: >25 min hangs, then
# UNAVAILABLE); fail loudly instead of hanging the driver.  Generous
# bound: attach + ~6 kernel compiles through the remote compile helper
# normally finish well inside 15 min.
_WATCHDOG_SECS = int(os.environ.get("MSDA_BENCH_WATCHDOG_SECS", "900"))


def _watchdog():
    sys.stderr.write(
        f"bench.py: no result within {_WATCHDOG_SECS}s "
        "(TPU backend attach/compile stuck?) — aborting\n"
    )
    sys.stderr.flush()
    os._exit(3)


# arm only when executed as a script (the driver's invocation) — an
# importer should not inherit a process-killing timer.  This must happen
# HERE, before `import jax`: the hang being guarded against is the
# backend attach inside jax initialization.
if __name__ == "__main__":
    _timer = threading.Timer(_WATCHDOG_SECS, _watchdog)
    _timer.daemon = True  # never outlive a successful run
    _timer.start()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, ".")
    from msda_tpu.ops import multiscale_deformable_attention as msda
    from msda_tpu.utils import timeit_op

    shapes = np.array([(64, 64), (32, 32), (16, 16), (8, 8)], np.int32)
    B, H, C, P, L = 4, 8, 32, 4, 4
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    N = 10000
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = jax.random.normal(k1, (B, I, H, C), jnp.float32)
    pts = jax.random.uniform(k2, (B, N, H, L, P, 2), jnp.float32)
    wts = jax.nn.softmax(jax.random.normal(k3, (B, N, H, L, P), jnp.float32), -1)
    og = jax.random.uniform(k4, (B, N, H, C), jnp.float32)

    impl = "pallas" if jax.default_backend() == "tpu" else "reference"

    def step(carry):
        img, pts, acc = carry
        def f(i, p, w):
            return msda(i, shapes, p, w, "border", True, impl=impl)
        out, vjp = jax.vjp(f, img, pts, wts)
        ig, pg, wg = vjp(og)
        return (img + ig * 1e-12, pts + pg * 1e-12,
                acc + out[0, 0, 0, 0] * 1e-6)

    # large n amortizes the per-dispatch tunnel overhead (~30 ms/dispatch
    # measured), matching the reference's warmup=100/rep=1000 methodology
    t = timeit_op(step, (img, pts, jnp.float32(0)), n=150, repeats=3)
    ms = t * 1e3
    baseline_ms = 22.78
    print(json.dumps({
        "metric": f"MSDA fwd+bwd latency @10k queries fp32 ({impl})",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ms, 4),
    }))


if __name__ == "__main__":
    main()
