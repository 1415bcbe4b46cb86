"""Device-memory attribution report for a compiled MSDA fwd+bwd.

The reference measures a single runtime peak-memory delta per config
(/root/reference/scripts/benchmark.py:156-172).  This runtime's
``device.memory_stats()`` is unavailable, so the framework uses the
compiler's own allocation plan instead — which is *richer*: besides the
aggregate (``compiled.memory_analysis()``, what benchmark.py's
``peak_mem_mb`` column records), this report reconstructs approximate
buffer liveness from the scheduled HLO (on TPU the optimized module is
emitted in execution order) and attributes the arena peak to individual
instructions.  This is the method behind docs/PERF_NOTES.md's memory
campaign (546 -> 377 MB), packaged as a tool.

Usage:
    python scripts/memory_report.py [--impl pallas] [--queries 10000]
        [--dtype float32] [--pyramid ref] [--top 15] [--fwd-only]

Caveats: liveness is approximated at HLO instruction granularity
(def-to-last-use, whole-instruction outputs, no aliasing/donation
credit), so the reconstructed peak brackets — not equals — XLA's real
arena; use memory_analysis() for the exact aggregate.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MSDA_FORCE_CPU") == "1":
    # outage escape hatch, same contract as tests/conftest.py: the config
    # route is the only CPU pin that works on this machine
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"\b(pred|[suf]\d+|bf16|c64|c128)\[([\d,]*)\]")
_DEF_RE = re.compile(r"^\s+(%?[\w.\-]+) = (.*)$")
_REF_RE = re.compile(r"%[\w.\-]+")


def _shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def liveness_report(hlo_text: str, top: int = 15):
    """Approximate arena liveness from scheduled HLO text.

    Returns (peak_bytes, peak_index, [(bytes, name, shape_snippet), ...])
    for the buffers live at the peak program point of the entry
    computation.
    """
    # entry computation = the block headed by "ENTRY"
    lines = hlo_text.splitlines()
    try:
        start = next(i for i, l in enumerate(lines) if l.startswith("ENTRY"))
    except StopIteration:
        raise ValueError("no ENTRY computation in HLO text")
    body = []
    for line in lines[start + 1:]:
        if line.startswith("}"):
            break
        body.append(line)

    defs = []  # (name, size_bytes, def_idx, shape_snippet)
    last_use = {}
    by_name = {}
    for idx, line in enumerate(body):
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        # uses: every %ref on the RHS after the shape/op part
        for ref in _REF_RE.findall(rhs):
            if ref in by_name:
                last_use[ref] = idx
        shape_part = rhs.split(" ", 1)[0]
        size = _shape_bytes(shape_part)
        nm = name if name.startswith("%") else "%" + name
        by_name[nm] = (size, idx, shape_part)
        defs.append((nm, size, idx, shape_part))
        last_use.setdefault(nm, idx)

    # sweep: buffer live on [def_idx, last_use]
    events = np.zeros(len(body) + 1, np.int64)
    for nm, size, didx, _ in defs:
        events[didx] += size
        events[last_use[nm] + 1] -= size
    live = np.cumsum(events)
    peak_idx = int(np.argmax(live))
    peak = int(live[peak_idx])

    residents = [
        (size, nm, shape)
        for nm, size, didx, shape in defs
        if didx <= peak_idx <= last_use[nm] and size > 0
    ]
    residents.sort(reverse=True)
    return peak, peak_idx, residents[:top]


PYRAMIDS = {
    "ref": np.array([(64, 64), (32, 32), (16, 16), (8, 8)], np.int32),
    "big": np.array([(256, 256), (128, 128), (64, 64), (32, 32)], np.int32),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--queries", type=int, default=10000)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--pyramid", choices=list(PYRAMIDS), default="ref")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    from msda_tpu.ops import multiscale_deformable_attention as msda

    shapes = PYRAMIDS[args.pyramid]
    B, H, C, P, L = 4, 8, 32, 4, len(shapes)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    n = args.queries
    dtype = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = jax.random.normal(k1, (B, I, H, C), dtype)
    pts = jax.random.uniform(k2, (B, n, H, L, P, 2), dtype)
    wts = jax.nn.softmax(jax.random.normal(k3, (B, n, H, L, P), dtype), -1)
    og = jax.random.uniform(k4, (B, n, H, C), dtype)

    if args.fwd_only:
        @jax.jit
        def run(img, pts, wts, og):
            return msda(img, shapes, pts, wts, "border", True,
                        impl=args.impl)
    else:
        @jax.jit
        def run(img, pts, wts, og):
            def f(i, p, w):
                return msda(i, shapes, p, w, "border", True, impl=args.impl)
            out, vjp = jax.vjp(f, img, pts, wts)
            return out, vjp(og)

    compiled = run.lower(img, pts, wts, og).compile()
    ma = compiled.memory_analysis()
    print(f"config: impl={args.impl} N={n} dtype={dtype.name} "
          f"pyramid={args.pyramid} "
          f"{'fwd' if args.fwd_only else 'fwd+bwd'}")
    if ma is not None:
        print(f"memory_analysis: temp {ma.temp_size_in_bytes/1e6:.1f} MB, "
              f"output {ma.output_size_in_bytes/1e6:.1f} MB, "
              f"argument {ma.argument_size_in_bytes/1e6:.1f} MB  "
              f"[metric temp+output = "
              f"{(ma.temp_size_in_bytes+ma.output_size_in_bytes)/1e6:.1f} MB]")
    else:
        print("memory_analysis: unavailable on this backend")

    peak, peak_idx, residents = liveness_report(
        compiled.as_text(), top=args.top)
    print(f"\napprox HLO liveness peak: {peak/1e6:.1f} MB at instruction "
          f"#{peak_idx}; top buffers live there:")
    for size, nm, shape in residents:
        print(f"  {size/1e6:9.1f} MB  {nm:32s} {shape}")


if __name__ == "__main__":
    main()
