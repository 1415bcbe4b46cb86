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

_DTYPE_BITS = {
    "pred": 8, "s2": 2, "u2": 2, "s4": 4, "u4": 4, "s8": 8, "u8": 8,
    "s16": 16, "u16": 16, "bf16": 16, "f16": 16,
    "f8e4m3": 8, "f8e5m2": 8, "f8e4m3fn": 8, "f8e4m3b11fnuz": 8,
    "f8e5m2fnuz": 8, "f8e4m3fnuz": 8, "f8e8m0fnu": 8, "f4e2m1fn": 4,
    "s32": 32, "u32": 32, "f32": 32, "s64": 64, "u64": 64, "f64": 64,
    "c64": 64, "c128": 128,
}

_SHAPE_RE = re.compile(r"\b(pred|bf16|c64|c128|f8e\w+|f4e\w+|[suf]\d+)\[([\d,]*)\]")
_DEF_RE = re.compile(r"^\s+(?:ROOT )?(%?[\w.\-]+) = (.*)$")
_REF_RE = re.compile(r"%[\w.\-]+")
# bare-name HLO dumps (HloPrintOptions without '%' prefixes): candidate
# operand tokens; matched against the defined-buffer set so opcode /
# attribute words are ignored
_BARE_TOKEN_RE = re.compile(r"[\w.\-]+")


def _shape_bytes(text: str) -> int:
    total_bits = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total_bits += n * _DTYPE_BITS.get(dt, 32)
    return (total_bits + 7) // 8


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

    # '%'-prefixed dumps identify refs unambiguously; bare-name dumps
    # (HloPrintOptions without the prefix) need candidate tokens filtered
    # against the defined-buffer set (opcode/attribute words fall out
    # because they are never defined as buffers)
    percent_style = any("%" in line for line in body)

    defs = []  # (name, size_bytes, def_idx, shape_snippet)
    last_use = {}
    by_name = {}
    any_use = False
    for idx, line in enumerate(body):
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        # uses: every ref to an already-defined buffer on the RHS
        tokens = (_REF_RE.findall(rhs) if percent_style
                  else _BARE_TOKEN_RE.findall(rhs))
        for tok in tokens:
            ref = tok if tok.startswith("%") else "%" + tok
            if ref in by_name:
                last_use[ref] = idx
                any_use = True
        # the output shape is the leading token, OR the full parenthesized
        # tuple for multi-output instructions (fusions etc.) — a naive
        # first-space split would count only the first tuple leaf
        if rhs.startswith("(") and ")" in rhs:
            shape_part = rhs[:rhs.index(")") + 1]
        else:
            shape_part = rhs.split(" ", 1)[0]
        size = _shape_bytes(shape_part)
        nm = name if name.startswith("%") else "%" + name
        by_name[nm] = (size, idx, shape_part)
        defs.append((nm, size, idx, shape_part))
        last_use.setdefault(nm, idx)

    if len(defs) > 5 and not any_use:
        # every buffer would die at its own def — that is a parser/format
        # mismatch, and silently reporting it would massively underestimate
        # the arena peak while looking authoritative
        raise ValueError(
            "HLO liveness parse matched no operand uses across "
            f"{len(defs)} instructions — unrecognized HLO print format"
        )

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
    from msda_tpu.utils import reference_workload

    n = args.queries
    dtype = jnp.dtype(args.dtype)
    img, shapes, pts, wts, og = reference_workload(
        num_queries=n, dtype=dtype, shapes=PYRAMIDS[args.pyramid])

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
        # apples-to-apples with the reference's 166 MB anchor: torch's
        # max_memory_allocated delta (/root/reference/scripts/
        # benchmark.py:156-172) counts everything allocated inside the
        # measured window — which at the benchmark point is ~149 MB of
        # out / out_grad / input-grad buffers plus only ~17 MB of kernel
        # transients (the Triton kernel materializes nothing but its
        # outputs).  The XLA metric above counts the out_grad as an
        # *argument* instead, so the two comparable splits are:
        # outputs-side  repo output_size  vs  torch's ~149 MB window
        # allocations; transient-side  repo temp arena  vs  torch's
        # ~17 MB remainder.
        print(f"transient-only arena (outputs excluded, the share "
              f"comparable to the reference delta's non-output remainder): "
              f"{ma.temp_size_in_bytes/1e6:.1f} MB")
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
