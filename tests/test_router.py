"""Fail-soft VMEM routing tests (VERDICT r4 ask #4).

The resident-kernel VMEM footprint model (pallas_stream._fwd_resident_bytes
/ _bwd_resident_bytes) is a hand-fit heuristic; when it under-estimates, the
Mosaic allocator rejects the kernel at compile time.  The router in
pallas_fwd/_route_* must catch exactly that failure class, downshift the
query block, and finally fall back to the streamed kernels — never
surfacing a compile error through the public op.

CPU lane: the probe machinery is exercised with a stubbed AOT compile (the
real Mosaic allocator only exists on TPU).  The TPU slow lane additionally
compiles a geometry near the budget boundary for real (test_pallas.py-style
gating).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import msda_tpu.ops.pallas_fwd as pfwd
import msda_tpu.ops.pallas_stream as ps
from conftest import oracle_device, requires_tpu
from utils import get_functional_data

FAKE_OOM = RuntimeError(
    "RESOURCE_EXHAUSTED: Mosaic failed to compile TPU kernel: Attempting "
    "to allocate 123.4M in vmem. Scoped allocation limit 100.0M."
)


def test_mosaic_vmem_oom_matcher():
    assert pfwd._mosaic_vmem_oom(FAKE_OOM)
    assert pfwd._mosaic_vmem_oom(
        RuntimeError("program ... exceeds the vmem limit of 131072 bytes"))
    assert not pfwd._mosaic_vmem_oom(ValueError("shape mismatch [8, 128]"))
    assert not pfwd._mosaic_vmem_oom(
        TypeError("unsupported operand dtype int64"))


def _isolate_route_cache(monkeypatch, tmp_path):
    monkeypatch.setenv("MSDA_ROUTE_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(pfwd, "_ROUTE_CACHE", {})
    monkeypatch.setattr(pfwd, "_ROUTE_CACHE_LOADED", False)


def test_route_resident_probe_cache_and_margin(monkeypatch, tmp_path):
    _isolate_route_cache(monkeypatch, tmp_path)
    calls = []

    def probe_ok():
        calls.append("probe")

    # comfortably inside the envelope: admitted without a probe compile
    assert pfwd._route_resident("fwd", ("k1",), 10.0, 100.0, probe_ok)
    assert calls == []
    # margin band: probed once, then served from the cache
    assert pfwd._route_resident("fwd", ("k2",), 80.0, 100.0, probe_ok)
    assert calls == ["probe"]
    assert pfwd._route_resident("fwd", ("k2",), 80.0, 100.0, probe_ok)
    assert calls == ["probe"]

    # a VMEM OOM downshifts (returns False) and is cached
    def probe_oom():
        calls.append("oom")
        raise FAKE_OOM

    assert not pfwd._route_resident("fwd", ("k3",), 80.0, 100.0, probe_oom)
    assert not pfwd._route_resident("fwd", ("k3",), 80.0, 100.0, probe_oom)
    assert calls == ["probe", "oom"]

    # non-VMEM compile errors are real bugs and must propagate
    def probe_bug():
        raise ValueError("lowering bug")

    with pytest.raises(ValueError, match="lowering bug"):
        pfwd._route_resident("fwd", ("k4",), 80.0, 100.0, probe_bug)


def test_route_decisions_persist_across_processes(monkeypatch, tmp_path):
    """A probe outcome written by one process must be readable by a fresh
    cache (Mosaic recompiles per process; the decision should not)."""
    _isolate_route_cache(monkeypatch, tmp_path)

    def probe_oom():
        raise FAKE_OOM

    assert not pfwd._route_resident("fwd", ("kp",), 80.0, 100.0, probe_oom)

    # simulate a fresh process: empty in-memory cache, same disk dir
    monkeypatch.setattr(pfwd, "_ROUTE_CACHE", {})
    monkeypatch.setattr(pfwd, "_ROUTE_CACHE_LOADED", False)

    def probe_must_not_run():
        raise AssertionError("probe re-ran despite persisted decision")

    assert not pfwd._route_resident(
        "fwd", ("kp",), 80.0, 100.0, probe_must_not_run)


def _stub_pallas_fwd(fail_nblks):
    """Stand-in for the jitted _pallas_fwd whose AOT compile fails with a
    Mosaic VMEM OOM for the given query blocks."""

    def lower(*args, **kwargs):
        def compile_():
            if kwargs["nblk"] in fail_nblks:
                raise FAKE_OOM

        return types.SimpleNamespace(compile=compile_)

    return types.SimpleNamespace(lower=lower)


def test_route_fwd_nblk_downshifts_on_probe_oom(monkeypatch, tmp_path):
    _isolate_route_cache(monkeypatch, tmp_path)
    img, shapes, pts, wts, _ = get_functional_data()
    img, pts, wts = jnp.asarray(img), jnp.asarray(pts), jnp.asarray(wts)
    shapes64 = np.asarray(shapes, np.int64)
    shapes_tuple = tuple((int(h), int(w)) for h, w in shapes64)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # budget just above the nblk0 estimate -> every candidate that fits is
    # in the probe margin band or below; nblk0's probe OOMs, 512's passes
    nblk0 = pfwd._pick_nblk(pts.shape[1], shapes64, img.shape[3], "x3")
    est0 = ps._fwd_resident_bytes(shapes64, img.shape[3], nblk0, "x3")
    monkeypatch.setattr(ps, "RESIDENT_VMEM_BUDGET", int(est0 * 1.05))
    monkeypatch.setattr(pfwd, "_pallas_fwd", _stub_pallas_fwd({nblk0}))

    got = pfwd._route_fwd_nblk(
        img, pts, wts, shapes64, shapes_tuple, "border", False, "x3", nblk0)
    assert got is not None and got < nblk0


def test_route_fwd_nblk_streams_when_nothing_compiles(monkeypatch, tmp_path):
    _isolate_route_cache(monkeypatch, tmp_path)
    img, shapes, pts, wts, _ = get_functional_data()
    img, pts, wts = jnp.asarray(img), jnp.asarray(pts), jnp.asarray(wts)
    shapes64 = np.asarray(shapes, np.int64)
    shapes_tuple = tuple((int(h), int(w)) for h, w in shapes64)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    nblk0 = pfwd._pick_nblk(pts.shape[1], shapes64, img.shape[3], "x3")
    est_min = ps._fwd_resident_bytes(
        shapes64, img.shape[3], pfwd._MIN_NBLK, "x3")
    # budget such that even the smallest block sits in the margin band
    monkeypatch.setattr(ps, "RESIDENT_VMEM_BUDGET", int(est_min * 1.9))
    monkeypatch.setattr(
        pfwd, "_pallas_fwd", _stub_pallas_fwd(set(pfwd._fwd_nblk_ladder(nblk0))))

    got = pfwd._route_fwd_nblk(
        img, pts, wts, shapes64, shapes_tuple, "border", False, "x3", nblk0)
    assert got is None


def test_public_op_streams_when_router_gives_up(monkeypatch):
    """The public wrapper must hand a router give-up to the streamed path,
    not raise — no pyramid geometry can hard-fail compile through it."""
    img, shapes, pts, wts, _ = get_functional_data()
    img, pts, wts = jnp.asarray(img), jnp.asarray(pts), jnp.asarray(wts)

    monkeypatch.setattr(pfwd, "_route_fwd_nblk",
                        lambda *a, **k: None)
    streamed = []

    def spy_stream_fwd(img, pts, wts, **kwargs):
        streamed.append(kwargs["shapes_tuple"])
        B, _, H, C = img.shape
        return jnp.zeros((B, pts.shape[1], H, C), img.dtype)

    monkeypatch.setattr(ps, "stream_fwd", spy_stream_fwd)

    out = pfwd.pallas_multiscale_deformable_attention(
        img, shapes, pts, wts, "border", False, interpret=False)
    assert streamed and out.shape == (img.shape[0], pts.shape[1],
                                      img.shape[2], img.shape[3])


def _near_boundary_pyramid(C, nblk, scheme, budget):
    """A pyramid whose resident-fwd estimate lands in the probe margin
    band (0.5-0.95 of the budget) — the zone the router probe-compiles."""
    for base in range(96, 1024, 16):
        shapes = np.array(
            [(base, base), (base // 2, base // 2),
             (base // 4, base // 4), (base // 8, base // 8)], np.int64)
        est = ps._fwd_resident_bytes(shapes, C, nblk, scheme)
        if 0.5 * budget < est < 0.95 * budget:
            return shapes
    raise AssertionError("no margin-band geometry found")


@requires_tpu
@pytest.mark.slow
def test_tpu_near_boundary_geometry_compiles_through_public_op():
    """End-to-end on the real Mosaic allocator: a geometry in the probe
    margin band must compile and match the interpreter — through the
    public op, with the router active."""
    from msda_tpu.ops import multiscale_deformable_attention as msda

    C, scheme = 32, "x3"
    budget = ps.RESIDENT_VMEM_BUDGET
    nblk = pfwd._pick_nblk(1000, None)
    shapes = _near_boundary_pyramid(C, nblk, scheme, budget)
    shapes32 = shapes.astype(np.int32)

    rng = np.random.default_rng(0)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    B, H, N, L, P = 1, 2, 1000, 4, 2
    img = rng.standard_normal((B, I, H, C)).astype(np.float32)
    pts = rng.random((B, N, H, L, P, 2)).astype(np.float32)
    wts = rng.random((B, N, H, L, P)).astype(np.float32)

    got = np.asarray(msda(img, shapes32, pts, wts, "border", True,
                          impl="pallas"))
    with oracle_device():
        want = np.asarray(msda(img, shapes32, pts, wts, "border", True,
                               impl="reference"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
