"""End-to-end training demo: Deformable-DETR on synthetic detection data.

Exercises the full framework in one place — the DETR model family (with
iterative box refinement + two-stage proposals), the auction-matched
detection loss with deep supervision, the (dp, sp, tp) sharded train step,
and atomic checkpointing with resume — on synthetic boxes, so it runs
anywhere (single TPU, CPU, or a virtual CPU mesh).

Usage:
    python scripts/train_demo.py [--steps 20] [--mesh dp=2,sp=2,tp=2]
                                 [--ckpt-dir /tmp/msda_demo_ckpt]

With --mesh it builds an n-device mesh (on CPU devices when the product
exceeds the real device count) and runs the GSPMD-sharded train step;
without it, a plain single-device jit loop.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MSDA_FORCE_CPU") == "1":
    # outage escape hatch (same contract as tests/conftest.py): pin
    # jax to host CPU via the config route before any device access
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

SHAPES = np.array([(16, 16), (8, 8), (4, 4)], np.int32)
LEVEL_DIMS = [(int(h), int(w)) for h, w in SHAPES]
NUM_CLASSES = 8
NUM_QUERIES = 16
FEAT_C = 32


def synthetic_batch(rng, batch):
    """Features + consistent targets: each image contains a few 'objects'
    whose features are bumps the model can actually learn to localize."""
    pyramid = [
        rng.standard_normal((batch, h, w, FEAT_C)).astype(np.float32) * 0.1
        for h, w in LEVEL_DIMS
    ]
    m = NUM_QUERIES
    labels = rng.integers(0, NUM_CLASSES - 1, (batch, m)).astype(np.int32)
    boxes = rng.random((batch, m, 4)).astype(np.float32)
    boxes[..., 2:] = 0.1 + 0.2 * boxes[..., 2:]  # sane widths/heights
    mask = (rng.random((batch, m)) < 0.5).astype(np.float32)
    mask[:, 0] = 1.0
    # paint a feature bump at each object's center on level 0
    h0, w0 = LEVEL_DIMS[0]
    for b in range(batch):
        for j in range(m):
            if mask[b, j]:
                cx = min(int(boxes[b, j, 0] * w0), w0 - 1)
                cy = min(int(boxes[b, j, 1] * h0), h0 - 1)
                pyramid[0][b, cy, cx, labels[b, j] % FEAT_C] += 2.0
    targets = {
        "labels": jnp.asarray(labels),
        "boxes": jnp.asarray(boxes),
        "mask": jnp.asarray(mask),
    }
    return [jnp.asarray(p) for p in pyramid], targets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--mesh", default=None,
                    help="e.g. dp=2,sp=2,tp=2 (CPU devices if needed)")
    ap.add_argument("--ckpt-dir", default="/tmp/msda_demo_ckpt")
    ap.add_argument("--ckpt-every", type=int, default=10)
    ap.add_argument("--class-loss", choices=["ce", "focal"], default="ce",
                    help="classification objective: softmax CE with "
                         "background (pairs with softmax decode) or "
                         "sigmoid focal (pairs with sigmoid decode)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 mixed precision: f32 master params, bf16 "
                         "stack + the op's single-pass bf16 kernel scheme")
    args = ap.parse_args()

    from msda_tpu.models.detr import DeformableDetr
    from msda_tpu.parallel import TrainCheckpointer

    rng = np.random.default_rng(0)
    mesh = None
    if args.mesh:
        from msda_tpu.parallel import make_mesh

        axes = dict(kv.split("=") for kv in args.mesh.split(","))
        axes = {k: int(v) for k, v in axes.items()}
        n = int(np.prod(list(axes.values())))
        devices = jax.devices()
        if len(devices) < n:
            try:
                devices = jax.devices("cpu")
            except RuntimeError:
                devices = []
        if len(devices) < n and os.environ.get("_MSDA_DEMO_CHILD") != "1":
            # acquire n virtual CPU devices in a child process (the flag
            # must be set before jax initializes)
            import subprocess

            env = dict(os.environ, _MSDA_DEMO_CHILD="1")
            flags = env.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                env["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={n}"
                ).strip()
            raise SystemExit(subprocess.run(
                [sys.executable] + sys.argv, env=env).returncode)
        mesh = make_mesh(axes, devices[:n])
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
              f"on {mesh.devices.ravel()[0].platform}")

    model = DeformableDetr(
        num_classes=NUM_CLASSES, emb_dim=64, num_heads=4, num_points=2,
        num_queries=NUM_QUERIES, num_encoder_layers=1, num_decoder_layers=2,
        ffn_dim=128, with_box_refinement=True,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        impl="reference" if mesh is not None else "auto", mesh=mesh,
    )
    pyramid, targets = synthetic_batch(rng, args.batch)
    params = model.init(jax.random.PRNGKey(0), pyramid, SHAPES)
    tx = optax.adamw(3e-4)
    opt_state = tx.init(params)

    ckpt = TrainCheckpointer(args.ckpt_dir)
    start = 0
    if ckpt.steps():
        start, params, opt_state = ckpt.restore(params, opt_state)
        print(f"resumed from step {start}")

    # one code path for both modes: the public training API builds the
    # step (matcher threading included — no hand-rolled loss closure)
    from contextlib import nullcontext

    from msda_tpu.parallel import make_train_step, replicate_params

    with (mesh if mesh is not None else nullcontext()):
        if mesh is not None:
            params = replicate_params(params, mesh)
            opt_state = replicate_params(opt_state, mesh)
        train_step = make_train_step(model, tx, mesh, SHAPES,
                                     matcher="auction",
                                     class_loss=args.class_loss,
                                     return_metrics=True)
        t0 = time.perf_counter()
        for step in range(start, start + args.steps):
            params, opt_state, loss, metrics = train_step(
                params, opt_state, pyramid, targets)
            if (step + 1) % 5 == 0 or step == start:
                # surface a non-converged (argmin-fallback) auction
                # matching instead of silently training on duplicate
                # assignments.  Pulled only on logging steps: a per-step
                # bool() would block on a device->host sync every
                # iteration and serialize async dispatch.
                matched = bool(metrics["matcher_converged"])
                flag = "" if matched else "  [matcher NOT converged]"
                print(f"step {step + 1:4d}  loss {float(loss):.4f}{flag}")
            if (step + 1) % args.ckpt_every == 0:
                ckpt.save(step + 1, params, opt_state)

    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({dt / args.steps * 1e3:.1f} ms/step); "
          f"checkpoints: {ckpt.steps()} under {args.ckpt_dir}")


if __name__ == "__main__":
    main()
