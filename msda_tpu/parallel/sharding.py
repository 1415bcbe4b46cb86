"""Multi-chip parallelism for MSDA models (mesh + sharding helpers).

The reference implementation is a single-GPU op library (no
torch.distributed anywhere — SURVEY §2); multi-chip execution is an
*extension* this framework adds the TPU-native way: a ``jax.sharding.Mesh``
with named axes, sharding annotations on the op's operands, and XLA/GSPMD
inserting the collectives.

MSDA itself is embarrassingly parallel over (batch, queries, heads) — no
query-query or cross-head interaction — so the natural shardings are:

    dp (data):     shard batch        — img, points, weights, out on axis 0
    tp (tensor):   shard heads        — img axis 2, points/weights axis 2
    sp (sequence): shard queries      — points/weights/out axis 1,
                                        pyramid replicated (it is small)

With these shardings the op itself requires **zero collectives**; cross-chip
communication only appears around it (e.g. the module's projections under
tp, or gradient all-reduce under dp), where GSPMD places it on ICI.
"""

from __future__ import annotations

from typing import Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "MSDA_SHARDINGS",
    "shard_msda_args",
    "sharded_multiscale_deformable_attention",
    "shard_map_multiscale_deformable_attention",
]


def make_mesh(axes: Mapping[str, int], devices=None) -> Mesh:
    """Build a Mesh from named axis sizes, e.g. {"dp": 2, "tp": 4}."""
    if devices is None:
        devices = jax.devices()
    sizes = tuple(axes.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices but only {len(devices)} available"
        )
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


# PartitionSpecs for the op operands / output given the (dp, sp, tp) axes.
#   img:   [B, I, H, C]   -> (dp, None, tp, None)
#   pts:   [B, N, H, L, P, 2] -> (dp, sp, tp, ...)
#   wts:   [B, N, H, L, P]    -> (dp, sp, tp, ...)
#   out:   [B, N, H, C]       -> (dp, sp, tp, None)
MSDA_SHARDINGS = {
    "img": P("dp", None, "tp", None),
    "img_shapes": P(None, None),
    "sampling_points": P("dp", "sp", "tp", None, None, None),
    "attention_weights": P("dp", "sp", "tp", None, None),
    "out": P("dp", "sp", "tp", None),
}


def shard_msda_args(mesh, img, img_shapes, sampling_points, attention_weights):
    """Place the op operands onto the mesh with the canonical shardings."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return (
        put(img, MSDA_SHARDINGS["img"]),
        put(img_shapes, MSDA_SHARDINGS["img_shapes"]),
        put(sampling_points, MSDA_SHARDINGS["sampling_points"]),
        put(attention_weights, MSDA_SHARDINGS["attention_weights"]),
    )


def sharded_multiscale_deformable_attention(
    mesh,
    img,
    img_shapes,
    sampling_points,
    attention_weights,
    padding_mode: str = "border",
    align_corners: bool = False,
    *,
    impl: str = "auto",
):
    """MSDA under a mesh: annotate shardings and let GSPMD partition.

    The op partitions cleanly along dp/sp/tp with no collectives; this
    wrapper exists so models can call one function and get the constraint
    placement right.
    """
    from ..ops import multiscale_deformable_attention

    def constrained(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    img = constrained(img, MSDA_SHARDINGS["img"])
    sampling_points = constrained(
        sampling_points, MSDA_SHARDINGS["sampling_points"]
    )
    attention_weights = constrained(
        attention_weights, MSDA_SHARDINGS["attention_weights"]
    )
    out = multiscale_deformable_attention(
        img,
        img_shapes,
        sampling_points,
        attention_weights,
        padding_mode,
        align_corners,
        impl=impl,
    )
    return constrained(out, MSDA_SHARDINGS["out"])


def shard_map_multiscale_deformable_attention(
    mesh,
    img,
    img_shapes,
    sampling_points,
    attention_weights,
    padding_mode: str = "border",
    align_corners: bool = False,
    *,
    impl: str = "auto",
):
    """MSDA via ``jax.shard_map``: each device runs the kernel on its local
    (batch, query, head) shard.

    This is the multi-chip path for the Pallas kernels: GSPMD cannot
    partition a ``pallas_call`` (``sharded_multiscale_deformable_attention``
    is for the partitionable XLA impls), whereas under shard_map every
    device traces the kernel on its local block shapes — and because MSDA
    has no cross-(batch, query, head) interaction, the op needs **zero
    collectives**: out_specs equals the natural output sharding with no
    psum.  ``img_shapes`` must be concrete (the kernels specialize on the
    pyramid geometry); it is closed over rather than sharded.
    """
    from functools import partial

    from ..ops import multiscale_deformable_attention

    shapes = np.asarray(jax.device_get(img_shapes)).astype(np.int32)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            MSDA_SHARDINGS["img"],
            MSDA_SHARDINGS["sampling_points"],
            MSDA_SHARDINGS["attention_weights"],
        ),
        out_specs=MSDA_SHARDINGS["out"],
        # the varying-mesh-axis checker cannot see through pallas_call
        # out_shapes (no vma on ShapeDtypeStruct); the op body has no
        # collectives, so the check adds nothing here
        check_vma=False,
    )
    def local_op(img_l, pts_l, wts_l):
        return multiscale_deformable_attention(
            img_l, shapes, pts_l, wts_l, padding_mode, align_corners,
            impl=impl,
        )

    return local_op(img, sampling_points, attention_weights)
