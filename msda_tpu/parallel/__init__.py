"""Parallelism: mesh construction, canonical shardings, sharded training."""

from .sharding import (
    make_mesh,
    MSDA_SHARDINGS,
    shard_msda_args,
    sharded_multiscale_deformable_attention,
    shard_map_multiscale_deformable_attention,
)
from .matcher import auction_assignment, matching_cost
from .boxes import (
    box_cxcywh_to_xyxy,
    box_iou_pairwise,
    generalized_box_iou,
    generalized_box_iou_pairwise,
)
from .train import detection_loss, make_train_step, replicate_params, shard_params
from .checkpoint import TrainCheckpointer

__all__ = [
    "make_mesh",
    "MSDA_SHARDINGS",
    "shard_msda_args",
    "sharded_multiscale_deformable_attention",
    "shard_map_multiscale_deformable_attention",
    "detection_loss",
    "make_train_step",
    "replicate_params",
    "shard_params",
    "auction_assignment",
    "matching_cost",
    "box_cxcywh_to_xyxy",
    "box_iou_pairwise",
    "generalized_box_iou",
    "generalized_box_iou_pairwise",
    "TrainCheckpointer",
]
