"""Jittable bipartite matching for detection training (Hungarian-style).

Deformable DETR (arXiv:2010.04159 §4.1, following DETR) matches queries to
ground-truth boxes with a minimum-cost bipartite assignment before computing
the loss.  scipy's linear_sum_assignment is host-only and kills jit/pmap, so
this implements the **auction algorithm** (Bertsekas 1988) with jax control
flow: synchronous bidding rounds in a ``lax.while_loop``, everything
vmap-able over the batch.

With bid increment ``eps``, auction terminates with an assignment whose cost
is within ``n_targets * eps`` of optimal; for detection losses (costs are
O(1) floats) the default eps gives matchings that agree with scipy's exact
solver on all but degenerate ties (see tests/test_matcher.py).

The reference library has no training infrastructure at all (SURVEY §2/§5);
this belongs to the framework extension around the op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["auction_assignment", "matching_cost"]

_NEG = -1e30


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def auction_assignment(cost, target_mask=None, eps=1e-3, max_rounds=2000):
    """Min-cost assignment of targets to queries via the auction algorithm.

    Args:
        cost: ``[N, M]`` float cost of assigning query n to target m
            (N >= M; every *real* target gets a distinct query).
        target_mask: optional ``[M]`` {0,1}; masked-out targets are not
            assigned (their returned index is valid but meaningless).
        eps: bid increment; suboptimality is bounded by ``M * eps``.
        max_rounds: hard iteration bound for the while_loop.

    Returns:
        ``query_idx [M]`` int32 — the query assigned to each target.
    """
    N, M = cost.shape
    profit = -cost.astype(jnp.float32).T  # [M, N]: targets bid for queries
    if target_mask is not None:
        active = target_mask.astype(bool)
    else:
        active = jnp.ones((M,), bool)

    eps = jnp.float32(eps)

    def cond(state):
        owner, price, rounds = state
        unassigned = active & (owner_of(owner) < 0)
        return (rounds < max_rounds) & jnp.any(unassigned)

    def owner_of(owner):
        # owner[q] = target owning query q (-1 free); derive per-target
        # assignment: assigned[m] = any(owner == m)
        return jnp.where(
            jnp.any(owner[None, :] == jnp.arange(M)[:, None], axis=1), 0, -1
        )

    def body(state):
        owner, price, rounds = state
        values = profit - price[None, :]  # [M, N]
        assigned = jnp.any(
            owner[None, :] == jnp.arange(M)[:, None], axis=1
        )
        bidder = active & ~assigned  # [M] targets bidding this round

        best = jnp.max(values, axis=1)
        best_q = jnp.argmax(values, axis=1)  # [M]
        masked = values.at[jnp.arange(M), best_q].set(_NEG)
        second = jnp.max(masked, axis=1)
        bid = best - second + eps  # [M]

        # each query takes the highest bid among bidders targeting it
        bid_matrix = jnp.where(
            bidder[:, None]
            & (jnp.arange(N)[None, :] == best_q[:, None]),
            bid[:, None],
            _NEG,
        )  # [M, N]
        top_bid = jnp.max(bid_matrix, axis=0)  # [N]
        top_bidder = jnp.argmax(bid_matrix, axis=0).astype(jnp.int32)
        won = top_bid > _NEG / 2

        price = jnp.where(won, price + top_bid, price)
        # unseat previous owner (implicitly: owner is overwritten)
        owner = jnp.where(won, top_bidder, owner).astype(jnp.int32)
        return owner, price, (rounds + 1).astype(jnp.int32)

    owner0 = jnp.full((N,), -1, jnp.int32)
    price0 = jnp.zeros((N,), jnp.float32)
    owner, price, _ = jax.lax.while_loop(
        cond, body, (owner0, price0, jnp.int32(0))
    )

    # per-target assigned query: the query it owns (or argmin cost fallback
    # for pathological non-termination)
    owns = owner[None, :] == jnp.arange(M)[:, None]  # [M, N]
    q_idx = jnp.argmax(owns, axis=1)
    any_own = jnp.any(owns, axis=1)
    fallback = jnp.argmin(cost, axis=0).astype(q_idx.dtype)
    return jnp.where(any_own, q_idx, fallback).astype(jnp.int32)


def matching_cost(logits, boxes, labels, tboxes, class_weight=1.0, box_weight=5.0):
    """DETR-style matching cost matrix [N_queries, M_targets]:
    -p(class) + L1(box) (arXiv:2010.04159 §4.1, GIoU term omitted)."""
    prob = jax.nn.softmax(logits, axis=-1)  # [N, K]
    cls_cost = -prob[:, labels]  # [N, M]
    l1 = jnp.abs(boxes[:, None, :] - tboxes[None, :, :]).sum(-1)  # [N, M]
    return class_weight * cls_cost + box_weight * l1
