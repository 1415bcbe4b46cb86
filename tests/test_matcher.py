"""Auction assignment vs scipy's exact Hungarian solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

scipy_opt = pytest.importorskip("scipy.optimize")

from msda_tpu.parallel.matcher import auction_assignment, matching_cost


@pytest.mark.parametrize("n,m,seed", [(20, 8, 0), (50, 50, 1), (300, 30, 2)])
def test_auction_matches_scipy(n, m, seed):
    rng = np.random.default_rng(seed)
    cost = rng.random((n, m)).astype(np.float32)
    got = np.asarray(auction_assignment(jnp.asarray(cost), eps=1e-5))
    rows, cols = scipy_opt.linear_sum_assignment(cost)
    want = np.empty(m, np.int64)
    want[cols] = rows
    # assignments must be a valid matching with (near-)optimal total cost
    assert len(set(got.tolist())) == m, "duplicate query assignment"
    got_cost = cost[got, np.arange(m)].sum()
    opt_cost = cost[want, np.arange(m)].sum()
    assert got_cost <= opt_cost + m * 1e-4, (got_cost, opt_cost)


def test_auction_with_mask():
    rng = np.random.default_rng(3)
    cost = rng.random((10, 6)).astype(np.float32)
    mask = jnp.asarray([1, 1, 0, 1, 0, 1], jnp.float32)
    got = np.asarray(auction_assignment(jnp.asarray(cost), mask, eps=1e-5))
    real = [i for i in range(6) if float(mask[i]) > 0]
    assert len({got[i] for i in real}) == len(real)


def test_auction_under_jit_vmap():
    rng = np.random.default_rng(4)
    costs = jnp.asarray(rng.random((3, 16, 5)), jnp.float32)
    f = jax.jit(jax.vmap(lambda c: auction_assignment(c, eps=1e-4)))
    out = np.asarray(f(costs))
    assert out.shape == (3, 5)
    for b in range(3):
        assert len(set(out[b].tolist())) == 5


@pytest.mark.parametrize("n,m,seed", [(40, 40, 0), (64, 48, 1)])
def test_auction_near_tie_stress(n, m, seed):
    """Near-tie-heavy cost matrices (the e-scaling motivation): many
    identical/epsilon-apart costs must still converge to a valid distinct
    matching near the optimum, with converged=True."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 3, (n, m)).astype(np.float32)  # heavy ties
    cost = base + rng.random((n, m)).astype(np.float32) * 1e-6
    got, converged = jax.jit(
        lambda c: auction_assignment(c, eps=1e-5, return_state=True)
    )(jnp.asarray(cost))
    got = np.asarray(got)
    assert bool(converged), "auction failed to converge on near-tie costs"
    assert len(set(got.tolist())) == m, "duplicate query assignment"
    rows, cols = scipy_opt.linear_sum_assignment(cost)
    want = np.empty(m, np.int64)
    want[cols] = rows
    got_cost = cost[got, np.arange(m)].sum()
    opt_cost = cost[want, np.arange(m)].sum()
    assert got_cost <= opt_cost + m * 1e-4, (got_cost, opt_cost)


def test_auction_constant_cost_matrix():
    """Fully degenerate (all-equal) costs: every matching is optimal; the
    solver must still emit a distinct assignment and report convergence."""
    cost = jnp.ones((12, 12), jnp.float32)
    got, converged = jax.jit(
        lambda c: auction_assignment(c, eps=1e-4, return_state=True)
    )(cost)
    got = np.asarray(got)
    assert bool(converged)
    assert len(set(got.tolist())) == 12


def test_detection_loss_auction_matches_permuted_targets():
    """With a permutation-matched prediction set, the auction loss must be
    (near) permutation-invariant while the fixed loss is not."""
    from msda_tpu.parallel.train import detection_loss

    rng = np.random.default_rng(5)
    B, M, K = 2, 6, 5
    labels = jnp.asarray(rng.integers(0, K - 1, (B, M)), jnp.int32)
    tboxes = jnp.asarray(rng.random((B, M, 4)), jnp.float32)
    mask = jnp.ones((B, M), jnp.float32)
    # predictions = targets but shuffled along the query axis
    perm = rng.permutation(M)
    logits = jnp.asarray(
        10.0 * jax.nn.one_hot(labels[:, perm], K), jnp.float32
    )
    boxes = tboxes[:, perm]
    outputs = {"logits": logits, "boxes": boxes}
    targets = {"labels": labels, "boxes": tboxes, "mask": mask}

    # jitted: the auction solver's while_loops dispatch per-iteration when
    # run eagerly, which is pathologically slow through remote TPU tunnels
    loss_auction = float(jax.jit(
        lambda o, t: detection_loss(o, t, matcher="auction")
    )(outputs, targets))
    loss_fixed = float(jax.jit(
        lambda o, t: detection_loss(o, t, matcher="fixed")
    )(outputs, targets))
    # auction finds the permutation: box L1 ~ 0, CE ~ 0
    assert loss_auction < 0.1, loss_auction
    assert loss_fixed > loss_auction + 0.5


def test_detection_loss_surfaces_matcher_nonconvergence():
    """A deliberately starved round budget (matcher_rounds=1) must be
    visible to the caller via return_metrics, not silently argmin-matched;
    an adequate budget reports converged=True on the same instance."""
    from msda_tpu.parallel.train import detection_loss

    rng = np.random.default_rng(6)
    B, M, N, K = 2, 8, 24, 5
    targets = {
        "labels": jnp.asarray(rng.integers(0, K - 1, (B, M)), jnp.int32),
        "boxes": jnp.asarray(rng.random((B, M, 4)), jnp.float32),
        "mask": jnp.ones((B, M), jnp.float32),
    }
    outputs = {
        "logits": jnp.asarray(rng.standard_normal((B, N, K)), jnp.float32),
        "boxes": jnp.asarray(rng.random((B, N, 4)), jnp.float32),
    }

    starved = jax.jit(lambda o, t: detection_loss(
        o, t, matcher="auction", matcher_rounds=1, return_metrics=True))
    loss, metrics = starved(outputs, targets)
    assert np.isfinite(float(loss))
    assert not bool(metrics["matcher_converged"])

    healthy = jax.jit(lambda o, t: detection_loss(
        o, t, matcher="auction", return_metrics=True))
    loss, metrics = healthy(outputs, targets)
    assert np.isfinite(float(loss))
    assert bool(metrics["matcher_converged"])

    # the fixed matcher is trivially converged, and the default return
    # stays a bare scalar for backward compatibility
    fixed = jax.jit(lambda o, t: detection_loss(
        o, t, matcher="fixed", return_metrics=True))
    _, metrics = fixed(outputs, targets)
    assert bool(metrics["matcher_converged"])
    bare = jax.jit(lambda o, t: detection_loss(o, t))(outputs, targets)
    assert jnp.ndim(bare) == 0


def test_train_step_returns_matcher_metric():
    """make_train_step(return_metrics=True) surfaces matcher_converged
    through the jitted step (grad flows via has_aux)."""
    import optax
    from msda_tpu.parallel.train import make_train_step

    class TinyHead:
        """Minimal model.apply-compatible stand-in: params are the raw
        prediction tensors."""

        def apply(self, params, pyramid, img_shapes):
            return {"logits": params["logits"], "boxes": params["boxes"]}

    rng = np.random.default_rng(7)
    B, M, N, K = 2, 4, 12, 5
    params = {
        "logits": jnp.asarray(rng.standard_normal((B, N, K)), jnp.float32),
        "boxes": jnp.asarray(rng.random((B, N, 4)), jnp.float32),
    }
    targets = {
        "labels": jnp.asarray(rng.integers(0, K - 1, (B, M)), jnp.int32),
        "boxes": jnp.asarray(rng.random((B, M, 4)), jnp.float32),
        "mask": jnp.ones((B, M), jnp.float32),
    }
    optimizer = optax.sgd(1e-3)
    opt_state = optimizer.init(params)
    boxes0 = np.asarray(params["boxes"])  # snapshot: params are donated

    step = make_train_step(TinyHead(), optimizer, None, None,
                           matcher="auction", return_metrics=True)
    params2, _, loss, metrics = step(params, opt_state, [], targets)
    assert np.isfinite(float(loss))
    assert bool(metrics["matcher_converged"])
    # params actually moved (grads flowed through has_aux)
    assert float(jnp.abs(params2["boxes"] - boxes0).max()) > 0


def test_matching_cost_focal_class_cost():
    """class_cost='focal' ranks a confident-correct query best and a
    confident-wrong query worst, like the softmax cost; invalid kinds
    raise."""
    K = 4
    target = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    labels = jnp.asarray([1])
    boxes = jnp.tile(target, (3, 1))
    logits = jnp.asarray([
        [-8.0, 8.0, -8.0, -8.0],   # confident correct
        [-8.0, -8.0, -8.0, -8.0],  # silent
        [8.0, -8.0, -8.0, -8.0],   # confident wrong
    ])
    cost = np.asarray(matching_cost(
        logits, boxes, labels, target, class_cost="softmax"))[:, 0]
    assert cost[0] < cost[1] < cost[2], cost
    # the focal cost reads only the target class's logit (as in the
    # Deformable-DETR matcher), so rows 1 and 2 tie
    cost = np.asarray(matching_cost(
        logits, boxes, labels, target, class_cost="focal"))[:, 0]
    assert cost[0] < cost[1] and np.isclose(cost[1], cost[2]), cost

    import pytest as _pytest
    with _pytest.raises(ValueError, match="class_cost"):
        matching_cost(logits, boxes, labels, target, class_cost="hinge")
