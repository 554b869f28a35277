"""Fairness-layer tests: exact EMD vs LP golden, target generators vs
reference semantics, dynamic weights, grad-region scaling, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize
import scipy.stats

from fairdiff.fairness import emd, losses, targets, weights
from fairdiff.guidance.face_feats import FaceFeatsDB


def _lp_emd(b, cost):
    """Golden: solve the transportation LP directly."""
    n, c = cost.shape
    a_eq = []
    b_eq = []
    for i in range(n):  # row sums = 1
        row = np.zeros(n * c)
        row[i * c : (i + 1) * c] = 1
        a_eq.append(row)
        b_eq.append(1.0)
    for j in range(c):  # col sums = b_j
        col = np.zeros(n * c)
        col[j::c] = 1
        a_eq.append(col)
        b_eq.append(float(b[j]))
    res = scipy.optimize.linprog(
        cost.reshape(-1), A_eq=np.array(a_eq), b_eq=np.array(b_eq),
        bounds=(0, None), method="highs",
    )
    return res.fun


def test_emd_matches_lp():
    rng = np.random.default_rng(0)
    for _ in range(5):
        n, c = 12, 4
        cost = rng.uniform(0, 2, (n, c))
        b = rng.multinomial(n, [0.25] * 4)
        plan = emd.emd_assignment(b, cost)
        np.testing.assert_allclose(plan.sum(axis=1), 1.0)
        np.testing.assert_allclose(plan.sum(axis=0), b)
        np.testing.assert_allclose((plan * cost).sum(), _lp_emd(b, cost), atol=1e-8)


def test_binary_rank_targets_reference_semantics():
    probs = np.array(
        [[0.9, 0.1], [0.2, 0.8], [-1, -1], [0.4, 0.6], [0.7, 0.3]]
    )
    out = targets.binary_rank_targets(probs, 0.5)
    # valid rows ranked by P(male): 0.1 < 0.3 < 0.6 < 0.8 -> bottom half 0
    assert out.targets[2] == -1 and out.uncertainty[2] == -1
    np.testing.assert_array_equal(out.targets[[0, 4]], [0, 0])
    np.testing.assert_array_equal(out.targets[[1, 3]], [1, 1])
    # uncertainty formula parity with scipy (rank of row1 = 3, n=4)
    np.testing.assert_allclose(
        out.uncertainty[1], 1 - scipy.stats.binom.cdf(3, 4, 0.5), rtol=1e-8
    )
    # gate
    gated = targets.gate_targets_by_uncertainty(out, threshold=0.0)
    assert (gated[np.array([0, 1, 3, 4])] == -1).sum() > 0


def test_sampled_ot_2attr():
    rng = np.random.default_rng(1)
    n = 16
    pg = rng.dirichlet([1, 1], n)
    pr = rng.dirichlet([1, 1, 1, 1], n)
    pg[3] = -1  # invalid lane
    tg, tr = targets.sampled_ot_targets_2attr(pg, pr, np.random.default_rng(7), 50)
    assert tg.targets.shape == (n,)
    assert tg.targets[3] == -1 and tr.targets[3] == -1
    valid = tg.targets != -1
    assert set(np.unique(tg.targets[valid])) <= {0, 1}
    assert set(np.unique(tr.targets[valid])) <= {0, 1, 2, 3}
    assert ((tg.uncertainty[valid] >= 0) & (tg.uncertainty[valid] <= 1)).all()
    # determinism given the same seed
    tg2, _ = targets.sampled_ot_targets_2attr(pg, pr, np.random.default_rng(7), 50)
    np.testing.assert_array_equal(tg.targets, tg2.targets)


def test_sampled_ot_2attr_balanced_targets():
    """Strongly bimodal inputs should map ~half to each gender."""
    rng = np.random.default_rng(2)
    n = 16
    pg = np.zeros((n, 2))
    pg[: n // 2] = [0.95, 0.05]
    pg[n // 2 :] = [0.05, 0.95]
    pr = np.tile([0.25, 0.25, 0.25, 0.25], (n, 1))
    tg, _ = targets.sampled_ot_targets_2attr(pg, pr, rng, 60)
    assert abs(int((tg.targets == 1).sum()) - n // 2) <= 2


def test_sampled_ot_3attr():
    rng = np.random.default_rng(3)
    n = 12
    pg = rng.dirichlet([1, 1], n)
    pr = rng.dirichlet([1] * 4, n)
    pa = rng.dirichlet([1, 1], n)
    tg, tr, ta = targets.sampled_ot_targets_3attr(pg, pr, pa, rng, 40)
    for t, k in ((tg, 2), (tr, 4), (ta, 2)):
        assert t.targets.shape == (n,)
        assert set(np.unique(t.targets)) <= set(range(k))


def test_enumerated_ot_race():
    # all-identical strongly-class-0 probs, n=8: EMD must spread targets to
    # match the multinomial prior (roughly uniform marginals)
    probs = np.tile([0.97, 0.01, 0.01, 0.01], (8, 1))
    out = targets.enumerated_ot_targets(probs)
    assert (out.targets != -1).all()
    # with symmetric prior the per-class counts are ~2 each
    counts = np.bincount(out.targets, minlength=4)
    assert counts.max() - counts.min() <= 4

    combs, ws = targets.enumerate_multinomial_combs(8, 4, 0.95)
    assert ws.sum() >= 0.95 and (combs.sum(axis=1) == 8).all()


def test_dynamic_weights_reference_table():
    ind = jnp.asarray([False, True, True, True])
    t = jnp.asarray([1, -1, 1, 0])
    p = jnp.asarray([-1, 0, 1, 1])
    w = weights.dynamic_weights(ind, t, p, factor=0.2)
    # no face -> 1; target -1 -> .2; kept identity -> 1; changed -> .2
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.2, 1.0, 0.2])


def test_face_region_grad_scale():
    imgs = jnp.ones((2, 8, 8, 1))
    boxes = jnp.asarray([[2, 2, 6, 6], [-1, -1, -1, -1]], jnp.float32)
    boxes_ori = jnp.asarray([[0, 0, 8, 8], [-1, -1, -1, -1]], jnp.float32)
    t = jnp.asarray([1, -1])
    p = jnp.asarray([0, -1])  # sample 0 must change identity -> factor

    def loss(im):
        return weights.face_region_grad_scale(
            im, boxes, boxes_ori, t, p, factor=0.1
        ).sum()

    g = jax.grad(loss)(imgs)
    # sample 0: inside intersection [2:6,2:6] grad 0.1, outside 1.0
    np.testing.assert_allclose(np.asarray(g[0, 3, 3, 0]), 0.1)
    np.testing.assert_allclose(np.asarray(g[0, 0, 0, 0]), 1.0)
    # sample 1: no face -> untouched
    np.testing.assert_allclose(np.asarray(g[1]), 1.0)


def test_losses_composite():
    logits = jnp.asarray([[2.0, -2.0], [0.0, 0.0], [1.0, 1.0]])
    tgt = jnp.asarray([0, 1, -1])
    ind = jnp.asarray([True, True, False])
    lf, valid = losses.fair_ce_loss(logits, tgt, ind)
    assert float(lf[2]) == 0.0
    np.testing.assert_allclose(
        float(lf[0]), -np.log(np.exp(2) / (np.exp(2) + np.exp(-2))), rtol=1e-5
    )

    feats = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    feats_ori = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
    db = FaceFeatsDB(
        feats=jnp.asarray([[0.0, 1.0], [0.6, 0.8]]),
        genders=jnp.asarray([0, 1]),
        extra={},
    )
    lface, fvalid = losses.face_realism_loss(
        feats, feats_ori, ind, tgt,
        preds_ori=jnp.asarray([0, 0, 0]),
        probs_ori_max=jnp.asarray([0.95, 0.5, 0.99]),
        db=db,
    )
    # lane 0: kept identity + confident -> target = ori = same vector -> 0
    np.testing.assert_allclose(float(lface[0]), 0.0, atol=1e-6)
    # lane 1: target!=pred -> search: nearest to [0,1] is db[0] -> loss 0
    np.testing.assert_allclose(float(lface[1]), 0.0, atol=1e-6)
    # lane 2: masked
    assert float(lface[2]) == 0.0

    out = losses.composite_loss(
        loss_fair=lf, loss_clip=jnp.ones(3) * 0.1, loss_dino=jnp.ones(3) * 0.2,
        loss_face=lface, dynamic_w=jnp.ones(3), weight_img=8.0, weight_face=1.0,
        fair_valid=valid, face_valid=fvalid,
    )
    assert np.isfinite(float(out.total))
    assert float(out.logs["loss_fair"][2]) == -1.0
