"""Impression-loss parity tests against a torch oracle transliterating
SegRec/models/BaseModel.py ImpressionModel.loss (:443-555)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from segmminterest_tpu.segrec.impression import IMPRESSION_LOSSES

MAX_POS = 4


def make_batch(rng, B=6, P=MAX_POS, N=5):
    predictions = rng.normal(size=(B, P + N))
    target = np.full((B, P + N), -1, np.int64)
    for i in range(B):
        npos = rng.integers(1, P + 1)
        nneg = rng.integers(1, N + 1)
        target[i, :npos] = 1
        target[i, P:P + nneg] = 0
    return predictions, target


def torch_loss(loss_n, predictions, target, max_pos):
    """Direct transliteration of the reference (float64)."""
    prediction = torch.tensor(predictions, dtype=torch.float64)
    target = torch.tensor(target)
    mask = torch.where(target == -1, target,
                       torch.zeros_like(target)) + 1
    test_have_neg = mask[:, max_pos]
    L = prediction.size(1)
    if "BPR" in loss_n:
        valid_mask = mask.unsqueeze(-1) * mask.unsqueeze(-1).transpose(-1, -2)
        pos_mask = (torch.arange(L).unsqueeze(0).repeat(prediction.shape[0], 1)
                    < max_pos)
        neg_mask = ~pos_mask
        select = pos_mask.unsqueeze(-1) * neg_mask.unsqueeze(-1) \
            .transpose(-1, -2) * valid_mask
        diff = prediction.unsqueeze(-1) - prediction.unsqueeze(-1) \
            .transpose(-1, -2)
        diff_masked = diff * select
        neg_pred = torch.where(neg_mask * mask == 1, prediction,
                               -torch.tensor(float("inf")).double())
        neg_softmax = (neg_pred - neg_pred.max()).softmax(dim=1)
        if "hard" in loss_n:
            pos_pred = torch.where(pos_mask * mask == 1, prediction,
                                   torch.tensor(float("inf")).double())
            pos_softmax = (pos_pred.min() - pos_pred).softmax(dim=1)
        else:
            pos_pred = torch.where(pos_mask * mask == 1, prediction,
                                   -torch.tensor(float("inf")).double())
            pos_softmax = (pos_pred - pos_pred.max()).softmax(dim=1)
        if "pair" in loss_n:
            return ((F.softplus(-diff_masked) * neg_softmax.unsqueeze(1))
                    .sum(-1) * pos_softmax).sum(-1).mean().item()
        if "session" in loss_n or "hard" in loss_n:
            return (-((diff_masked.sigmoid() * neg_softmax.unsqueeze(1))
                      .sum(-1) * pos_softmax).sum(-1).log()).mean().item()
        if "simple" in loss_n:
            return ((F.softplus(-diff_masked) * select).sum(-1)) \
                .sum(-1).numpy()
        return F.softplus(-(diff_masked * neg_softmax.unsqueeze(1)).sum(-1)
                          * pos_softmax).sum(-1).mean().item()
    if loss_n == "listnet":
        t = torch.where(target != -1, target.double(),
                        -torch.tensor(float("inf")).double())
        ts = (t - t.max()).softmax(dim=1)
        ps = (prediction - prediction.max()).softmax(dim=1)
        ps = torch.where(mask == 1, ps, torch.ones_like(ps))
        loss = -(ts * ps.log()).sum(dim=1)
        loss = loss * test_have_neg / test_have_neg.sum() \
            * len(test_have_neg)
        return loss.mean().item()
    if loss_n == "softmaxCE":
        pos_mask_t = torch.where(target == 1, target,
                                 torch.zeros_like(target))
        pos_length = pos_mask_t.sum(axis=1)
        pred = torch.where(mask == 1, prediction,
                           -torch.ones_like(prediction) * 100000)
        ps = (pred - pred.max(dim=1, keepdim=True)[0]).softmax(dim=1)
        tp = ps[:, :max_pos]
        tp = torch.where(mask[:, :max_pos] == 1, tp, torch.ones_like(tp))
        loss = -(tp).log().sum(axis=1).div(pos_length)
        loss = loss * test_have_neg / test_have_neg.sum() \
            * len(test_have_neg)
        return loss.mean().item()
    if loss_n == "pointwiseCE":
        sample_length = mask.sum(axis=1)
        pred = torch.sigmoid(prediction)
        loss = F.binary_cross_entropy(pred, target.clamp(0, 1).double(),
                                      reduction="none").mul(mask)
        return loss.sum(axis=1).div(sample_length).mean().item()
    if loss_n == "sampled_softmax":
        pos_mask_t = torch.where(target == 1, target,
                                 torch.zeros_like(target))
        rel = (torch.exp(prediction * pos_mask_t) * pos_mask_t).sum(-1) \
            / (torch.exp(prediction * mask) * mask).sum(-1)
        return (-rel.log()).mean().item()
    raise ValueError(loss_n)


@pytest.mark.parametrize("loss_n", ["BPRsession", "BPRpair", "BPR_hard",
                                    "BPR", "listnet", "softmaxCE",
                                    "pointwiseCE", "sampled_softmax"])
def test_impression_loss_matches_reference(rng, loss_n):
    predictions, target = make_batch(rng)
    got = IMPRESSION_LOSSES[loss_n](jnp.asarray(predictions),
                                    jnp.asarray(target), MAX_POS)
    want = torch_loss(loss_n, predictions, target, MAX_POS)
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6,
                               err_msg=loss_n)


def test_bpr_simple_matches_reference(rng):
    predictions, target = make_batch(rng)
    got = IMPRESSION_LOSSES["BPRsimple"](jnp.asarray(predictions),
                                         jnp.asarray(target), MAX_POS)
    want = torch_loss("BPRsimple", predictions, target, MAX_POS)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
