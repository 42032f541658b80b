"""Fixed-shape (masked) Saliency-Drop vs the shrinking reference variant.

The masked variant runs the victim at ONE static shape with mask-aware
forwards; the shrinking variant re-jits the victim at every round shape
(the reference's policy, `baselines/attack/Saliency/Drop.py:77-99`). In
eval mode the mask-aware forwards are exact, so both must select the SAME
dropped points.
"""

import jax
import numpy as np
import pytest

from if_defense_tpu.attack.drop import (
    saliency_drop,
    saliency_drop_shrink,
)
from if_defense_tpu.models import build_model
from if_defense_tpu.training import create_train_state, eval_variables


def _victim(name, n=48, b=3, seed=0):
    model = build_model(name, num_classes=4)
    rng = np.random.default_rng(seed)
    pc = np.asarray(rng.normal(size=(b, n, 3)), np.float32) * 0.4
    state = create_train_state(model, jax.random.key(0), pc)
    variables = eval_variables(state)

    def logits_fn(p):
        logits, _ = model.apply(variables, p, train=False)
        return logits

    def masked_logits_fn(p, mask):
        logits, _ = model.apply(variables, p, train=False, mask=mask)
        return logits

    label = np.argmax(np.asarray(logits_fn(pc)), -1)
    return pc, label, logits_fn, masked_logits_fn


def _sorted_sets(pts):
    """Canonical per-example point sets for order-insensitive compare."""
    out = []
    for cloud in np.asarray(pts):
        rows = [tuple(np.round(r, 5)) for r in cloud]
        out.append(sorted(rows))
    return out


@pytest.mark.parametrize("name", ["pointnet", "dgcnn", "pointnet2"])
def test_masked_drop_matches_shrinking(name):
    pc, label, logits_fn, masked_logits_fn = _victim(name)
    kept_shrink, succ_shrink = saliency_drop_shrink(
        logits_fn, pc, label, num_drop=10, k=5)
    kept_masked, succ_masked = saliency_drop(
        masked_logits_fn, pc, label, num_drop=10, k=5)

    assert np.asarray(kept_masked).shape == np.asarray(kept_shrink).shape
    assert _sorted_sets(kept_masked) == _sorted_sets(kept_shrink)
    np.testing.assert_array_equal(
        np.asarray(succ_masked), np.asarray(succ_shrink))


def test_masked_drop_partial_last_round():
    pc, label, logits_fn, masked_logits_fn = _victim("pointnet")
    kept_shrink, _ = saliency_drop_shrink(
        logits_fn, pc, label, num_drop=7, k=5)     # rounds of 5 then 2
    kept_masked, _ = saliency_drop(
        masked_logits_fn, pc, label, num_drop=7, k=5)
    assert np.asarray(kept_masked).shape == (3, 41, 3)
    assert _sorted_sets(kept_masked) == _sorted_sets(kept_shrink)


def test_masked_forward_matches_compacted():
    """Mask-aware victim forward == forward on the compacted cloud."""
    for name in ("pointnet", "dgcnn", "pointnet2", "pointconv", "rscnn"):
        pc, _, logits_fn, masked_logits_fn = _victim(name, n=40)
        mask = np.ones((3, 40), np.float32)
        drop = [3, 7, 11, 25, 31]
        mask[:, drop] = 0.0
        kept = np.delete(pc, drop, axis=1)
        ref = np.asarray(logits_fn(kept))
        out = np.asarray(masked_logits_fn(pc, mask))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4,
                                   err_msg=f"masked forward differs: {name}")
