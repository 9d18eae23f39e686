"""Monodepth model: forward shapes, inference padding, training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_match_tpu.data.synthetic import box_scene, random_dot_pair
from stereo_match_tpu.models.monodepth import (
    MonodepthNet, init_params, monodepth_loss, predict_disparity, train,
)


@pytest.fixture(scope="module")
def net():
    model = MonodepthNet(encoder_features=(8, 12, 16, 24))
    params = init_params(model, jax.random.PRNGKey(0), (1, 32, 48, 3))
    return model, params


def test_forward_scales(net):
    model, params = net
    disps = model.apply(params, jnp.zeros((2, 32, 48, 3)))
    assert len(disps) == 2
    assert disps[0].shape == (2, 32, 48, 2)
    assert disps[1].shape == (2, 16, 24, 2)
    # sigmoid * frac keeps disparity in [0, 0.3]
    assert float(disps[0].max()) <= 0.3


def test_predict_pads_odd_sizes(net):
    model, params = net
    img = np.random.default_rng(0).integers(0, 255, (45, 70, 3), np.uint8)
    d = predict_disparity(model, params, img)
    assert d.shape == (45, 70)
    assert np.isfinite(d).all() and (d >= 0).all()


def test_loss_finite_and_training_reduces(net):
    model, _ = net
    params = init_params(model, jax.random.PRNGKey(1), (1, 32, 48, 3))
    gt = box_scene(32, 48, 2.0, 6.0)
    l, r = random_dot_pair(32, 48, gt, blur=1.0)
    lb = np.stack([np.stack([l] * 3, -1)]) / 255.0
    rb = np.stack([np.stack([r] * 3, -1)]) / 255.0
    l0 = float(monodepth_loss(model, params, jnp.asarray(lb), jnp.asarray(rb)))
    assert np.isfinite(l0)
    params, losses = train(model, params, [(lb, rb)] * 25, learning_rate=1e-3)
    assert losses[-1] < l0, (l0, losses[-1])


def test_shipped_checkpoint_predicts_depth():
    """The committed monodepth_small.npz (tools/train_monodepth.py,
    self-supervised — no GT in the loss) recovers the depth structure of
    held-out shaded scenes: prediction correlates with GT, and after
    per-image affine calibration (mono depth is defined up to scale — the
    standard monodepth eval protocol) beats the best constant predictor."""
    import numpy as np
    from stereo_match_tpu.data.synthetic import random_dot_pair, rough_scene
    from stereo_match_tpu.models import monodepth as md

    model, params = md.load_default()
    corrs, cal_epe, const_epe = [], [], []
    for s in (900, 901, 902, 903):
        gt = rough_scene(64, 96, s, 2.0, 20.0, cell=12)
        l, _ = random_dot_pair(64, 96, gt, blur=1.2, seed=s, shading=0.8)
        img = np.repeat(l[..., None], 3, -1)
        pred = md.predict_disparity(model, params, img)
        corrs.append(float(np.corrcoef(pred.ravel(), gt.ravel())[0, 1]))
        a, b = np.polyfit(pred.ravel(), gt.ravel(), 1)
        cal_epe.append(float(np.mean(np.abs(a * pred + b - gt))))
        const_epe.append(float(np.mean(np.abs(np.median(gt) - gt))))
    assert np.mean(corrs) > 0.4, corrs
    assert np.mean(cal_epe) < 0.95 * np.mean(const_epe), (cal_epe, const_epe)


def test_infer_arch_roundtrip():
    import jax
    from stereo_match_tpu.models import monodepth as md
    for arch in ("small", "full"):
        params = md.init_params(md.make_model(arch), jax.random.PRNGKey(0))
        assert md.infer_arch(params) == arch
