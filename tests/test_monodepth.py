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
