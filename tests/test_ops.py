"""Pallas conv kernels (interpret mode on CPU) vs the XLA reference path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from melogan_tpu.ops.conv import _xla_conv1d, _xla_conv_transpose1d
from melogan_tpu.ops.pallas.conv1d import pallas_conv1d, pallas_conv_transpose1d

HI = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize(
    "b,l,cin,cout,k,s,p",
    [
        (4, 128, 4, 16, 5, 2, 2),
        (2, 64, 8, 16, 5, 2, 2),
        (2, 50, 8, 8, 3, 1, 1),
        (2, 33, 4, 8, 3, 2, 1),
    ],
)
def test_pallas_conv1d_matches_xla(rng, b, l, cin, cout, k, s, p):
    x = jnp.asarray(rng.normal(size=(b, l, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1)
    y1 = pallas_conv1d(x, w, s, p)
    y2 = _xla_conv1d(x, w, s, p, precision=HI)
    assert y1.shape == y2.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4)


@pytest.mark.parametrize(
    "b,l,cin,cout,k,s,p,op",
    [
        (2, 16, 32, 16, 5, 2, 2, 1),
        (2, 32, 16, 8, 5, 2, 2, 1),
        (2, 20, 8, 4, 3, 2, 1, 1),
        (2, 20, 8, 4, 3, 1, 1, 0),
    ],
)
def test_pallas_convt_matches_xla(rng, b, l, cin, cout, k, s, p, op):
    x = jnp.asarray(rng.normal(size=(b, l, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1)
    y1 = pallas_conv_transpose1d(x, w, s, p, op)
    y2 = _xla_conv_transpose1d(x, w, s, p, op, precision=HI)
    assert y1.shape == y2.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4)


def test_pallas_conv_grads_match_xla(rng):
    b, l, cin, cout, k, s, p = 2, 64, 4, 8, 5, 2, 2
    x = jnp.asarray(rng.normal(size=(b, l, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1)
    g1 = jax.grad(lambda x, w: jnp.sum(jnp.sin(pallas_conv1d(x, w, s, p))), (0, 1))(x, w)
    g2 = jax.grad(
        lambda x, w: jnp.sum(jnp.sin(_xla_conv1d(x, w, s, p, precision=HI))), (0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=5e-3)


def test_pallas_convt_grads_match_xla(rng):
    b, l, cin, cout, k, s, p, op = 2, 16, 16, 8, 5, 2, 2, 1
    x = jnp.asarray(rng.normal(size=(b, l, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1)
    g1 = jax.grad(
        lambda x, w: jnp.sum(jnp.sin(pallas_conv_transpose1d(x, w, s, p, op))), (0, 1)
    )(x, w)
    g2 = jax.grad(
        lambda x, w: jnp.sum(jnp.sin(_xla_conv_transpose1d(x, w, s, p, op, precision=HI))),
        (0, 1),
    )(x, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=5e-3)
