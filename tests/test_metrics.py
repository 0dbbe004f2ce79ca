"""Metric parity tests against independently-computed numpy formulas
(reference definitions: trainer/metrics.py:53-164)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tante_tpu.train import L2RE, MSE, NMSE, NNMSE, NRMSE, RMSE, VMSE, VRMSE

B, T, H, W, C = 2, 3, 8, 6, 4


@pytest.fixture()
def xy(rng):
    x = rng.normal(size=(B, T, H, W, C)).astype(np.float32)
    y = rng.normal(size=(B, T, H, W, C)).astype(np.float32)
    return x, y


def np_mse(x, y):
    return ((x - y) ** 2).mean(axis=(-3, -2))


def test_mse(xy):
    x, y = xy
    got = np.asarray(MSE()(jnp.asarray(x), jnp.asarray(y), None))
    np.testing.assert_allclose(got, np_mse(x, y), rtol=1e-5)
    assert got.shape == (B, T, C)


def test_nmse_modes(xy):
    x, y = xy
    got = np.asarray(NMSE()(jnp.asarray(x), jnp.asarray(y), None))
    want = np_mse(x, y) / ((y**2).mean(axis=(-3, -2)) + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_vmse_uses_unbiased_variance(xy):
    x, y = xy
    got = np.asarray(VMSE()(jnp.asarray(x), jnp.asarray(y), None))
    want = np_mse(x, y) / (y.reshape(B, T, H * W, C).std(axis=2, ddof=1) ** 2 + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_l2re(xy):
    x, y = xy
    got = np.asarray(L2RE()(jnp.asarray(x), jnp.asarray(y), None))
    xf = x.reshape(B, -1, C)
    yf = y.reshape(B, -1, C)
    want = np.linalg.norm(xf - yf, axis=1) / (np.linalg.norm(yf, axis=1) + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert got.shape == (B, C)


def test_nnmse(xy):
    x, y = xy
    got = np.asarray(NNMSE()(jnp.asarray(x), jnp.asarray(y), None))
    want = np_mse(x, y).mean(axis=-1) / ((y**2).mean(axis=(-3, -2, -1)) + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert got.shape == (B, T)


def test_rmse_nrmse_vrmse(xy):
    x, y = xy
    np.testing.assert_allclose(
        np.asarray(RMSE()(jnp.asarray(x), jnp.asarray(y), None)),
        np.sqrt(np_mse(x, y)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(NRMSE()(jnp.asarray(x), jnp.asarray(y), None)) ** 2,
        np.asarray(NMSE()(jnp.asarray(x), jnp.asarray(y), None)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(VRMSE()(jnp.asarray(x), jnp.asarray(y), None)) ** 2,
        np.asarray(VMSE()(jnp.asarray(x), jnp.asarray(y), None)),
        rtol=1e-4,
    )


def test_rt_band_penalty(xy):
    """Band penalty (trainer/metrics.py:62-80): zero inside [1+eps, 4],
    beta1-weighted below, beta2-weighted above."""
    x, y = xy
    m = MSE()
    base = float(np.mean(np_mse(x, y)))

    inside = float(m(jnp.asarray(x), jnp.asarray(y), jnp.asarray([2.0, 3.0]), 0.5, 2))
    np.testing.assert_allclose(inside, base, rtol=1e-5)

    below = float(m(jnp.asarray(x), jnp.asarray(y), jnp.asarray([1.0, 1.0]), 0.5, 2))
    np.testing.assert_allclose(below - base, 5e-3 * 0.5**2, rtol=1e-3)

    above = float(m(jnp.asarray(x), jnp.asarray(y), jnp.asarray([5.0, 5.0]), 0.5, 2))
    np.testing.assert_allclose(above - base, 1e-1 * 1.0**2, rtol=1e-3)
