"""Metric suite (pure jnp), reference parity with ``trainer/metrics.py``.

All spatial metrics take channels-last ``(B, T, *spatial, C)`` tensors and
reduce over the spatial dims, keeping ``[B, T, C]`` — for the 2-D
``(B, T, H, W, C)`` case these are exactly the reference's reductions
(``trainer/metrics.py:53-164``, which hardcode dims (-3, -2)); 3-D fields
``(B, T, D, H, W, C)`` reduce over (D, H, W) (the natural generalization
the reference never needed — its benchmarks are all 2-D).

Call contract (reference ``Metric.forward``, ``trainer/metrics.py:20-43``):
``metric(x, y, rt)`` returns the spatial loss tensor when ``rt is None``;
otherwise returns ``spatial.mean() + eval_rt(rt, eps, n)`` — the adaptive
trainer's r_t band penalty (only MSE defines ``eval_rt``,
``trainer/metrics.py:62-80``).

The band penalty's two data-dependent branches are expressed with ``relu``
instead of Python ``if``s so the whole loss stays jittable:
``rt_avg < up  -> beta1 * (up - rt_avg)^n``  ==  ``beta1 * relu(up - rt_avg)^n``
``rt_avg > down -> beta2 * (rt_avg - down)^n`` == ``beta2 * relu(rt_avg - down)^n``
(identical values since each term vanishes outside its branch).
"""

from __future__ import annotations

import math
import jax.numpy as jnp

def _spatial_axes(x):
    """All dims between T and C: (-3, -2) for (B, T, H, W, C), (-4, -3, -2)
    for 3-D fields."""
    return tuple(range(2, x.ndim - 1))


class Metric:
    """Base class; subclasses define ``eval`` (+ optionally ``eval_rt``)."""

    def __call__(
        self, x, y, rt=None, eps: float = 0.5, n: float = 2.0, band_hi: float = 4.0
    ):
        loss_spatial = self.eval(x, y)
        if rt is not None:
            return jnp.mean(loss_spatial) + self.eval_rt(rt, eps, n, band_hi)
        return loss_spatial

    @staticmethod
    def eval(x, y):  # pragma: no cover - abstract
        raise NotImplementedError

    @staticmethod
    def eval_rt(rt, eps, n, band_hi=4.0):  # pragma: no cover - abstract
        raise NotImplementedError


class MSE(Metric):
    @staticmethod
    def eval(x, y):
        return jnp.mean((x - y) ** 2, axis=_spatial_axes(x))  # [B, T, C]

    @staticmethod
    def eval_rt(rt, eps=0.5, n=2.0, band_hi=4.0):
        # Band penalty pulling mean r_t into [1 + eps, band_hi].  The
        # reference hardcodes the band's anchor at 4 (trainer/metrics.py:
        # 62-80, ``up = min(1+eps, 4); down = max(1+eps, 4)``) — with its
        # out_T = 1.5 training cap that anchor is unreachable for any
        # eps > 0.5, which makes the penalty a CONSTANT uphill gradient
        # through the interprator's straight-through clip (measured to
        # drift the whole backbone into divergence at flagship geometry;
        # docs/EVIDENCE.md round 4).  band_hi = 4.0 is exact reference
        # parity; the variable-frame trainer (rollout_adaptive_train_vf)
        # raises it together with train_out_T so the band is reachable.
        beta1 = 5e-3
        beta2 = 1e-1
        rt_avg = jnp.mean(rt)
        up = min(1.0 + eps, band_hi)
        down = max(1.0 + eps, band_hi)
        low = jnp.maximum(up - rt_avg, 0.0)
        high = jnp.maximum(rt_avg - down, 0.0)
        return beta1 * low**n + beta2 * high**n


class NMSE(Metric):
    @staticmethod
    def eval(x, y, eps: float = 1e-7, norm_mode: str = "norm"):
        if norm_mode == "norm":
            norm = jnp.mean(y**2, axis=_spatial_axes(y))
        elif norm_mode == "std":
            # torch.std uses the unbiased (ddof=1) estimator.
            norm = jnp.var(y, axis=_spatial_axes(y), ddof=1)
        else:
            raise ValueError(f"Invalid norm_mode: {norm_mode}")
        return MSE.eval(x, y) / (norm + eps)


class L2RE(Metric):
    @staticmethod
    def eval(x, y, eps: float = 1e-7):
        # Flatten (T, H, W) per (B, C): vector-norm ratio
        # (reference trainer/metrics.py:100-111).
        b, c = x.shape[0], x.shape[-1]
        xf = x.reshape(b, -1, c)
        yf = y.reshape(b, -1, c)
        num = jnp.linalg.norm(xf - yf, axis=1)
        den = jnp.linalg.norm(yf, axis=1) + eps
        return num / den  # [B, C]


class NNMSE(Metric):
    @staticmethod
    def eval(x, y, eps: float = 1e-7, norm_mode: str = "norm"):
        n_dims = tuple(range(2, y.ndim))  # (*spatial, C)
        if norm_mode == "norm":
            norm = jnp.mean(y**2, axis=n_dims)
        elif norm_mode == "std":
            norm = jnp.var(y, axis=n_dims, ddof=1)
        else:
            raise ValueError(f"Invalid norm_mode: {norm_mode}")
        return jnp.mean(MSE.eval(x, y), axis=-1) / (norm + eps)  # [B, T]


class RMSE(Metric):
    @staticmethod
    def eval(x, y):
        return jnp.sqrt(MSE.eval(x, y))


class NRMSE(Metric):
    @staticmethod
    def eval(x, y, eps: float = 1e-7, norm_mode: str = "norm"):
        return jnp.sqrt(NMSE.eval(x, y, eps=eps, norm_mode=norm_mode))


class VMSE(Metric):
    @staticmethod
    def eval(x, y):
        return NMSE.eval(x, y, norm_mode="std")


class VRMSE(Metric):
    """The Well's VRMSE (= NRMSE with variance normalization)."""

    @staticmethod
    def eval(x, y):
        return NRMSE.eval(x, y, norm_mode="std")


# --------------------------------------------------------------------------
# Data-complexity diagnostics (reference trainer/metrics.py:170-202): exported
# but unused by trainers, kept for parity.
# --------------------------------------------------------------------------


def compute_spectral_entropy(tensor: jnp.ndarray):
    """Temporal-FFT spectral entropy over (B, T, H, W, C)."""
    mean = jnp.mean(tensor, axis=1, keepdims=True)
    std = jnp.std(tensor, axis=1, keepdims=True)
    t = (tensor - mean) / (std + 1e-10)
    fft = jnp.fft.fftn(t, axes=[1])
    psd = (jnp.conj(fft) * fft).real
    total = jnp.sum(psd, axis=1, keepdims=True)
    p = psd / (total + 1e-10)
    ent = -jnp.sum(p * jnp.log(p + 1e-10), axis=1)
    f = psd.shape[1]
    ent_norm = ent / (math.log(f) + 1e-10)
    return float(jnp.mean(ent)), float(jnp.mean(ent_norm))


def compute_high_frequency_ratio(tensor: jnp.ndarray, cutoff=(0.2, 0.5, 0.8)):
    mean = jnp.mean(tensor, axis=1, keepdims=True)
    std = jnp.std(tensor, axis=1, keepdims=True)
    t = (tensor - mean) / (std + 1e-10)
    fft = jnp.fft.fftn(t, axes=[1])
    psd = (jnp.conj(fft) * fft).real
    total = jnp.sum(psd, axis=1, keepdims=True)
    num_freqs = psd.shape[1]
    out = []
    for thresh in cutoff:
        hi = int(thresh * num_freqs)
        hi_power = jnp.sum(psd[:, hi:], axis=1)
        out.append(float(jnp.mean(hi_power / (jnp.squeeze(total) + 1e-10))))
    return out


def complexity_metrics(data: jnp.ndarray, cutoff=(0.2, 0.5, 0.8)):
    se, se_norm = compute_spectral_entropy(data)
    hfr = compute_high_frequency_ratio(data, cutoff=cutoff)
    return {"spectral_entropy": (se, se_norm), "highfreq_ratio": hfr}
