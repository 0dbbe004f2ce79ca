"""Golden-value numerical parity vs the reference's torch ops.

Fixtures in tests/fixtures/parity.npz were produced by
scripts/make_parity_fixtures.py RUNNING the reference implementation
(/root/reference, torch CPU) on fixed inputs with deterministic weights.
These pin the hard-op semantics (SURVEY.md hard part #2) so that real-data
metric differences can be attributed to training, not op drift.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "parity.npz")


@pytest.fixture(scope="module")
def fx():
    return np.load(FIXTURES)


def test_mha_matches_torch(fx):
    """Our MultiheadAttention == torch.nn.MultiheadAttention with copied
    weights (reference TransformerBlock core, attn_backbone.py:48)."""
    from tante_tpu.ops.attention import MultiheadAttention

    c, heads = 16, 4
    mha = MultiheadAttention(embed_dim=c, num_heads=heads, dropout=0.0)
    x = jnp.asarray(fx["mha_x"])
    params = mha.init(jax.random.PRNGKey(0), x)["params"]
    w = fx["mha_in_proj_w"]  # (3C, C) torch layout: rows are output features
    b = fx["mha_in_proj_b"]
    mapped = {
        "q_proj": {"kernel": w[:c].T, "bias": b[:c]},
        "k_proj": {"kernel": w[c : 2 * c].T, "bias": b[c : 2 * c]},
        "v_proj": {"kernel": w[2 * c :].T, "bias": b[2 * c :]},
        "out_proj": {"kernel": fx["mha_out_w"].T, "bias": fx["mha_out_b"]},
    }
    assert set(mapped) == set(params)
    got = mha.apply({"params": mapped}, x)
    np.testing.assert_allclose(np.asarray(got), fx["mha_y"], atol=2e-5)
    got_c = mha.apply({"params": mapped}, x, causal=True)
    np.testing.assert_allclose(np.asarray(got_c), fx["mha_y_causal"], atol=2e-5)


def test_newgelu_matches_torch(fx):
    """jnp tanh-GELU == torch nn.GELU(approximate='tanh') on a fixed grid."""
    import flax.linen as nn

    got = nn.gelu(jnp.asarray(fx["newgelu_x"]), approximate=True)
    np.testing.assert_allclose(np.asarray(got), fx["newgelu_y"], atol=1e-6)


@pytest.mark.parametrize("tag", ["o0", "o25"])
def test_realconv2d_matches_torch(fx, tag):
    """RealConv2d 'same'-arithmetic + exact-grid pooling == reference
    (enc_dec_cnn.py:49-110) with copied weights, overlap 0 and 0.25."""
    from tante_tpu.ops.convs import RealConv2d

    w = fx[f"conv_{tag}_w"]  # torch OIHW
    bias = fx[f"conv_{tag}_b"]
    x = np.transpose(fx["conv_x"], (0, 2, 3, 1))  # NCHW -> NHWC
    overlap = 0.0 if tag == "o0" else 0.25
    mod = RealConv2d(out_channels=w.shape[0], patch_size=4, overlap_ratio=overlap)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    (conv_name,) = params.keys()
    mapped = {conv_name: {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": bias}}
    got = mod.apply({"params": mapped}, jnp.asarray(x))
    want = np.transpose(fx[f"conv_{tag}_y"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("tag", ["o0", "o25"])
def test_realtransconv2d_matches_torch(fx, tag):
    """RealTransConv2d VALID-then-crop + bilinear enforcement == reference
    (enc_dec_cnn.py:113-184) with copied weights."""
    from tante_tpu.ops.convs import RealTransConv2d

    w = fx[f"tconv_{tag}_w"]  # torch ConvTranspose2d weight: (in, out, kh, kw)
    bias = fx[f"tconv_{tag}_b"]
    x = np.transpose(fx[f"tconv_{tag}_x"], (0, 2, 3, 1))
    overlap = 0.0 if tag == "o0" else 0.25
    mod = RealTransConv2d(out_channels=w.shape[1], patch_size=4, overlap_ratio=overlap)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    (conv_name,) = params.keys()
    kernel_shape = params[conv_name]["kernel"].shape
    # flax ConvTranspose kernels are the torch ConvTranspose2d weights
    # SPATIALLY FLIPPED (lax.conv_transpose convention) — the documented
    # weight-porting transform; verified exact (<=6e-8) against manual math.
    mapped_kernel = np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
    )  # -> (kh, kw, in, out), flipped
    assert mapped_kernel.shape == kernel_shape, (mapped_kernel.shape, kernel_shape)
    mapped = {conv_name: {"kernel": mapped_kernel, "bias": bias}}
    got = mod.apply({"params": mapped}, jnp.asarray(x))
    want = np.transpose(fx[f"tconv_{tag}_y"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_spectral_init_scale_matches_torch(fx):
    """complex_spectral_init per-component std matches torch's
    cfloat randn * 1/sqrt(Cin*Cout) (enc_dec_fno.py:191-194)."""
    from tante_tpu.ops.initializers import complex_spectral_init

    cin, cout, m1, m2 = map(int, fx["spec_w_shape"])
    init = complex_spectral_init(cin, cout)
    w = init(jax.random.PRNGKey(0), (cin, cout, m1, m2, 2))
    # |z| with re/im ~ N(0, s^2) has E|z| = s*sqrt(pi/2)
    abs_mean = float(jnp.mean(jnp.sqrt(w[..., 0] ** 2 + w[..., 1] ** 2)))
    ref_abs_mean = float(fx["spec_w_abs_mean"])
    assert abs(abs_mean - ref_abs_mean) / ref_abs_mean < 0.15, (
        abs_mean,
        ref_abs_mean,
    )


def test_taylor_sum_closed_form():
    """TANTE fixed-mode Taylor outputs: out[i] = u0 + (i+1)*dt*d1 for
    taylor_order=1 (reference models/tante.py:165-169) — derived d1 from a
    1-frame call must reproduce the 3-frame call exactly."""
    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE

    md = TanteMetadata(
        dataset_name="t",
        n_spatial_dims=2,
        spatial_resolution=(16, 16),
        field_names={0: ["a", "b"], 1: [], 2: []},
        boundary_condition_types=["PERIODIC"],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=2,
    )
    dt = 0.5
    kw = dict(
        in_T=4,
        dset_metadata=md,
        taylor_order=1,
        attn_axes="TH",
        embed_dim=32,
        patch_scale=8,
        n_head=4,
        frame_interval=dt,
        deg=True,
    )
    m1 = TANTE(output_length=1, **kw)
    m3 = TANTE(output_length=3, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16, 2))
    params = m1.init(jax.random.PRNGKey(1), x)
    u0 = x[:, -1:]
    out1 = m1.apply(params, x)
    d1 = (out1 - u0) / dt
    out3 = m3.apply(params, x)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out3[:, i : i + 1]),
            np.asarray(u0 + (i + 1) * dt * d1),
            atol=1e-5,
            err_msg=f"frame {i}",
        )
