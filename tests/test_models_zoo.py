"""Baseline-zoo shape/sanity tests (mirrors the reference's __main__ smoke
blocks per model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tante_tpu.data.dataset import TanteMetadata

MD = TanteMetadata(
    dataset_name="synthetic",
    n_spatial_dims=2,
    spatial_resolution=(32, 64),
    field_names={0: ["density"], 1: ["velocity_x", "velocity_y"], 2: []},
    boundary_condition_types=["PERIODIC"],
    n_files=1,
    n_trajectories_per_file=[2],
    n_steps_per_trajectory=[24],
    n_fields=3,
)

B, T = 2, 4
X_SHAPE = (B, T, 32, 64, 3)


def _run(model, x_shape=X_SHAPE, **apply_kw):
    # init_with_output = ONE forward pass for both params and output
    # (init + apply ran the model twice; this file is CPU-budgeted).
    x = jax.random.normal(jax.random.PRNGKey(0), x_shape)
    y, params = model.init_with_output(jax.random.PRNGKey(1), x, **apply_kw)
    return params, y


def _param_shapes(model, x_shape=X_SHAPE, *args):
    """Parameter tree via jax.eval_shape — no FLOPs, param-count tests only."""
    x = jax.ShapeDtypeStruct(x_shape, jnp.float32)
    return jax.eval_shape(model.init, jax.random.PRNGKey(1), x, *args)


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_fno_shapes():
    from tante_tpu.models import FNO

    model = FNO(in_T=T, dset_metadata=MD, modes1=8, modes2=8, hidden_channels=16)
    _, y = _run(model)
    assert y.shape == (B, 1, 32, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_fno_cw_layout_parity():
    """Channel-sublane (B,H,C,W) internal layout is the same function:
    identical param tree, identical output to einsum-associativity
    rounding (docs/PERF.md round 5 — removes the 48->128 lane padding)."""
    from tante_tpu.models import FNO

    kw = dict(in_T=T, dset_metadata=MD, modes1=8, modes2=8, hidden_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), X_SHAPE)
    wc = FNO(**kw)
    cw = FNO(**kw, layout="cw")
    params = wc.init(jax.random.PRNGKey(1), x)
    p_cw = cw.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(params) == jax.tree.structure(p_cw)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p_cw)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_wc = wc.apply(params, x)
    y_cw = cw.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_wc), np.asarray(y_cw), atol=2e-4, rtol=2e-4
    )


def test_fno_param_count_matches_table():
    """FNO @ hidden 48, modes 20 should be ~4M params (BASELINE.md row 1)."""
    from tante_tpu.models import FNO

    model = FNO(in_T=4, dset_metadata=MD, modes1=20, modes2=20, hidden_channels=48)
    total = n_params(_param_shapes(model))
    assert 3.0e6 < total < 5.5e6, f"FNO params {total} outside ~4M band"


def test_tfno_shapes_and_fewer_params():
    from tante_tpu.models import FNO, TFNO

    tfno = TFNO(in_T=T, dset_metadata=MD, modes1=8, modes2=8, hidden_channels=16)
    p_t, y = _run(tfno)
    assert y.shape == (B, 1, 32, 64, 3)
    fno = FNO(in_T=T, dset_metadata=MD, modes1=8, modes2=8, hidden_channels=16)
    p_f = _param_shapes(fno)
    assert n_params(p_t) < n_params(p_f), "Tucker factorization should shrink params"


def test_tfno_cw_layout_parity():
    from tante_tpu.models import TFNO

    kw = dict(in_T=T, dset_metadata=MD, modes1=8, modes2=8, hidden_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), X_SHAPE)
    wc = TFNO(**kw)
    cw = TFNO(**kw, layout="cw")
    params = wc.init(jax.random.PRNGKey(1), x)
    y_wc = wc.apply(params, x)
    y_cw = cw.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_wc), np.asarray(y_cw), atol=2e-4, rtol=2e-4
    )


def test_afno_shapes():
    from tante_tpu.models import AFNO

    model = AFNO(in_T=T, dset_metadata=MD, hidden_dim=64, n_blocks=2, patch_size=8)
    _, y = _run(model)
    assert y.shape == (B, 1, 32, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_afno_nonsquare_grid():
    """The corrected Fourier mixer must handle H != W (the reference's
    rfftn-dim quirk mangled this case; see models/afno.py docstring)."""
    from tante_tpu.models import AFNO

    md = TanteMetadata(
        dataset_name="s",
        n_spatial_dims=2,
        spatial_resolution=(16, 48),
        field_names={0: ["a"], 1: [], 2: []},
        boundary_condition_types=[],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=1,
    )
    model = AFNO(in_T=2, dset_metadata=md, hidden_dim=32, n_blocks=1, patch_size=8)
    _, y = _run(model, x_shape=(1, 2, 16, 48, 1))
    assert y.shape == (1, 1, 16, 48, 1)


def test_dpot_shapes():
    from tante_tpu.models import DPOT

    model = DPOT(
        in_T=T,
        dset_metadata=MD,
        patch_size=8,
        out_timesteps=2,
        depth=2,
        embed_dim=64,
        n_blocks=4,
        modes=8,
        out_layer_dim=8,
    )
    _, y = _run(model)
    assert y.shape == (B, 2, 32, 64, 3)
    assert np.isfinite(np.asarray(y)).all()
    assert model.output_length == 2


def test_dpot_time_agg_modes():
    from tante_tpu.models.dpot import TimeAggregator

    for agg in ("mlp", "exp_mlp"):
        m = TimeAggregator(n_timesteps=4, out_channels=16, agg_type=agg)
        x = jnp.ones((2, 3, 5, 4, 16))
        p = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(p, x)
        assert y.shape == (2, 3, 5, 16)


def test_uno_shapes():
    from tante_tpu.models import UNO

    md = TanteMetadata(
        dataset_name="s",
        n_spatial_dims=2,
        spatial_resolution=(64, 128),
        field_names={0: ["a", "b"], 1: [], 2: []},
        boundary_condition_types=[],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=2,
    )
    model = UNO(in_T=3, dset_metadata=md, width=8, factor=1)
    # 32x64 exercises the same 7-block topology (the degenerate-level guard
    # has its own test); 64x128 doubled this file's CPU cost for no coverage.
    _, y = _run(model, x_shape=(2, 3, 32, 64, 2))
    assert y.shape == (2, 1, 32, 64, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_unet_convnext_shapes():
    from tante_tpu.models import UNetConvNext

    model = UNetConvNext(
        in_T=T, dset_metadata=MD, stages=3, blocks_per_stage=1, init_features=8
    )
    _, y = _run(model)
    assert y.shape == (B, 1, 32, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_unet_convnext_param_count_matches_table():
    """CNextUNet @ init_features 15, blocks 4 should be ~4M (BASELINE.md)."""
    from tante_tpu.models import UNetConvNext

    model = UNetConvNext(
        in_T=4, dset_metadata=MD, stages=4, blocks_per_stage=4, init_features=15
    )
    total = n_params(_param_shapes(model))
    assert 3.0e6 < total < 5.5e6, f"CNextUNet params {total} outside ~4M band"


def test_attention_unet_shapes_and_batch_stats():
    from tante_tpu.models import AttentionUNet

    model = AttentionUNet(in_T=T, dset_metadata=MD, depth=4, out_T=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 16, 32, 3))
    y, variables = model.init_with_output(jax.random.PRNGKey(1), x)
    assert "batch_stats" in variables
    assert y.shape == (B, 2, 16, 32, 3)
    # train mode mutates batch_stats
    y2, updates = model.apply(
        variables, x, deterministic=False, mutable=["batch_stats"]
    )
    assert y2.shape == (B, 2, 16, 32, 3)
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_attention_unet_param_count_matches_table():
    """AttUNet @ depth 5 should be ~35M (BASELINE.md)."""
    from tante_tpu.models import AttentionUNet

    model = AttentionUNet(in_T=4, dset_metadata=MD, depth=5, out_T=1)
    variables = _param_shapes(model)
    total = n_params(variables["params"])
    assert 30e6 < total < 40e6, f"AttUNet params {total} outside ~35M band"


def test_avit_shapes_and_normalization():
    from tante_tpu.models import AViT

    model = AViT(
        in_T=T,
        dset_metadata=MD,
        out_steps=1,
        patch_size=(16, 16),
        embed_dim=64,
        num_heads=4,
        processor_blocks=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), X_SHAPE) * 5.0 + 2.0
    y, params = model.init_with_output(jax.random.PRNGKey(1), x)
    # Reference emits last min(4, T) frames regardless of out_steps.
    assert y.shape == (B, 4, 32, 64, 3)
    assert model.output_length == 4
    assert np.isfinite(np.asarray(y)).all()
    # Output scale should track input scale (denormalization applied).
    assert 0.5 < float(jnp.std(y)) < 50.0


def test_avit_t5_bucketing_matches_expectations():
    from tante_tpu.models.avit import t5_relative_position_bucket

    rel = jnp.arange(-6, 7)[None, :]
    buckets = np.asarray(t5_relative_position_bucket(rel, 32, 128))[0]
    # Zero distance -> bucket 0; small positive/negative separated by 16.
    assert buckets[6] == 0
    assert buckets[5] != buckets[7]
    assert (buckets >= 0).all() and (buckets < 32).all()


def test_cvit_point_and_grid_outputs():
    from tante_tpu.models import CViT

    # 16x32 metadata: CViT's grid/pos embeds are sized from the metadata
    # resolution, so the smaller grid needs its own (CPU budget — the
    # full-grid decode is the same chunked-scan path at 1/4 the points).
    import dataclasses

    md16 = dataclasses.replace(MD, spatial_resolution=(16, 32))
    model = CViT(
        in_T=T,
        dset_metadata=md16,
        out_steps=2,
        patch_size=(1, 8, 8),
        grid_size=(8, 8),
        latent_dim=16,
        emb_dim=32,
        depth=1,
        num_heads=4,
        dec_emb_dim=32,
        dec_num_heads=4,
        dec_depth=1,
        num_mlp_layers=1,
        mlp_ratio=1,
    )
    # 16x32 grid: the full-grid decode is the chunked-scan path either way,
    # at 1/4 the query points (CPU budget).
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 16, 32, 3))
    coords = jax.random.uniform(jax.random.PRNGKey(2), (17, 2))
    y_pts, params = model.init_with_output(jax.random.PRNGKey(1), x, coords)
    assert y_pts.shape == (B, 2, 17, 3)
    y_grid = model.apply(params, x)  # full grid
    assert y_grid.shape == (B, 2, 16, 32, 3)
    assert np.isfinite(np.asarray(y_grid)).all()


def test_cvit_embedding_types():
    from tante_tpu.models import CViT

    for emb in ("fourier", "mlp"):
        model = CViT(
            in_T=2,
            dset_metadata=MD,
            out_steps=1,
            patch_size=(1, 8, 8),
            emb_dim=32,
            depth=1,
            num_heads=4,
            dec_emb_dim=32,
            dec_num_heads=4,
            embedding_type=emb,
        )
        x = jnp.ones((1, 2, 32, 64, 3))
        coords = jnp.zeros((5, 2))
        y, _ = model.init_with_output(jax.random.PRNGKey(0), x, coords)
        assert y.shape == (1, 1, 5, 3)


def test_fno_3d_constructor_path():
    """Reference FNO accepts n_spatial_dims == 3 (``models/fno.py:102-106``
    builds 3-D mode tuples); our FNOBlock infers the rank from the input."""
    from tante_tpu.models import FNO

    model = FNO(in_T=2, modes1=4, modes2=4, modes3=4, hidden_channels=16, n_layers=2)
    _, y = _run(model, x_shape=(1, 2, 8, 8, 12, 3))
    assert y.shape == (1, 1, 8, 8, 12, 3)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_afno_3d_constructor_path():
    """Reference AFNO has a Conv3d patch embed (``models/afno.py:196-218``)."""
    from tante_tpu.models import AFNO

    model = AFNO(in_T=2, hidden_dim=32, n_blocks=2, cmlp_diagonal_blocks=4, patch_size=2)
    _, y = _run(model, x_shape=(1, 2, 8, 8, 12, 3))
    assert y.shape == (1, 1, 8, 8, 12, 3)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_spectral_conv3d_reduces_to_2d_at_depth_one():
    """With D=1, the 3-D centered spectral conv must equal the 2-D one
    (the D-axis FFT of a single plane is the identity under ortho norm)."""
    from tante_tpu.ops.spectral import (
        spectral_conv2d_centered,
        spectral_conv3d_centered,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 3)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 5, 6, 4, 2)).astype(np.float32))
    y2 = spectral_conv2d_centered(x, w2, 6, 6)
    y3 = spectral_conv3d_centered(x[:, None], w2[:, :, None], 1, 6, 6)
    np.testing.assert_allclose(np.asarray(y3[:, 0]), np.asarray(y2), atol=1e-5)


def test_uno_small_resolution_degenerate_levels():
    """At 32x64 the U topology's D/32 stage is a 1-pixel grid (zero kept
    modes); the spectral contribution must degrade to zero (same convention
    as ops/spectral.spectral_conv2d) instead of a 0-size einsum error."""
    from tante_tpu.models import UNO

    md = TanteMetadata(
        dataset_name="s",
        n_spatial_dims=2,
        spatial_resolution=(32, 64),
        field_names={0: ["a"], 1: ["vx", "vy"], 2: []},
        boundary_condition_types=[],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=3,
    )
    model = UNO(in_T=4, dset_metadata=md, width=8, factor=1)
    _, y = _run(model, x_shape=(2, 4, 32, 64, 3))
    assert y.shape == (2, 1, 32, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_patch_dense_transpose_equals_conv_transpose():
    """_PatchDenseTranspose (the dense de-patch head used by DPOT/AFNO)
    must be bit-equivalent to nn.ConvTranspose at stride == kernel, VALID
    padding — incl. DPOT's 32x32 geometry where XLA's conv_transpose
    lowering was 10x+ slower (docs/PERF.md)."""
    import flax.linen as nn

    from tante_tpu.ops.convs import _PatchDenseTranspose

    rng = np.random.default_rng(0)
    for p, cin, co in [(32, 12, 6), (16, 24, 8), (8, 10, 3), (2, 5, 3)]:
        x = jnp.asarray(rng.normal(size=(2, 4, 6, cin)).astype(np.float32))
        ref = nn.ConvTranspose(co, kernel_size=(p, p), strides=(p, p), padding="VALID")
        v = ref.init(jax.random.PRNGKey(0), x)
        want = ref.apply(v, x)
        got = _PatchDenseTranspose(features=co, patch=(p, p)).apply(
            {"params": dict(v["params"])}, x
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_avit_gradient_checkpointing_same_params_and_grads():
    """The remat flag (reference avit.py:341-372 exposes the same) must not
    change the parameter tree, the forward, or gradient shapes."""
    from tante_tpu.models import AViT

    kw = dict(
        in_T=T, dset_metadata=MD, out_steps=1, patch_size=(16, 16),
        embed_dim=64, num_heads=4, processor_blocks=2,
    )
    plain = AViT(**kw)
    remat = AViT(**kw, gradient_checkpointing=True)
    x = jax.random.normal(jax.random.PRNGKey(0), X_SHAPE)
    # CPU budget: ONE real init (remat), plain's tree via eval_shape (trace
    # only, no compile/exec); identical trees let plain.apply(v2) check
    # structural compatibility AND forward parity in one pass, and the
    # remat forward + grads come from a single value_and_grad whose loss
    # ||remat(v2) - plain(v2)||^2 == 0 asserts parity without a third
    # forward compile.
    v2 = remat.init(jax.random.PRNGKey(1), x)
    v1_shape = jax.eval_shape(plain.init, jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v1_shape) == jax.tree_util.tree_structure(v2)
    y1 = plain.apply(v2, x)
    loss, g = jax.value_and_grad(lambda p: jnp.sum((remat.apply(p, x) - y1) ** 2))(v2)
    assert float(loss) < 1e-10
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_depthwise_lane_form_equals_grouped_conv():
    """ops/convs.py:depthwise_conv2d_lanes == XLA grouped conv (f32 exact).

    The lane form is UNetConvNext's dwconv lowering (reference
    ``models/unet_convnext.py:103-111``); parity here pins the shift-and-add
    indexing at odd/even widths and non-divisor channel counts.
    """
    import jax
    import jax.numpy as jnp
    from tante_tpu.ops.convs import depthwise_conv2d_lanes

    for h, w, c, kk in [(16, 24, 15, 7), (9, 13, 7, 5), (8, 8, 3, 3)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c), jnp.float32)
        kern = jax.random.normal(jax.random.PRNGKey(1), (kk, kk, 1, c), jnp.float32)
        bias = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((kk // 2, (kk - 1) // 2),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        ) + bias
        got = depthwise_conv2d_lanes(x, kern, bias)
        assert float(jnp.abs(ref - got).max()) < 5e-5


def test_unet_convnext_bf16_depth_scan_carry():
    """bf16 compute must keep the depth>1 nn.scan carry in bf16 (regression:
    the f32 layer-scale param promoted the residual stream, breaking the scan
    dtype contract under ``dtype=bfloat16`` and silently upcasting blocks)."""
    import jax
    import jax.numpy as jnp
    from tante_tpu.models import UNetConvNext

    model = UNetConvNext(
        in_T=T, dset_metadata=MD, stages=2, blocks_per_stage=2,
        init_features=6, dtype=jnp.bfloat16,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, T, 16, 32, 3), jnp.bfloat16)
    y, _ = model.init_with_output(jax.random.PRNGKey(1), x)  # one forward
    assert y.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y, dtype=np.float32)).all()
