"""TANTE core model shape/behavior tests (mirrors the reference's __main__
smoke blocks, models/tante.py:288-318, attn_backbone.py:195-211,
enc_dec_cnn.py:280-336)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.models import TANTE, AttnBackbone, DecCNN, DecFNO, EncCNN, EncFNO

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


def test_enc_dec_cnn_roundtrip_shapes():
    enc = EncCNN(dset_metadata=MD, embed_dim=64, patch_scale=8)
    dec = DecCNN(dset_metadata=MD, embed_dim=64, patch_scale=8)
    x = jnp.ones((2, 4, 32, 64, 3))
    z, _ = enc.init_with_output(jax.random.PRNGKey(0), x)
    assert z.shape == (2, 4, 4, 8, 64)
    y, _ = dec.init_with_output(jax.random.PRNGKey(1), z)
    assert y.shape == (2, 4, 32, 64, 3)


def test_enc_dec_cnn_overlap():
    enc = EncCNN(dset_metadata=MD, embed_dim=32, patch_scale=8, overlap_ratio=0.5)
    x = jnp.ones((1, 2, 32, 64, 3))
    z, _ = enc.init_with_output(jax.random.PRNGKey(0), x)
    assert z.shape == (1, 2, 4, 8, 32)  # exact grid enforced by adaptive pool


def test_enc_dec_fno_roundtrip_shapes():
    enc = EncFNO(dset_metadata=MD, embed_dim=64, modes=(8, 8), patch_scale=8)
    dec = DecFNO(dset_metadata=MD, embed_dim=64, modes=(8, 8), patch_scale=8)
    x = jnp.ones((2, 3, 32, 64, 3))
    z, _ = enc.init_with_output(jax.random.PRNGKey(0), x)
    assert z.shape == (2, 3, 4, 8, 64)
    y, _ = dec.init_with_output(jax.random.PRNGKey(1), z)
    assert y.shape == (2, 3, 32, 64, 3)


@pytest.mark.parametrize("axes", ["THW", "LY", "XA", "C"])
def test_attn_backbone_axes(axes):
    m = AttnBackbone(tensor_shape=(3, 4, 8, 32), attn_axes=axes, expanded_channel=16, n_head=4)
    x = jnp.ones((2, 3, 4, 8, 32))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_tante_fixed_mode():
    model = TANTE(
        in_T=4,
        dset_metadata=MD,
        taylor_order=2,
        attn_axes="TH-WL",
        embed_dim=32,
        patch_scale=8,
        output_length=3,
        deg=True,
        n_head=4,
    )
    x = jnp.ones((2, 4, 32, 64, 3))
    y, _ = model.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (2, 3, 32, 64, 3)


def test_tante_crops_longer_history():
    model = TANTE(
        in_T=4, dset_metadata=MD, attn_axes="T", embed_dim=32, patch_scale=8, n_head=4
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 32, 64, 3))
    y_full, p = model.init_with_output(jax.random.PRNGKey(0), x)
    y_crop = model.apply(p, x[:, -4:])
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_crop), atol=1e-5)


def test_tante_adaptive_mode():
    model = TANTE(
        in_T=4,
        dset_metadata=MD,
        taylor_order=1,
        attn_axes="TH",
        embed_dim=32,
        patch_scale=8,
        deg=False,
        n_head=4,
    )
    x = jnp.ones((2, 4, 32, 64, 3))
    (frames, rt), p = model.init_with_output(jax.random.PRNGKey(0), x, 1.5)
    assert frames.shape == (2, 1, 32, 64, 3)  # out_T=1.5 -> 1 frame slot
    assert rt.shape == (2,)
    assert float(rt.min()) >= 1.001 - 1e-6
    assert float(rt.max()) <= 1.501 + 1e-6

    frames8, rt8 = model.apply(p, x, 8.0)
    assert frames8.shape == (2, 8, 32, 64, 3)
    assert float(rt8.min()) >= 1.001 - 1e-6
    assert float(rt8.max()) <= 8.001 + 1e-6


def test_tante_taylor_sum_matches_hand_computation():
    """Taylor combination parity: with taylor_order=2, frame i must equal
    u0 + d1*(i*dt) + d2*(i*dt)^2/2 (reference models/tante.py:165-169)."""
    model = TANTE(
        in_T=2,
        dset_metadata=MD,
        taylor_order=2,
        attn_axes="T-H",
        embed_dim=32,
        patch_scale=8,
        output_length=3,
        frame_interval=0.5,
        deg=True,
        n_head=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 64, 3))
    y, _ = model.init_with_output(jax.random.PRNGKey(1), x)

    # Recompute derivatives by calling with output_length=1 twice is not
    # possible directly; instead verify the Taylor structure: the three
    # frames must be an affine function of (i*dt, (i*dt)^2/2) with shared
    # coefficients. Solve for d1, d2 from frames 1, 2 and predict frame 3.
    u0 = np.asarray(x[:, -1])
    f = np.asarray(y)
    dt = 0.5
    t1, t2, t3 = 1 * dt, 2 * dt, 3 * dt
    # f1 - u0 = d1 t1 + d2 t1^2/2 ; f2 - u0 = d1 t2 + d2 t2^2/2
    a = np.array([[t1, t1**2 / 2], [t2, t2**2 / 2]])
    rhs = np.stack([f[:, 0] - u0, f[:, 1] - u0])  # (2, B, H, W, C)
    sol = np.linalg.solve(a, rhs.reshape(2, -1)).reshape(2, *rhs.shape[1:])
    pred3 = u0 + sol[0] * t3 + sol[1] * t3**2 / 2
    np.testing.assert_allclose(f[:, 2], pred3, atol=1e-3)


def test_packed_frame_io_matches_physical():
    """The packed decode->encode fast path (ops/convs.py pack_patches /
    packed_in / packed_out) must reproduce the physical-layout path: the
    packed tensors are a fixed permutation of the conv formulation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE
    from tante_tpu.models.enc_dec_cnn import PATCH_MAP
    from tante_tpu.ops.convs import pack_patches, packed_patch_ok, unpack_patches

    md = TanteMetadata(
        dataset_name="s",
        n_spatial_dims=2,
        spatial_resolution=(16, 32),
        field_names={0: ["a", "b", "c"], 1: [], 2: []},
        boundary_condition_types=[],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=3,
    )
    model = TANTE(
        in_T=2,
        dset_metadata=md,
        taylor_order=1,
        attn_axes="THW",
        embed_dim=32,
        patch_scale=8,
        n_head=4,
        output_length=1,
        deg=True,
    )
    assert model.packed_io_ok()
    p0 = PATCH_MAP[model.patch_scale][0]
    assert packed_patch_ok(p0, 0.0)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)

    # pack/unpack are exact inverses
    xp = pack_patches(x, p0)
    np.testing.assert_array_equal(np.asarray(unpack_patches(xp, p0)), np.asarray(x))

    # encode: packed input == physical input
    lat = model.apply(params, x, method="encode")
    lat_p = model.apply(params, xp, method="encode", packed=True)
    np.testing.assert_allclose(np.asarray(lat_p), np.asarray(lat), atol=2e-5)

    # head: packed output == pack(physical output)
    u = x[:, -1:]
    frames = model.apply(params, lat, u, method="head")
    frames_p = model.apply(
        params, lat, pack_patches(u, p0), method="head", packed=True
    )
    np.testing.assert_allclose(
        np.asarray(unpack_patches(frames_p, p0)), np.asarray(frames), atol=2e-5
    )


def test_morton_frame_io_matches_physical():
    """The morton constant-row fast path (ops/convs.py morton_pack +
    EncCNN/DecCNN 'morton' branches) must reproduce the physical-layout
    path: rows are a fixed quad-tree permutation and the block-diagonal
    kron(I_g, W) stage matmuls use the identical conv parameters."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE
    from tante_tpu.models.enc_dec_cnn import PATCH_MAP
    from tante_tpu.ops.convs import morton_pack, morton_unpack

    md = TanteMetadata(
        dataset_name="s",
        n_spatial_dims=2,
        spatial_resolution=(16, 32),
        field_names={0: ["a", "b", "c"], 1: [], 2: []},
        boundary_condition_types=[],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=3,
    )
    model = TANTE(
        in_T=2,
        dset_metadata=md,
        taylor_order=1,
        attn_axes="THW",
        embed_dim=32,
        patch_scale=8,
        n_head=4,
        output_length=1,
        deg=True,
    )
    assert model.morton_io_ok()
    ps = PATCH_MAP[model.patch_scale]
    g = (ps[1] * ps[2]) ** 2
    fat = ps[0] * ps[0] * 3
    n_rows = 16 * 32 // (ps[0] * ps[0])

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)

    # morton pack/unpack are exact inverses
    xm = morton_pack(x, ps)
    np.testing.assert_array_equal(
        np.asarray(morton_unpack(xm, ps, (16, 32))), np.asarray(x)
    )
    xg = xm.reshape(*xm.shape[:-2], n_rows // g, g * fat)

    # encode: morton rows == physical input
    lat = model.apply(params, x, method="encode")
    lat_m = model.apply(params, xg, method="encode", packed="morton")
    np.testing.assert_allclose(np.asarray(lat_m), np.asarray(lat), atol=2e-5)

    # head: morton output == morton_pack(physical output)
    u = x[:, -1:]
    frames = model.apply(params, lat, u, method="head")
    ug = morton_pack(u, ps).reshape(2, 1, n_rows // g, g * fat)
    frames_m = model.apply(params, lat, ug, method="head", packed="morton")
    got = morton_unpack(
        frames_m.reshape(*frames_m.shape[:-2], n_rows, fat), ps, (16, 32)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(frames), atol=2e-5)


def test_morton_patch_scale_variants_and_out_dtype():
    """Morton gate across PATCH_MAP entries, plus bf16 frame emission:
    rollout_tante_latent(out_dtype=bf16) returns the bf16 rounding of the
    exact same trajectory (the f32 expansion point rides the carry)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE
    from tante_tpu.train.rollout import rollout_tante_latent

    def build(res, nf, ps):
        md = TanteMetadata(
            dataset_name="s",
            n_spatial_dims=2,
            spatial_resolution=res,
            field_names={0: ["f"] * nf, 1: [], 2: []},
            boundary_condition_types=[],
            n_files=1,
            n_trajectories_per_file=[1],
            n_steps_per_trajectory=[8],
            n_fields=nf,
        )
        return TANTE(
            in_T=2,
            dset_metadata=md,
            taylor_order=1,
            attn_axes="THW",
            embed_dim=32,
            patch_scale=ps,
            n_head=4,
            output_length=1,
            deg=True,
        )

    # patch_scale 16 has a pad-1 4x4 stage -> not a clean space-to-depth
    assert not build((32, 64), 3, 16).morton_io_ok()
    assert build((8, 16), 2, 2).morton_io_ok()

    # patch_scale 4 ((2,2,1): one pointwise stage): full rollout equivalence
    from tante_tpu.train.rollout import rollout_fixed

    m4 = build((16, 16), 2, 4)
    assert m4.morton_io_ok()
    x4 = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 16, 16, 2))
    p4 = m4.init(jax.random.PRNGKey(4), x4)
    ref = rollout_fixed(lambda w: m4.apply(p4, w), x4, 3, 1)
    got = rollout_tante_latent(m4, p4, x4, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    model = build((16, 32), 3, 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    f32 = rollout_tante_latent(model, params, x, 4)
    b16 = rollout_tante_latent(model, params, x, 4, out_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(f32.astype(jnp.bfloat16)), np.asarray(b16)
    )
