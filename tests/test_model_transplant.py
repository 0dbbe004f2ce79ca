"""WHOLE-MODEL weight-transplant parity vs the reference (VERDICT r2 #1).

Fixtures in tests/fixtures/transplant.npz hold the full state_dict and
forward fields of the torch reference run at a small geometry
(scripts/make_transplant_fixtures.py, reference models/tante.py:125-176).
Each test maps the state_dict into the flax param tree and asserts the JAX
forward reproduces the reference fields to <=1e-4 — so a future real-data
VRMSE delta is attributable to training dynamics, not op drift.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "transplant.npz")

B, T, H, W, F = 2, 4, 16, 32, 3
PATCH = 8
EMBED = 32


@pytest.fixture(scope="module")
def fx():
    return np.load(FIXTURES)


def sd_of(fx, tag):
    pre = tag + ".sd."
    return {k[len(pre):]: fx[k] for k in fx.files if k.startswith(pre)}


def _metadata():
    from tante_tpu.data.dataset import TanteMetadata

    return TanteMetadata(
        dataset_name="parity",
        n_spatial_dims=2,
        spatial_resolution=(H, W),
        field_names={0: ["a", "b", "c"], 1: [], 2: []},
        boundary_condition_types=["PERIODIC"],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=F,
    )


# ---------------------------------------------------------------------------
# torch-module -> flax-subtree mapping helpers.  Layout rules:
#   nn.Linear weight (out, in)            -> Dense kernel (in, out): transpose
#   nn.Conv2d weight OIHW                 -> flax Conv kernel HWIO
#   nn.ConvTranspose2d weight (in,out,kh,kw) -> flax ConvTranspose kernel
#        (kh, kw, in, out) SPATIALLY FLIPPED (lax.conv_transpose convention,
#        verified exact in tests/test_numerical_parity.py)
#   nn.MultiheadAttention in_proj (3C, C) -> wq/wk/wv = rows [0:C/C:2C/2C:3C],
#        transposed (torch computes x @ W.T)
# ---------------------------------------------------------------------------


def dense(sd, pre):
    return {"Dense_0": {"kernel": sd[pre + ".weight"].T, "bias": sd[pre + ".bias"]}}


def film(sd, pre):
    """Reference ``film`` (models/tante.py:203-217) -> our Film: the scale
    MLP's two Linears then the shift MLP's (TorchDense_0..3)."""
    return {
        "TorchDense_0": dense(sd, pre + ".condition_to_scale.0"),
        "TorchDense_1": dense(sd, pre + ".condition_to_scale.2"),
        "TorchDense_2": dense(sd, pre + ".condition_to_shift.0"),
        "TorchDense_3": dense(sd, pre + ".condition_to_shift.2"),
    }


def propagator(sd, pre):
    return {
        "w1": sd[pre + ".0.weight"].T,
        "b1": sd[pre + ".0.bias"],
        "w2": sd[pre + ".2.weight"].T,
        "b2": sd[pre + ".2.bias"],
    }


def fused_block(sd, pre):
    """torch TransformerBlock (attn_backbone.py:38-62) -> FusedTransformerBlock."""
    w = sd[pre + ".attn.in_proj_weight"]
    b = sd[pre + ".attn.in_proj_bias"]
    c = w.shape[1]
    return {
        "ln1_scale": sd[pre + ".ln1.weight"],
        "ln1_bias": sd[pre + ".ln1.bias"],
        "wq": w[:c].T,
        "bq": b[:c],
        "wk": w[c : 2 * c].T,
        "bk": b[c : 2 * c],
        "wv": w[2 * c :].T,
        "bv": b[2 * c :],
        "wo": sd[pre + ".attn.out_proj.weight"].T,
        "bo": sd[pre + ".attn.out_proj.bias"],
        "ln2_scale": sd[pre + ".ln2.weight"],
        "ln2_bias": sd[pre + ".ln2.bias"],
        "w1": sd[pre + ".mlp.0.weight"].T,
        "b1": sd[pre + ".mlp.0.bias"],
        "w2": sd[pre + ".mlp.2.weight"].T,
        "b2": sd[pre + ".mlp.2.bias"],
    }


def backbone(sd, pre, n_blocks):
    out = {
        "vertical_propagator": propagator(sd, pre + ".vertical_propagator"),
        "horizontal_propagator": propagator(sd, pre + ".horizontal_propagator"),
        "temporal_propagator": propagator(sd, pre + ".temporal_propagator"),
    }
    for i in range(n_blocks):
        out[f"block_{i}"] = fused_block(sd, f"{pre}.blocks.{i}")
    return out


def conv2d(sd, pre):
    return {
        "Conv_0": {
            "kernel": np.transpose(sd[pre + ".conv.weight"], (2, 3, 1, 0)),
            "bias": sd[pre + ".conv.bias"],
        }
    }


def tconv2d(sd, pre, key=".conv.weight"):
    w = sd[pre + key]
    return {
        "ConvTranspose_0": {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]),
            "bias": sd[pre + key.replace("weight", "bias")],
        }
    }


def spectral(sd, pre):
    """Reference SpectralLayer (enc_dec_fno.py:184-223): complex weight was
    saved re/im-stacked on the last axis — our layout directly."""
    return {
        "weight": sd[pre + ".weight"],
        "w0": {
            "kernel": np.transpose(sd[pre + ".w0.weight"], (2, 3, 1, 0)),
            "bias": sd[pre + ".w0.bias"],
        },
    }


def tante_params(sd, enc_dec="cnn", deg=True, n_blocks=3):
    p = {
        "t_emb": sd["t_emb"],
        "s_emb": sd["s_emb"],
        "t_encode": film(sd, "t_encode"),
        "blocks_0": backbone(sd, "blocks.0", n_blocks),
    }
    if enc_dec == "cnn":
        p["encoder"] = {
            f"RealConv2d_{i}": conv2d(sd, f"encoder.enc_conv_{i + 1}") for i in range(3)
        }
        p["decoders_0"] = {
            f"RealTransConv2d_{i}": tconv2d(sd, f"decoders.0.dec_conv_{i + 1}", ".deconv.weight")
            for i in range(3)
        }
    else:
        p["encoder"] = {
            "SpectralLayer_0": spectral(sd, "encoder.enc_spectral_1"),
            "RealConv2d_0": conv2d(sd, "encoder.enc_conv_1"),
            "SpectralLayer_1": spectral(sd, "encoder.enc_spectral_2"),
            "RealConv2d_1": conv2d(sd, "encoder.enc_conv_2"),
        }
        p["decoders_0"] = {
            "RealTransConv2d_0": tconv2d(sd, "decoders.0.dec_conv_1", ".deconv.weight"),
            "SpectralLayer_0": spectral(sd, "decoders.0.dec_spectral_1"),
            "RealTransConv2d_1": tconv2d(sd, "decoders.0.dec_conv_2", ".deconv.weight"),
            "SpectralLayer_1": spectral(sd, "decoders.0.dec_spectral_2"),
        }
    if not deg:
        p["interprators_0"] = {
            f"TorchDense_{i}": dense(sd, f"interprators.0.interprete.{2 * i}")
            for i in range(3)
        }
        p["modifiers_0"] = film(sd, "modifiers.0")
    return p


def build_tante(enc_dec="cnn", deg=True, output_length=2):
    from tante_tpu.models import TANTE

    return TANTE(
        in_T=T,
        dset_metadata=_metadata(),
        taylor_order=1,
        attn_axes="THW",
        embed_dim=EMBED,
        patch_scale=PATCH,
        n_head=4,
        mlp_ratio=1.0,
        dropout=0.0,
        enc_dec_type=enc_dec,
        modes1=4,
        modes2=4,
        output_length=output_length,
        deg=deg,
    )


def assert_tree_matches_init(model, mapped, x, extra_args=()):
    """The transplanted tree must have exactly the init tree's structure —
    catches silently-missing or misnamed params before the numeric check."""
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x), *extra_args)["params"]
    flat_init = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_map = jax.tree_util.tree_flatten_with_path(mapped)[0]
    keys_init = {jax.tree_util.keystr(k): v.shape for k, v in flat_init}
    keys_map = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in flat_map}
    assert keys_init == keys_map, (
        f"missing: {sorted(set(keys_init) - set(keys_map))[:8]} "
        f"extra: {sorted(set(keys_map) - set(keys_init))[:8]} "
        f"shape-diff: {[(k, keys_init[k], keys_map[k]) for k in keys_init if k in keys_map and keys_init[k] != keys_map[k]][:8]}"
    )


def _nhwc(x_tchw):
    return np.transpose(x_tchw, (0, 1, 3, 4, 2))


def test_tante_cnn_forward_matches_torch(fx):
    sd = sd_of(fx, "tante_cnn")
    model = build_tante("cnn", deg=True)
    mapped = tante_params(sd, "cnn", deg=True)
    x = _nhwc(fx["tante_cnn.x"])
    assert_tree_matches_init(model, mapped, x)
    got = model.apply({"params": mapped}, jnp.asarray(x))
    want = _nhwc(fx["tante_cnn.y"])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_tante_adaptive_forward_matches_torch(fx):
    sd = sd_of(fx, "tante_ad")
    model = build_tante("cnn", deg=False, output_length=1)
    mapped = tante_params(sd, "cnn", deg=False)
    x = _nhwc(fx["tante_ad.x"])
    assert_tree_matches_init(model, mapped, x, extra_args=(4.0,))
    got, rt = model.apply({"params": mapped}, jnp.asarray(x), 4.0)
    np.testing.assert_allclose(np.asarray(rt), fx["tante_ad.rt"], atol=1e-4)
    # the reference emits floor(R_t[0]) frames; ours computes the static
    # n_frames(out_T)=4 budget — the first emitted frames must agree
    n_ref = fx["tante_ad.y"].shape[1]
    want = _nhwc(fx["tante_ad.y"])
    np.testing.assert_allclose(np.asarray(got[:, :n_ref]), want, atol=1e-4)


def test_tante_fno_forward_matches_torch(fx):
    sd = sd_of(fx, "tante_fno")
    model = build_tante("fno", deg=True)
    mapped = tante_params(sd, "fno", deg=True)
    x = _nhwc(fx["tante_fno.x"])
    assert_tree_matches_init(model, mapped, x)
    got = model.apply({"params": mapped}, jnp.asarray(x))
    want = _nhwc(fx["tante_fno.y"])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


# ---------------------------------------------------------------------------
# AViT (reference models/avit.py:379-454)
# ---------------------------------------------------------------------------


def conv1x1_dense(sd, pre):
    """torch 1x1 Conv2d head -> TorchDense over channels."""
    w = sd[pre + ".weight"][:, :, 0, 0]  # (out, in)
    return {"Dense_0": {"kernel": w.T, "bias": sd[pre + ".bias"]}}


def layernorm(sd, pre):
    return {"scale": sd[pre + ".weight"], "bias": sd[pre + ".bias"]}


def wb(sd, pre):
    return {"weight": sd[pre + ".weight"], "bias": sd[pre + ".bias"]}


def flax_tconv(w):
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose kernel
    (kh, kw, in, out), spatially flipped."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def avit_params(sd, n_blocks=2):
    p = {
        "space_bag": {
            "Dense_0": {"kernel": sd["space_bag.weight"].T, "bias": sd["space_bag.bias"]}
        },
        "embed": {},
        "debed": {},
    }
    for j, idx in enumerate((0, 3, 6)):
        p["embed"][f"Conv_{j}"] = {
            "kernel": np.transpose(sd[f"embed.in_proj.{idx}.weight"], (2, 3, 1, 0))
        }
        p["embed"][f"RMSInstanceNorm_{j}"] = wb(sd, f"embed.in_proj.{idx + 1}")
    for j, idx in enumerate((0, 3)):
        p["debed"][f"ConvTranspose_{j}"] = {
            "kernel": flax_tconv(sd[f"debed.out_proj.{idx}.weight"])
        }
        p["debed"][f"RMSInstanceNorm_{j}"] = wb(sd, f"debed.out_proj.{idx + 1}")
    p["debed"]["ConvTranspose_2"] = {
        "kernel": flax_tconv(sd["debed.out_kernel"]),
        "bias": sd["debed.out_bias"],
    }
    for i in range(n_blocks):
        tp = f"blocks.{i}.temporal"
        p[f"temporal_{i}"] = {
            "norm1": wb(sd, tp + ".norm1"),
            "norm2": wb(sd, tp + ".norm2"),
            "input_head": conv1x1_dense(sd, tp + ".input_head"),
            "output_head": conv1x1_dense(sd, tp + ".output_head"),
            "qnorm": layernorm(sd, tp + ".qnorm"),
            "knorm": layernorm(sd, tp + ".knorm"),
            "rel_pos_bias": {
                "embedding": sd[tp + ".rel_pos_bias.relative_attention_bias.weight"]
            },
            "gamma": sd[tp + ".gamma"],
        }
        sp = f"blocks.{i}.spatial"
        # NOTE: sd[sp + ".rel_pos_bias.*"] exists but is UNUSED by the
        # reference forward (created, never called) — intentionally dropped.
        p[f"spatial_{i}"] = {
            "norm1": wb(sd, sp + ".norm1"),
            "norm2": wb(sd, sp + ".norm2"),
            "mlp_norm": wb(sd, sp + ".mlp_norm"),
            "input_head": conv1x1_dense(sd, sp + ".input_head"),
            "output_head": conv1x1_dense(sd, sp + ".output_head"),
            "qnorm": layernorm(sd, sp + ".qnorm"),
            "knorm": layernorm(sd, sp + ".knorm"),
            "TorchDense_0": {
                "Dense_0": {
                    "kernel": sd[sp + ".mlp.fc1.weight"].T,
                    "bias": sd[sp + ".mlp.fc1.bias"],
                }
            },
            "TorchDense_1": {
                "Dense_0": {
                    "kernel": sd[sp + ".mlp.fc2.weight"].T,
                    "bias": sd[sp + ".mlp.fc2.bias"],
                }
            },
            "gamma_att": sd[sp + ".gamma_att"],
            "gamma_mlp": sd[sp + ".gamma_mlp"],
        }
    return p


def test_avit_forward_matches_torch(fx):
    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models.avit import AViT

    sd = sd_of(fx, "avit")
    # 32x64 (2x4 patch grid): at a 1x2 grid the RMS instance-norm std over
    # 2 spatial elements amplifies f32 rounding ~1000x (see the fixture
    # generator's docstring).
    md = TanteMetadata(
        dataset_name="parity_avit",
        n_spatial_dims=2,
        spatial_resolution=(2 * H, 2 * W),
        field_names={0: ["a", "b", "c"], 1: [], 2: []},
        boundary_condition_types=["PERIODIC"],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[8],
        n_fields=F,
    )
    model = AViT(
        in_T=T,
        dset_metadata=md,
        out_steps=4,
        patch_size=(16, 16),
        embed_dim=EMBED,
        num_heads=4,
        processor_blocks=2,
        drop_path=0.0,
    )
    mapped = avit_params(sd, n_blocks=2)
    x = _nhwc(fx["avit.x"])
    assert_tree_matches_init(model, mapped, x)
    got = model.apply({"params": mapped}, jnp.asarray(x))
    want = _nhwc(fx["avit.y"])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
