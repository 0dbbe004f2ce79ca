"""Pallas kernel numerics (interpret mode on CPU)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tante_tpu.ops.pallas_spectral import (
    spectral_mode_matmul,
    spectral_mode_matmul_xla,
)


def test_spectral_mode_matmul_matches_xla():
    key = jax.random.PRNGKey(0)
    b, m, ci, co = 4, 22, 48, 48  # non-multiples exercise padding
    ks = jax.random.split(key, 4)
    x_re = jax.random.normal(ks[0], (b, m, ci))
    x_im = jax.random.normal(ks[1], (b, m, ci))
    w_re = jax.random.normal(ks[2], (m, ci, co)) * 0.1
    w_im = jax.random.normal(ks[3], (m, ci, co)) * 0.1

    want_re, want_im = spectral_mode_matmul_xla(x_re, x_im, w_re, w_im)
    got_re, got_im = spectral_mode_matmul(
        x_re, x_im, w_re, w_im, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(want_re), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(want_im), atol=1e-4)


def test_spectral_mode_matmul_complex_semantics():
    """(a+bi)(c+di) = (ac-bd) + (ad+bc)i on a 1-mode toy case."""
    x_re = jnp.asarray([[[2.0]]])
    x_im = jnp.asarray([[[3.0]]])
    w_re = jnp.asarray([[[5.0]]])
    w_im = jnp.asarray([[[7.0]]])
    o_re, o_im = spectral_mode_matmul(x_re, x_im, w_re, w_im, interpret=True)
    assert float(o_re[0, 0, 0]) == 2 * 5 - 3 * 7
    assert float(o_im[0, 0, 0]) == 2 * 7 + 3 * 5


def test_spectral_conv2d_pallas_path_matches_xla():
    import jax
    import jax.numpy as jnp
    from unittest import mock

    from tante_tpu.ops import pallas_spectral
    from tante_tpu.ops.spectral import spectral_conv2d

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 24, 5))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 7, 4, 6, 2)) * 0.1

    want = spectral_conv2d(x, w, 4, 6, use_pallas=False)
    # Route the pallas path through interpret mode on CPU.
    orig = pallas_spectral.spectral_mode_matmul
    with mock.patch.object(
        pallas_spectral,
        "spectral_mode_matmul",
        lambda *a, **k: orig(*a, interpret=True, **k),
    ):
        got = spectral_conv2d(x, w, 4, 6, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_packed_head_attention_matches_standard():
    import jax
    import jax.numpy as jnp

    from tante_tpu.ops.attention import packed_head_attention

    def standard(q, k, v, causal=False):
        d = q.shape[-1]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * d**-0.5, k)
        if causal:
            l = logits.shape[-1]
            mask = jnp.tril(jnp.ones((l, l), bool))
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(logits.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, v)

    key = jax.random.PRNGKey(0)
    for causal in (False, True):
        for (b, l, h, d) in [(6, 16, 8, 32), (3, 4, 4, 16), (2, 48, 8, 32)]:
            ks = jax.random.split(key, 3)
            q = jax.random.normal(ks[0], (b, l, h, d))
            k = jax.random.normal(ks[1], (b, l, h, d))
            v = jax.random.normal(ks[2], (b, l, h, d))
            got = packed_head_attention(q, k, v, causal=causal)
            want = standard(q, k, v, causal=causal)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5,
                err_msg=f"causal={causal} shape={(b,l,h,d)}",
            )


def test_mha_packed_path_equals_fallback():
    import jax
    import jax.numpy as jnp
    from unittest import mock

    from tante_tpu.ops import attention as attn_mod
    from tante_tpu.ops.attention import MultiheadAttention

    mha = MultiheadAttention(embed_dim=32, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    params = mha.init(jax.random.PRNGKey(1), x)
    got = mha.apply(params, x, causal=True)  # packed (4*10 <= 512)
    with mock.patch.object(attn_mod, "PACKED_ATTENTION_MAX_TOKENS", 0):
        want = mha.apply(params, x, causal=True)  # fallback
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_attention_core_matches_xla():
    import jax
    import jax.numpy as jnp

    from tante_tpu.ops.pallas_attention import packed_attention_core

    key = jax.random.PRNGKey(0)
    for causal in (False, True):
        for (s, nh, l, d) in [(10, 8, 16, 32), (7, 4, 4, 16)]:
            p = nh * l
            ks = jax.random.split(key, 3)
            q = jax.random.normal(ks[0], (s, p, d)) * d**-0.5
            k = jax.random.normal(ks[1], (s, p, d))
            v = jax.random.normal(ks[2], (s, p, d))

            got = packed_attention_core(
                q, k, v, l=l, causal=causal, seq_tile=4, interpret=True
            )
            # XLA reference with the same packed layout
            logits = jnp.einsum("spd,sqd->spq", q, k)
            row = np.arange(p)
            mask = (row[:, None] // l) == (row[None, :] // l)
            if causal:
                mask = mask & ((row[:, None] % l) >= (row[None, :] % l))
            logits = jnp.where(jnp.asarray(mask)[None], logits, -1e30)
            w = jax.nn.softmax(logits, -1)
            want = jnp.einsum("spq,sqd->spd", w, v)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5,
                err_msg=f"causal={causal} s{s} nh{nh} l{l} d{d}",
            )


def test_fused_block_matches_transformer_block():
    """FusedTransformerBlock (XLA fallback on CPU) == TransformerBlock with
    mapped params, fp32, all three axial layouts."""
    import jax
    import jax.numpy as jnp

    from tante_tpu.models.common import FusedTransformerBlock, TransformerBlock

    c, heads = 64, 4
    std = TransformerBlock(embed_dim=c, n_head=heads, mlp_ratio=1.0, dropout=0.0)
    fused = FusedTransformerBlock(embed_dim=c, n_head=heads, mlp_ratio=1.0, dropout=0.0)

    for l, causal in ((4, True), (16, False), (48, False)):
        x = jax.random.normal(jax.random.PRNGKey(l), (6, l, c))
        p_std = std.init(jax.random.PRNGKey(0), x)["params"]
        mapped = {
            "ln1_scale": p_std["ln1"]["scale"],
            "ln1_bias": p_std["ln1"]["bias"],
            "wq": p_std["attn"]["q_proj"]["kernel"],
            "bq": p_std["attn"]["q_proj"]["bias"],
            "wk": p_std["attn"]["k_proj"]["kernel"],
            "bk": p_std["attn"]["k_proj"]["bias"],
            "wv": p_std["attn"]["v_proj"]["kernel"],
            "bv": p_std["attn"]["v_proj"]["bias"],
            "wo": p_std["attn"]["out_proj"]["kernel"],
            "bo": p_std["attn"]["out_proj"]["bias"],
            "ln2_scale": p_std["ln2"]["scale"],
            "ln2_bias": p_std["ln2"]["bias"],
            "w1": p_std["mlp"]["fc1"]["Dense_0"]["kernel"],
            "b1": p_std["mlp"]["fc1"]["Dense_0"]["bias"],
            "w2": p_std["mlp"]["fc2"]["Dense_0"]["kernel"],
            "b2": p_std["mlp"]["fc2"]["Dense_0"]["bias"],
        }
        want = std.apply({"params": p_std}, x, causal=causal)
        got = fused.apply({"params": mapped}, x, causal=causal)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
            err_msg=f"l={l} causal={causal}",
        )


def test_fused_block_gradients_flow():
    """The custom VJP produces finite grads for every param and the input,
    matching jax.grad of the XLA math."""
    import jax
    import jax.numpy as jnp

    from tante_tpu.models.common import FusedTransformerBlock
    from tante_tpu.ops.pallas_block import BlockParams, _xla_block

    c, heads, l = 32, 4, 8
    m = FusedTransformerBlock(embed_dim=c, n_head=heads, mlp_ratio=1.0, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, l, c))
    variables = m.init(jax.random.PRNGKey(1), x)

    def loss(v, x):
        return jnp.sum(m.apply(v, x, causal=True) ** 2)

    gv, gx = jax.grad(loss, argnums=(0, 1))(variables, x)
    for path, leaf in jax.tree_util.tree_flatten_with_path(gv)[0]:
        assert np.all(np.isfinite(np.asarray(leaf))), path
        assert float(np.abs(np.asarray(leaf)).max()) > 0, path
    assert np.all(np.isfinite(np.asarray(gx)))

    # grads equal the XLA math's grads exactly (the VJP recomputes it)
    params = BlockParams(**{k: variables["params"][k] for k in BlockParams._fields})

    def loss_ref(p, x):
        return jnp.sum(_xla_block(x, p, l, heads, True) ** 2)

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gv["params"]["wq"]), np.asarray(gp_ref.wq), rtol=1e-6, atol=1e-6
    )


@pytest.mark.slow  # opt-in feature path, >20s compile on 1 CPU
def test_fused_group_matches_per_block_chain():
    """fused_group_apply (XLA fallback on CPU) must equal the per-block
    rearrange + fused_block_apply chain bit-for-bit, and its VJP must match
    the chain's gradients."""
    import numpy as np
    from einops import rearrange

    from tante_tpu.ops.pallas_block import (
        BlockParams,
        fused_block_apply,
        fused_group_apply,
        group_fusable,
    )

    rng = np.random.default_rng(0)
    b, t, h, w, c, heads = 2, 4, 8, 6, 32, 4
    axes = "THW"
    assert group_fusable(axes, (t, h, w), c, heads)

    def mk(i):
        r = np.random.default_rng(i)
        g = lambda *s: jnp.asarray(r.normal(size=s).astype(np.float32) * 0.1)
        return BlockParams(
            ln1_scale=jnp.ones((c,)), ln1_bias=jnp.zeros((c,)),
            wq=g(c, c), bq=g(c), wk=g(c, c), bk=g(c), wv=g(c, c), bv=g(c),
            wo=g(c, c), bo=g(c), ln2_scale=jnp.ones((c,)), ln2_bias=jnp.zeros((c,)),
            w1=g(c, c), b1=g(c), w2=g(c, c), b2=g(c),
        )

    params = tuple(mk(i) for i in range(len(axes)))
    x = jnp.asarray(rng.normal(size=(b, t, h, w, c)).astype(np.float32))

    def chain(x5):
        z = x5
        for axis, p in zip(axes, params):
            if axis == "T":
                y = rearrange(z, "b t h w c -> (b h w) t c")
                y = fused_block_apply(y, p, t, heads, True)
                z = rearrange(y, "(b h w) t c -> b t h w c", b=b, h=h, w=w)
            elif axis == "H":
                y = rearrange(z, "b t h w c -> (b t w) h c")
                y = fused_block_apply(y, p, h, heads, False)
                z = rearrange(y, "(b t w) h c -> b t h w c", b=b, t=t, w=w)
            else:
                y = rearrange(z, "b t h w c -> (b t h) w c")
                y = fused_block_apply(y, p, w, heads, False)
                z = rearrange(y, "(b t h) w c -> b t h w c", b=b, t=t, h=h)
        return z

    want = chain(x)
    got = fused_group_apply(x, params, axes, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    g_want = jax.grad(lambda a: jnp.sum(chain(a) ** 2))(x)
    g_got = jax.grad(lambda a: jnp.sum(fused_group_apply(a, params, axes, heads) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-4)


def test_fused_group_guard_rejects_bad_geometry():
    from tante_tpu.ops.pallas_block import group_fusable

    assert not group_fusable("THWL", (4, 8, 6), 32, 4)  # L not groupable
    assert not group_fusable("TH", (4, 8, 6), 30, 4)  # C % heads != 0
    # VMEM bound: a 1M-token grid per batch element must not group-fuse.
    assert not group_fusable("TH", (16, 256, 256), 256, 8)
    # Odd-but-divisible geometries stay fusable via fitted_seq_pack.
    assert group_fusable("T", (4, 5, 7), 32, 4)


@pytest.mark.slow  # opt-in feature path, >25s compile on 1 CPU
def test_fused_chain_matches_per_block(rng):
    """Sub-chain fusion (fused_chain_apply): input in the FIRST axis's
    token order, output in the LAST's, must equal the per-block chain with
    XLA rearranges between blocks — incl. gradients through the custom VJP.
    (Opt-in path: measured slower than per-block at the flagship geometry,
    docs/PERF.md round 3, but kept for geometries with many batch items.)"""
    import jax
    import jax.numpy as jnp
    from einops import rearrange

    from tante_tpu.ops.pallas_block import (
        BlockParams,
        _xla_block,
        chain_fusable,
        fused_chain_apply,
    )

    t, h, w, c, heads, b = 2, 4, 6, 32, 4, 1
    dims = (t, h, w)

    def mk():
        shapes = [
            (c,), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,),
            (c,), (c,), (c, c), (c,), (c, c), (c,),
        ]
        return BlockParams(
            *[jnp.asarray(rng.normal(size=s).astype("float32")) * 0.05 for s in shapes]
        )

    params = tuple(mk() for _ in range(3))
    x5 = jnp.asarray(rng.normal(size=(b, t, h, w, c)).astype("float32"))

    def per_block(x5):
        y3 = rearrange(x5, "b t h w c -> (b h w) t c")
        y3 = _xla_block(y3, params[0], t, heads, True)
        y5 = rearrange(y3, "(b h w) t c -> b t h w c", b=b, h=h, w=w)
        y3 = rearrange(y5, "b t h w c -> (b t w) h c")
        y3 = _xla_block(y3, params[1], h, heads, False)
        y5 = rearrange(y3, "(b t w) h c -> b t h w c", b=b, t=t, w=w)
        y3 = rearrange(y5, "b t h w c -> (b t h) w c")
        return _xla_block(y3, params[2], w, heads, False)

    assert chain_fusable("THW", dims, c, heads, 4)
    x3 = rearrange(x5, "b t h w c -> (b h w) t c")
    got = fused_chain_apply(x3, params, "THW", heads, dims)
    want = per_block(x5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    g_want = jax.grad(lambda a: jnp.sum(per_block(a) ** 2))(x5)
    g_got = jax.grad(
        lambda a: jnp.sum(
            fused_chain_apply(
                rearrange(a, "b t h w c -> (b h w) t c"), params, "THW", heads, dims
            )
            ** 2
        )
    )(x5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-4)


def test_patch_dense_matches_conv(rng):
    """_PatchDense / _PatchDenseTranspose (opt-in space-to-depth conv form)
    are parameter-compatible and numerically equal to the nn.Conv /
    nn.ConvTranspose they replace."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from tante_tpu.ops.convs import _PatchDense, _PatchDenseTranspose

    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype("float32"))
    m = _PatchDense(features=7, patch=(2, 2))
    p = m.init(jax.random.PRNGKey(0), x)
    conv = nn.Conv(7, (2, 2), strides=(2, 2), padding="VALID")
    want = conv.apply({"params": dict(p["params"])}, x)
    np.testing.assert_allclose(
        np.asarray(m.apply(p, x)), np.asarray(want), atol=1e-5, rtol=1e-5
    )

    xz = jnp.asarray(rng.normal(size=(2, 4, 6, 7)).astype("float32"))
    mt = _PatchDenseTranspose(features=5, patch=(2, 2))
    pt = mt.init(jax.random.PRNGKey(1), xz)
    tconv = nn.ConvTranspose(5, (2, 2), strides=(2, 2), padding="VALID")
    want_t = tconv.apply({"params": dict(pt["params"])}, xz)
    np.testing.assert_allclose(
        np.asarray(mt.apply(pt, xz)), np.asarray(want_t), atol=1e-5, rtol=1e-5
    )


def test_canon_t_block_cpu_fallback_and_grads():
    """fused_block_canon_t off-TPU must equal the rearrange + _xla_block
    path bit-for-bit, and its custom VJP must match that path's grads."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from tante_tpu.ops.pallas_block import (
        BlockParams,
        _xla_block,
        canon_t_supported,
        fused_block_canon_t,
    )

    b, t, h, w, c, heads = 2, 4, 4, 8, 32, 4
    rng = np.random.default_rng(3)
    x5 = jnp.asarray(rng.normal(size=(b, t, h, w, c)).astype(np.float32))
    params = BlockParams(
        *[
            jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.05)
            for shape in [
                (c,), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,),
                (c,), (c,), (c, c), (c,), (c, c), (c,),
            ]
        ]
    )

    def ref(a, p):
        y = a.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        y = _xla_block(y, p, t, heads, True)
        return y.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)

    got = fused_block_canon_t(x5, params, heads)
    want = ref(x5, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0, rtol=0)

    g_got = jax.grad(lambda a: jnp.sum(fused_block_canon_t(a, params, heads) ** 2))(x5)
    g_want = jax.grad(lambda a: jnp.sum(ref(a, params) ** 2))(x5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-6, atol=1e-6)

    # Geometry gates: flagship passes, non-128-lane and long-T fail.
    assert canon_t_supported(4, 16, 48, 256, 8)
    assert not canon_t_supported(4, 16, 48, 96, 8)   # c % 128
    assert not canon_t_supported(16, 16, 48, 256, 8)  # t too long


def test_partial_dft_spectral_matches_fft():
    """The partial-DFT fast path (ops/spectral.py:_SPECTRAL_DFT) must equal
    the rfft2 -> truncate -> irfft2 formulation to f32 rounding, across
    even/odd sizes and Nyquist-edge mode counts, for both mode-selection
    variants."""
    import tante_tpu.ops.spectral as sp

    rng = np.random.default_rng(0)

    def check(fn, h, w, m1, m2, wshape):
        x = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
        wt = jnp.asarray(rng.normal(size=wshape).astype(np.float32) * 0.1)
        prev = sp._SPECTRAL_DFT
        try:
            sp._SPECTRAL_DFT = False
            want = fn(x, wt, m1, m2)
            sp._SPECTRAL_DFT = True
            got = fn(x, wt, m1, m2)
        finally:
            sp._SPECTRAL_DFT = prev
        rel = float(jnp.max(jnp.abs(want - got))) / (
            float(jnp.max(jnp.abs(want))) + 1e-9
        )
        assert rel < 2e-5, (fn.__name__, h, w, m1, m2, rel)

    # (8, 16, 4, 9): m2r == wf Nyquist edge; (8, 16, 7, 16): m2 > wf clamp —
    # same edge classes as the original 32x64 cases at 1/8 the compile size.
    for h, w, m1, m2 in [(16, 48, 4, 6), (17, 33, 5, 7), (8, 16, 4, 9)]:
        check(sp.spectral_conv2d, h, w, m1, m2, (5, 7, m1, m2, 2))
    for h, w, m1, m2 in [(16, 48, 5, 6), (17, 33, 7, 8), (8, 16, 7, 16)]:
        check(sp.spectral_conv2d_centered, h, w, m1, m2, (5, 7, m1, m2 // 2 + 1, 2))


def test_afno_filter_dense_dft_matches_rfftn():
    """AFNOFilter's full-mode dense-rDFT2 branch (models/afno.py, round 4)
    must equal the rfftn -> mixer -> irfftn formulation to f32 rounding —
    AFNO keeps every mode, so m1_pos=H/m2r=W//2+1 makes the DFT exact.
    Covers even and odd grid sizes (Hermitian-half doubling edge)."""
    import tante_tpu.ops.spectral as sp
    from tante_tpu.models.afno import AFNOFilter

    rng = np.random.default_rng(1)
    for h, w in [(8, 24), (9, 13)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, 16)).astype(np.float32))
        filt = AFNOFilter(hidden_size=16, num_blocks=4)
        params = filt.init(jax.random.PRNGKey(0), x)
        prev = sp._SPECTRAL_DFT
        try:
            sp._SPECTRAL_DFT = False
            want = filt.apply(params, x)
            sp._SPECTRAL_DFT = True
            got = filt.apply(params, x)
        finally:
            sp._SPECTRAL_DFT = prev
        rel = float(jnp.max(jnp.abs(want - got))) / (
            float(jnp.max(jnp.abs(want))) + 1e-9
        )
        assert rel < 2e-5, (h, w, rel)
