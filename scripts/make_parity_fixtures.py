"""Generate golden numerical-parity fixtures by RUNNING the reference's
torch ops (executed from /root/reference, never copied) on fixed inputs.

Outputs tests/fixtures/parity.npz consumed by tests/test_numerical_parity.py
(VERDICT r1 next-step #7): so that real-data metric differences can later be
attributed to training, not op drift.

Fixtures:
- torch nn.MultiheadAttention forward (the reference TransformerBlock's
  attention core, models/attn_backbone.py:48) with copied weights;
- NewGELU (tanh GELU) values on a fixed grid (attn_backbone.py NewGELU);
- RealConv2d / RealTransConv2d 'same'-arithmetic outputs at overlap 0 and
  0.25 with deterministic weights (models/enc_dec_cnn.py:49-184);
- reference complex spectral weight init sample moments
  (models/enc_dec_fno.py SpectralLayer weight scale).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "fixtures", "parity.npz")


def _stub_thirdparty():
    import types

    import torch.nn as nn

    torchinfo = types.ModuleType("torchinfo")
    torchinfo.summary = lambda *a, **k: None
    sys.modules.setdefault("torchinfo", torchinfo)

    class _DropPath(nn.Identity):
        def __init__(self, *a, **k):
            super().__init__()

    import importlib.machinery

    for name in ("timm", "timm.layers", "timm.models", "timm.models.layers"):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        mod.DropPath = _DropPath
        mod.trunc_normal_ = lambda t, *a, **k: t
        sys.modules.setdefault(name, mod)
    neuralop = types.ModuleType("neuralop")
    neuralop_models = types.ModuleType("neuralop.models")
    neuralop_models.FNO = type("FNO", (nn.Module,), {})
    neuralop_models.TFNO = type("TFNO", (nn.Module,), {})
    neuralop.models = neuralop_models
    sys.modules.setdefault("neuralop", neuralop)
    sys.modules.setdefault("neuralop.models", neuralop_models)


def main():
    sys.path.insert(0, REFERENCE)
    _stub_thirdparty()
    torch.manual_seed(0)
    out = {}
    rng = np.random.default_rng(0)

    # ---- torch MultiheadAttention ---------------------------------------
    c, heads, l, b = 16, 4, 5, 2
    mha = torch.nn.MultiheadAttention(c, heads, dropout=0.0, batch_first=True)
    with torch.no_grad():
        in_proj = torch.tensor(
            rng.normal(size=(3 * c, c)).astype(np.float32) * 0.2
        )
        out_proj = torch.tensor(rng.normal(size=(c, c)).astype(np.float32) * 0.2)
        mha.in_proj_weight.copy_(in_proj)
        mha.in_proj_bias.copy_(torch.tensor(rng.normal(size=(3 * c,)).astype(np.float32) * 0.1))
        mha.out_proj.weight.copy_(out_proj)
        mha.out_proj.bias.copy_(torch.tensor(rng.normal(size=(c,)).astype(np.float32) * 0.1))
    x = torch.tensor(rng.normal(size=(b, l, c)).astype(np.float32))
    with torch.no_grad():
        y, _ = mha(x, x, x, need_weights=False)
        # causal variant
        causal_mask = torch.triu(torch.ones(l, l, dtype=torch.bool), diagonal=1)
        y_causal, _ = mha(x, x, x, attn_mask=causal_mask, need_weights=False)
    out["mha_x"] = x.numpy()
    out["mha_in_proj_w"] = mha.in_proj_weight.detach().numpy()
    out["mha_in_proj_b"] = mha.in_proj_bias.detach().numpy()
    out["mha_out_w"] = mha.out_proj.weight.detach().numpy()
    out["mha_out_b"] = mha.out_proj.bias.detach().numpy()
    out["mha_y"] = y.numpy()
    out["mha_y_causal"] = y_causal.numpy()

    # ---- NewGELU grid ----------------------------------------------------
    g = torch.nn.GELU(approximate="tanh")  # reference attn_backbone.py:54
    xs = torch.linspace(-6, 6, 121)
    with torch.no_grad():
        out["newgelu_x"] = xs.numpy()
        out["newgelu_y"] = g(xs).numpy()

    # ---- RealConv2d / RealTransConv2d -----------------------------------
    from models.enc_dec_cnn import RealConv2d, RealTransConv2d

    cin, cout, hh, ww, p = 3, 5, 16, 24, 4
    xc = torch.tensor(rng.normal(size=(2, cin, hh, ww)).astype(np.float32))
    for tag, overlap in (("o0", 0.0), ("o25", 0.25)):
        conv = RealConv2d(cin, cout, patch_size=p, overlap_ratio=overlap)
        with torch.no_grad():
            wgt = torch.tensor(rng.normal(size=(cout, cin, p, p)).astype(np.float32) * 0.1)
            bias = torch.tensor(rng.normal(size=(cout,)).astype(np.float32) * 0.1)
            conv.conv.weight.copy_(wgt)
            conv.conv.bias.copy_(bias)
            yc = conv(xc)
        out[f"conv_{tag}_w"] = wgt.numpy()
        out[f"conv_{tag}_b"] = bias.numpy()
        out[f"conv_{tag}_y"] = yc.numpy()

        tconv = RealTransConv2d(cin, cout, patch_size=p, overlap_ratio=overlap)
        xt = torch.tensor(rng.normal(size=(2, cin, hh // p, ww // p)).astype(np.float32))
        with torch.no_grad():
            wgt_t = torch.tensor(rng.normal(size=(cin, cout, p, p)).astype(np.float32) * 0.1)
            bias_t = torch.tensor(rng.normal(size=(cout,)).astype(np.float32) * 0.1)
            tconv.deconv.weight.copy_(wgt_t)
            tconv.deconv.bias.copy_(bias_t)
            yt = tconv(xt)
        out[f"tconv_{tag}_x"] = xt.numpy()
        out[f"tconv_{tag}_w"] = wgt_t.numpy()
        out[f"tconv_{tag}_b"] = bias_t.numpy()
        out[f"tconv_{tag}_y"] = yt.numpy()
    out["conv_x"] = xc.numpy()

    # ---- spectral complex-weight init moments ----------------------------
    from models.enc_dec_fno import SpectralLayer

    torch.manual_seed(7)
    sl = SpectralLayer(8, 16, 6, 6)
    wr = sl.weight.detach()
    out["spec_w_shape"] = np.asarray(wr.shape)
    out["spec_w_abs_mean"] = np.asarray(wr.abs().mean().item())
    out["spec_w_abs_max"] = np.asarray(wr.abs().max().item())
    out["spec_w_is_complex"] = np.asarray(1 if wr.is_complex() else 0)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {sorted(out)}")


if __name__ == "__main__":
    main()
