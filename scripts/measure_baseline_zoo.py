"""Per-family A100 eager-PyTorch upper bounds for the model zoo
(VERDICT r3 item #2).

Extends ``scripts/measure_baseline.py``'s methodology to every model family
the reference trains (``/root/reference/models/*.py``): for each family,
the *reference* model is built at the SAME hyperparameters our
``scripts/zoo_bench.py`` row uses (``configs/<name>.yaml`` — identical to
the reference's shipped YAML except DPOT, where both repos bench the
S-size) and RUN on the host CPU to measure

1. exact forward FLOPs per call at batch 1 (``FlopCounterMode``; FFT ops
   are not in torch's flop table, so rfft/irfft family ops get a standard
   5·N·log2(N) complex-FFT flop count registered — see ``_fft_flops``),
2. the aten leaf-op count per call (kernel-launch proxy),
3. frames emitted per call (from the actual output shape).

The derived bound per family is measure_baseline.py's rule, unchanged:

    fps_A100 = B * frames_per_call / max(B*flops/(peak*25% MFU), ops*4us)

— a deliberately baseline-favorable UPPER Bound (free memory bandwidth,
generous MFU, CUDA-graphs-like 4us launches).

FNO/TFNO caveat: the reference wraps third-party ``neuralop`` models
(``/root/reference/models/fno.py:4``) and neuralop is not installed in
this image, so for those two families the script builds a faithful torch
replica of the neuralop-0.3 FNO forward (lifting MLP -> n_layers x
[spectral conv + soft-gating skip + channel MLP] -> projection MLP,
matching the layer inventory our JAX port mirrors) and measures THAT.
Flop counts are architecture-determined so this is exact for (1); the
op-count proxy (2) is a mild *under*count of neuralop's real op stream
(extra glue ops) — which only matters if the launch floor binds, and the
output records which bound was active per family.

Usage: python scripts/measure_baseline_zoo.py [family ...]
Writes ``published.a100_zoo`` into BASELINE.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import types

import torch
import torch.nn as nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

BATCH = 8
RESOLUTION = (128, 384)
N_FIELDS = 4
IN_T = 4

A100_BF16_PEAK = 312e12
GENEROUS_A100_MFU = 0.25
LAUNCH_OVERHEAD_S = 4e-6


class _Meta:
    """Minimal stand-in for TanteMetadata (reference models read 3 attrs)."""

    n_fields = N_FIELDS
    spatial_resolution = RESOLUTION
    n_spatial_dims = 2


def _install_stubs():
    sys.path.insert(0, REFERENCE)

    torchinfo = types.ModuleType("torchinfo")
    torchinfo.summary = lambda *a, **k: None
    sys.modules.setdefault("torchinfo", torchinfo)

    class _DropPath(nn.Identity):
        def __init__(self, *a, **k):
            super().__init__()

    def _trunc_normal_(t, *a, **k):
        return t

    timm = types.ModuleType("timm")
    timm_layers = types.ModuleType("timm.layers")
    timm_models = types.ModuleType("timm.models")
    timm_models_layers = types.ModuleType("timm.models.layers")
    for mod in (timm_layers, timm_models_layers):
        mod.DropPath = _DropPath
        mod.trunc_normal_ = _trunc_normal_
    timm.layers = timm_layers
    timm.models = timm_models
    timm_models.layers = timm_models_layers
    import importlib.machinery

    for name, mod in (
        ("timm", timm),
        ("timm.layers", timm_layers),
        ("timm.models", timm_models),
        ("timm.models.layers", timm_models_layers),
    ):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules.setdefault(name, mod)

    neuralop = types.ModuleType("neuralop")
    neuralop_models = types.ModuleType("neuralop.models")
    neuralop_models.FNO = type("FNO", (nn.Module,), {})
    neuralop_models.TFNO = type("TFNO", (nn.Module,), {})
    neuralop.models = neuralop_models
    sys.modules.setdefault("neuralop", neuralop)
    sys.modules.setdefault("neuralop.models", neuralop_models)


# ---------------------------------------------------------------------------
# neuralop FNO/TFNO torch replica (neuralop is not installed — see module
# docstring).  Architecture per neuralop 0.3.x FNO: lifting (1x1 conv
# C_in->2w->w), n_layers x [SpectralConv (full or Tucker-factorized complex
# weight over kept modes) + soft-gating skip + per-layer channel MLP with
# its own skip], projection (1x1 conv w->2w->C_out).  Our JAX port
# (tante_tpu/models/fno.py) mirrors this inventory; param counts match the
# published table's 4M.
# ---------------------------------------------------------------------------


class _SpectralConv2d(nn.Module):
    def __init__(self, c, modes1, modes2, factorized=False, rank=0.05):
        super().__init__()
        self.c, self.m1, self.m2 = c, modes1, modes2
        self.factorized = factorized
        if factorized:
            # Tucker factorization of the (c, c, 2*m1, m2) complex weight at
            # neuralop's default rank=0.05: core G (r,r,r,r) + 4 factors.
            r = max(2, int(round(rank * c)))
            self.core = nn.Parameter(torch.randn(r, r, r, r, dtype=torch.cfloat))
            self.f_ci = nn.Parameter(torch.randn(c, r, dtype=torch.cfloat))
            self.f_co = nn.Parameter(torch.randn(c, r, dtype=torch.cfloat))
            self.f_m1 = nn.Parameter(torch.randn(2 * modes1, r, dtype=torch.cfloat))
            self.f_m2 = nn.Parameter(torch.randn(modes2, r, dtype=torch.cfloat))
        else:
            self.w = nn.Parameter(
                torch.randn(c, c, 2 * modes1, modes2, dtype=torch.cfloat) / c
            )

    def forward(self, x):
        b, c, h, w = x.shape
        xf = torch.fft.rfft2(x, norm="ortho")
        if self.factorized:
            # Chain of 2-operand contractions (each one batched GEMM on
            # CUDA; the 5-operand form would fall back to torch's CPU
            # strided loops and poison the op count).
            wgt = torch.einsum("ijkl,ai->jkla", self.core, self.f_ci)
            wgt = torch.einsum("jkla,bj->klab", wgt, self.f_co)
            wgt = torch.einsum("klab,ck->labc", wgt, self.f_m1)
            wgt = torch.einsum("labc,dl->abcd", wgt, self.f_m2)
        else:
            wgt = self.w
        out = torch.zeros(b, c, h, w // 2 + 1, dtype=torch.cfloat)
        corner = torch.cat([xf[:, :, : self.m1, : self.m2], xf[:, :, -self.m1 :, : self.m2]], dim=2)
        mixed = torch.einsum("bikl,iokl->bokl", corner, wgt)
        out[:, :, : self.m1, : self.m2] = mixed[:, :, : self.m1]
        out[:, :, -self.m1 :, : self.m2] = mixed[:, :, self.m1 :]
        return torch.fft.irfft2(out, s=(h, w), norm="ortho")


class _NeuralopFNOReplica(nn.Module):
    def __init__(self, in_c, out_c, width=48, modes=20, n_layers=4, factorized=False):
        super().__init__()
        self.lift = nn.Sequential(nn.Conv2d(in_c, 2 * width, 1), nn.GELU(), nn.Conv2d(2 * width, width, 1))
        self.spectral = nn.ModuleList(
            [_SpectralConv2d(width, modes, modes, factorized) for _ in range(n_layers)]
        )
        # neuralop soft-gating skip: per-channel scale+bias
        self.gates_w = nn.ParameterList([nn.Parameter(torch.ones(1, width, 1, 1)) for _ in range(n_layers)])
        self.gates_b = nn.ParameterList([nn.Parameter(torch.zeros(1, width, 1, 1)) for _ in range(n_layers)])
        self.ch_mlp = nn.ModuleList(
            [
                nn.Sequential(nn.Conv2d(width, width // 2, 1), nn.GELU(), nn.Conv2d(width // 2, width, 1))
                for _ in range(n_layers)
            ]
        )
        self.proj = nn.Sequential(nn.Conv2d(width, 2 * width, 1), nn.GELU(), nn.Conv2d(2 * width, out_c, 1))

    def forward(self, x):
        # zoo contract: (B, T, C, H, W) -> fold T into channels (reference
        # models/fno.py:102-106), emit 1 frame
        b, t, c, h, w = x.shape
        x = x.reshape(b, t * c, h, w)
        x = self.lift(x)
        for spec, gw, gb, mlp in zip(self.spectral, self.gates_w, self.gates_b, self.ch_mlp):
            y = spec(x) + x * gw + gb
            y = torch.nn.functional.gelu(y)
            x = mlp(y) + y
        x = self.proj(x)
        return x.reshape(b, 1, c, h, w)


# ---------------------------------------------------------------------------


def _fft_flops(shape_in, dims) -> float:
    """Standard complex-FFT flop count: 5 * N * log2(N_fft) where the log
    runs over the transformed dims only (real transforms ~half of complex —
    granting the full-complex count FAVORS nothing; we use half for r2c/c2r
    to stay at the textbook figure)."""
    n_total = 1
    for s in shape_in:
        n_total *= s
    n_fft = 1
    for d in dims:
        n_fft *= shape_in[d]
    return 5.0 * n_total * math.log2(max(n_fft, 2))


def count_flops(model, args) -> float:
    from torch.utils.flop_counter import FlopCounterMode

    def fft_handler(*fargs, **kw):
        # flop_counter custom mapping: (args..., out_shape) -> flops
        return 0

    counter = FlopCounterMode(display=False)
    fft_extra = [0.0]

    # FFT ops aren't in the flop table; intercept via TorchDispatchMode is
    # already what FlopCounterMode does — simplest robust route: hook the
    # functional entry points.
    orig = {}
    import torch.fft as tfft

    def wrap(name, dims_of):
        fn = getattr(tfft, name)
        orig[name] = fn

        def wrapped(x, *a, **kw):
            dims = dims_of(x, a, kw)
            fft_extra[0] += 0.5 * _fft_flops(tuple(x.shape), dims)  # r2c/c2r half
            return fn(x, *a, **kw)

        setattr(tfft, name, wrapped)

    def dims2(x, a, kw):
        return kw.get("dim", (-2, -1))

    def dimsn(x, a, kw):
        d = kw.get("dim", None)
        return d if d is not None else tuple(range(x.ndim))

    def dims1(x, a, kw):
        d = kw.get("dim", -1)
        return (d,)

    for name, dof in (
        ("rfft2", dims2),
        ("irfft2", dims2),
        ("rfftn", dimsn),
        ("irfftn", dimsn),
        ("rfft", dims1),
        ("irfft", dims1),
        ("fft", dims1),
        ("ifft", dims1),
        ("fft2", dims2),
        ("ifft2", dims2),
    ):
        if hasattr(tfft, name):
            wrap(name, dof)
    try:
        with counter, torch.no_grad(), _EinsumBmmPatch():
            model(*args)
    finally:
        for name, fn in orig.items():
            setattr(tfft, name, fn)
    return float(counter.get_total_flops()) + fft_extra[0]


def _einsum_as_bmm(eq: str, a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    """2-operand einsum via permute+reshape+bmm — the kernel stream a CUDA
    eager run actually executes (cuBLAS batched GEMM, complex supported
    natively).  torch's CPU einsum on complex operands instead walks strided
    sub-tensors with thousands of as_strided/resolve_conj/copy_ calls, which
    would poison the kernel-launch count.  Numerically identical."""
    ins, out = eq.replace(" ", "").split("->")
    ia, ib = ins.split(",")
    batch = [c for c in ia if c in ib and c in out]
    contract = [c for c in ia if c in ib and c not in out]
    free_a = [c for c in ia if c not in ib]
    free_b = [c for c in ib if c not in ia]
    pa = a.permute([ia.index(c) for c in batch + free_a + contract])
    pb = b.permute([ib.index(c) for c in batch + contract + free_b])
    dims = {c: a.shape[ia.index(c)] for c in ia}
    dims.update({c: b.shape[ib.index(c)] for c in ib})
    import math as _m

    nb = _m.prod([dims[c] for c in batch]) if batch else 1
    fa = _m.prod([dims[c] for c in free_a]) if free_a else 1
    fb = _m.prod([dims[c] for c in free_b]) if free_b else 1
    k = _m.prod([dims[c] for c in contract]) if contract else 1
    pa3 = pa.reshape(nb, fa, k)
    pb3 = pb.reshape(nb, k, fb)
    if pa3.is_complex() or pb3.is_complex():
        # torch's CPU complex bmm loops per batch element (1759 as_strided
        # for ONE spectral conv) while CUDA runs a single batched cgemm; a
        # 4-real-bmm expansion keeps the op count CUDA-representative.
        ar, ai = (pa3.real, pa3.imag) if pa3.is_complex() else (pa3, torch.zeros_like(pa3))
        br, bi = (pb3.real, pb3.imag) if pb3.is_complex() else (pb3, torch.zeros_like(pb3))
        ar, ai, br, bi = (t.contiguous() for t in (ar, ai, br, bi))
        r = torch.complex(
            torch.bmm(ar, br) - torch.bmm(ai, bi),
            torch.bmm(ar, bi) + torch.bmm(ai, br),
        )
    else:
        r = torch.bmm(pa3, pb3)
    r = r.reshape([dims[c] for c in batch + free_a + free_b])
    cur = batch + free_a + free_b
    return r.permute([cur.index(c) for c in out])


class _EinsumBmmPatch:
    def __enter__(self):
        self._orig = torch.einsum
        self._fn = torch.functional.einsum

        def patched(eq, *ops):
            if (
                isinstance(eq, str)
                and len(ops) == 2
                and "." not in eq
                and "->" in eq
                and all(isinstance(o, torch.Tensor) for o in ops)
            ):
                try:
                    return _einsum_as_bmm(eq, ops[0], ops[1])
                except Exception:
                    return self._orig(eq, *ops)
            return self._orig(eq, *ops)

        torch.einsum = patched
        torch.functional.einsum = patched
        return self

    def __exit__(self, *a):
        torch.einsum = self._orig
        torch.functional.einsum = self._fn


def count_ops(model, args) -> int:
    """Eager-dispatch proxy (the rule of scripts/measure_baseline.py,
    unchanged: aten leaf ops, each granted a 4us dispatch floor — every
    dispatched op pays the eager dispatcher, metadata ops included), with
    ONE correction: 2-operand einsums are lowered to the permute+bmm form a
    CUDA eager stream actually runs.  torch's CPU einsum on complex
    operands walks strided sub-tensors instead (UNO: 32650 raw leaf ops of
    which ~28k are as_strided/resolve_conj/copy_ loop artifacts that a
    cuBLAS batched-complex GEMM never dispatches) — a CPU implementation
    detail that would DEFLATE the baseline bound ~7x."""
    from torch.profiler import ProfilerActivity, profile

    with torch.no_grad(), _EinsumBmmPatch():
        model(*args)
        with profile(activities=[ProfilerActivity.CPU]) as prof:
            model(*args)
    events = [e for e in prof.events() if e.name.startswith("aten::")]
    leaves = [
        e
        for e in events
        if not any(c.name.startswith("aten::") for c in e.cpu_children)
    ]
    return len(leaves)


def build(name: str):
    """Returns (model, example_args, frames_per_call)."""
    md = _Meta()
    x = torch.randn(1, IN_T, N_FIELDS, *RESOLUTION)
    if name == "fno":
        m = _NeuralopFNOReplica(IN_T * N_FIELDS, N_FIELDS, width=48, modes=20)
        return m, (x,), 1
    if name == "tfno":
        m = _NeuralopFNOReplica(IN_T * N_FIELDS, N_FIELDS, width=48, modes=20, factorized=True)
        return m, (x,), 1
    if name == "afno":
        from models.afno import AFNO

        m = AFNO(in_T=IN_T, dset_metadata=md, hidden_dim=256, n_blocks=8)
        return m, (x,), None
    if name == "uno":
        from models.uno import UNO

        m = UNO(in_T=IN_T, dset_metadata=md, width=38, pad=0, factor=1)
        return m, (x,), None
    if name == "dpot":
        from models.dpot import DPOT

        m = DPOT(
            in_T=IN_T,
            dset_metadata=md,
            out_timesteps=1,
            depth=6,
            embed_dim=512,
            mlp_ratio=4.0,
            out_layer_dim=8,
            patch_size=32,
            mixing_type="afno",
            modes=16,
            n_cls=16,
            act="gelu",
            time_agg="exp_mlp",
        )
        return m, (x,), None
    if name == "avit":
        from models.avit import AViT

        m = AViT(
            in_T=IN_T,
            dset_metadata=md,
            out_steps=1,
            patch_size=[16, 16],
            processor_blocks=12,
            embed_dim=384,
            num_heads=6,
        )
        return m, (x,), None
    if name == "cvit":
        from models.cvit import CViT, generate_coords

        m = CViT(
            in_T=IN_T,
            dset_metadata=md,
            out_steps=4,
            embedding_type="grid",
            grid_size=[128, 128],
            latent_dim=512,
            emb_dim=512,
            depth=10,
            num_heads=8,
            dec_emb_dim=512,
            dec_num_heads=8,
            dec_depth=1,
            num_mlp_layers=1,
            mlp_ratio=1,
        )
        # The bound models a full-grid decode in ONE call (favors the
        # baseline: the reference evaler actually chunks into
        # num_query_points-sized calls, trainer/evaler.py:147-155, paying
        # the encoder once per chunk).  The full 49152-query RBF embedding
        # is intractable on this 1-CPU host, so main() measures at two
        # query counts and extrapolates the affine flops(M); the op count
        # is M-independent.
        def coords_of(m_q):
            g = torch.rand(m_q, 2)
            return g

        return m, (x, coords_of(1024)), 4, coords_of
    if name == "unet_convnext":
        from models.unet_convnext import UNetConvNext

        m = UNetConvNext(in_T=IN_T, dset_metadata=md, blocks_per_stage=4, init_features=15)
        return m, (x,), None
    if name == "unet_att":
        from models.unet_att import AttentionUNet

        m = AttentionUNet(in_T=IN_T, dset_metadata=md, depth=5, out_T=1)
        return m, (x,), None
    if name == "tante":
        from models.tante import TANTE

        m = TANTE(
            in_T=IN_T,
            dset_metadata=md,
            taylor_order=1,
            output_length=1,
            attn_axes="THWTHWTHW",
            n_head=8,
            mlp_ratio=1.0,
            enc_dec_type="cnn",
            embed_dim=256,
            patch_scale=8,
            deg=True,
        )
        return m, (x,), None
    raise ValueError(name)


FAMILIES = [
    "tante",
    "fno",
    "tfno",
    "afno",
    "uno",
    "dpot",
    "avit",
    "cvit",
    "unet_convnext",
    "unet_att",
]


def main():
    _install_stubs()
    names = sys.argv[1:] or FAMILIES
    out = {}
    for name in names:
        t0 = time.time()
        try:
            built = build(name)
            model, args, frames = built[:3]
            model.eval()
            # FlopCounterMode's ModuleTracker registers grad hooks that
            # assert on requires_grad tensors without grad_fn (e.g. a
            # Parameter.expand under no_grad — CViT's Perceiver latents);
            # inference-only counting needs no autograd at all.
            model.requires_grad_(False)
            n_params = sum(p.numel() for p in model.parameters())
            with torch.no_grad():
                y = model(*args)
            if frames is None:
                frames = int(y.shape[1])
            if len(built) == 4:  # cvit: affine flops(M) -> full-grid extrapolation
                coords_of = built[3]
                x0 = args[0]
                f1 = count_flops(model, (x0, coords_of(1024)))
                f2 = count_flops(model, (x0, coords_of(2048)))
                full_m = RESOLUTION[0] * RESOLUTION[1]
                flops_b1 = f1 + (f2 - f1) / 1024.0 * (full_m - 1024)
            else:
                flops_b1 = count_flops(model, args)
            ops = count_ops(model, args)
            flop_time = (BATCH * flops_b1) / (A100_BF16_PEAK * GENEROUS_A100_MFU)
            launch_floor = ops * LAUNCH_OVERHEAD_S
            fps = BATCH * frames / max(flop_time, launch_floor)
            row = {
                "fps_a100_bound": round(fps, 1),
                "frames_per_call": frames,
                "flops_per_call_b1": flops_b1,
                "aten_leaf_ops_per_call": ops,
                "binding": "flops" if flop_time >= launch_floor else "launch",
                "n_params": n_params,
                "note": (
                    "neuralop replica (neuralop not installed; see script docstring)"
                    if name in ("fno", "tfno")
                    else "reference model executed"
                ),
            }
            out[name] = row
            print(json.dumps({"model": name, **row, "wall_s": round(time.time() - t0, 1)}), flush=True)
        except Exception as e:
            import traceback

            traceback.print_exc()
            out[name] = {"error": str(e)[:300]}
            print(json.dumps({"model": name, "error": str(e)[:200]}), flush=True)

    baseline_path = os.path.join(REPO, "BASELINE.json")
    with open(baseline_path) as f:
        baseline = json.load(f)
    zoo = baseline.setdefault("published", {}).setdefault("a100_zoo", {})
    zoo.update(out)
    zoo["rule"] = (
        "per family: B*frames_per_call / max(B*flops/(A100bf16peak*0.25MFU), "
        "aten_ops*4us) — baseline-favorable upper bound, methodology of "
        "scripts/measure_baseline.py; protocol B8 128x384x4, shipped config "
        "sizes (configs/<name>.yaml)"
    )
    with open(baseline_path, "w") as f:
        json.dump(baseline, f, indent=2)
    print(f"wrote published.a100_zoo to {baseline_path}")


if __name__ == "__main__":
    main()
