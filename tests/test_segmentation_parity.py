"""Numerical parity of the flax range segmentator vs a torch reference.

Parity target: the reference runs its RangeNet++ darknet in torch
(frontend/scan2shape/script/*/segmentator.py, backbone/darknet.py) with
pretrained pickled weights (load_model.py:6-20). The flax net
(frontend/segmentation.py) must reproduce torch numerics when weights are
round-tripped through torch_convert.py — otherwise converted production
weights would silently change the segmentation (VERDICT r1 missing #3).

The torch mirror below re-implements the EXACT flax architecture op by op
(SAME padding incl. XLA's asymmetric stride-2 split, BN eval stats, leaky
0.1, width-only nearest x2 upsample, additive skips, biased 1x1 head),
with submodule registration ordered to match the converter's flax-tree
walk. Random weights, fixed input, logits compared at float32.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slide_slam_tpu.frontend import segmentation as seg  # noqa: E402
from slide_slam_tpu.frontend.torch_convert import (  # noqa: E402
    load_head_conv, load_torch_weights_into_flax)

STAGE_BLOCKS = (1, 1, 2, 2)
NUM_CLASSES = 4


class TCBL(torch.nn.Module):
    """ConvBNLeaky: conv(no bias) -> BN(eval) -> leaky(0.1), SAME padding.

    XLA SAME with stride 2 over even W pads (left=0, right=1); stride-1
    k=3 pads symmetrically."""

    def __init__(self, cin, cout, k, stride_w=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, stride=(1, stride_w),
                                    padding=0, bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)
        self.k, self.stride_w = k, stride_w

    def forward(self, x):
        if self.k == 3:
            # F.pad order: (w_left, w_right, h_top, h_bottom)
            x = F.pad(x, (0, 1, 1, 1) if self.stride_w == 2
                      else (1, 1, 1, 1))
        return F.leaky_relu(self.bn(self.conv(x)), 0.1)


class TRes(torch.nn.Module):
    def __init__(self, feats):
        super().__init__()
        self.c1 = TCBL(feats, feats // 2, 1)
        self.c2 = TCBL(feats // 2, feats, 3)

    def forward(self, x):
        return x + self.c2(self.c1(x))


class TorchSegmentator(torch.nn.Module):
    """Registration order matches torch_convert's flax walk: encoder
    ConvBNLeaky_0..N, encoder ResidualBlock_0..M, decoder ConvBNLeaky_0..K,
    head last."""

    def __init__(self, stage_blocks=STAGE_BLOCKS, base=64,
                 num_classes=NUM_CLASSES):
        super().__init__()
        cbls = [TCBL(5, 32, 3)]
        res = []
        cin, feats = 32, base
        self.stage_blocks = stage_blocks
        for blocks in stage_blocks:
            cbls.append(TCBL(cin, feats, 3, stride_w=2))
            for _ in range(blocks):
                res.append(TRes(feats))
            cin, feats = feats, min(feats * 2, 1024)
        self.enc_cbls = torch.nn.ModuleList(cbls)
        self.enc_res = torch.nn.ModuleList(res)
        dec = []
        c = cin
        for _ in stage_blocks:
            f = max(c // 2, 32)
            dec.append(TCBL(c, f, 3))
            c = f
        self.dec = torch.nn.ModuleList(dec)
        self.head = torch.nn.Conv2d(c, num_classes, 1, bias=True)

    def forward(self, x):
        skips = []
        x = self.enc_cbls[0](x)
        ri = 0
        for si, blocks in enumerate(self.stage_blocks):
            skips.append(x)
            x = self.enc_cbls[si + 1](x)
            for _ in range(blocks):
                x = self.enc_res[ri](x)
                ri += 1
        for j, skip in enumerate(reversed(skips)):
            x = x.repeat_interleave(2, dim=3)[:, :, :, :skip.shape[3]]
            x = self.dec[j](x)
            x = x + skip
        return self.head(x)


def _randomize(model, gen):
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gen) + 0.5)


def test_flax_matches_torch_logits():
    gen = torch.Generator().manual_seed(0)
    tmodel = TorchSegmentator().eval()
    _randomize(tmodel, gen)

    # float32 flax twin of the same architecture (bfloat16 is the TPU
    # production dtype; parity is proven at f32 where both sides are exact)
    fmodel = seg.RangeSegmentator(num_classes=NUM_CLASSES,
                                  stage_blocks=STAGE_BLOCKS,
                                  dtype=jnp.float32)
    variables = seg.init_params(fmodel, jax.random.PRNGKey(0),
                                height=8, width=64)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables, n_loaded = load_torch_weights_into_flax(variables, sd)
    assert n_loaded == 21, n_loaded     # 5 enc CBL + 12 res CBL + 4 dec CBL
    variables = load_head_conv(variables, sd["head.weight"], sd["head.bias"])

    x = np.random.default_rng(1).normal(0, 1, (1, 8, 64, 5)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    t_logits = t_logits.permute(0, 2, 3, 1).numpy()

    f_logits = np.asarray(fmodel.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x),
        train=False))
    assert f_logits.shape == t_logits.shape
    np.testing.assert_allclose(f_logits, t_logits, atol=2e-4, rtol=1e-3)
    # and the downstream label map is identical
    np.testing.assert_array_equal(f_logits.argmax(-1), t_logits.argmax(-1))


def test_crf_learned_compat_conversion():
    """A *learned* (non-Potts) compat 1x1 conv pulled from a torch
    state_dict through load_crf_compat must reproduce torch's conv exactly
    when applied as `msg @ compat + bias` (CRF.py:98-119; VERDICT r2 #8)."""
    import torch

    from slide_slam_tpu.frontend.torch_convert import load_crf_compat

    C, H, W = 6, 8, 12
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(C, C, 1)
    sd = {f"CRF.compat_conv.{k}": v.detach().numpy()
          for k, v in conv.state_dict().items()}
    compat, bias = load_crf_compat(sd)
    assert compat.shape == (C, C) and bias.shape == (C,)

    msg = torch.randn(1, C, H, W)
    want = conv(msg).detach().numpy()[0].transpose(1, 2, 0)     # [H, W, C]
    got = np.asarray(msg.numpy()[0].transpose(1, 2, 0) @ compat + bias)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # and the full refinement head accepts it (shape/finite sanity)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(0, 1, (1, H, W, 3)).astype(np.float32))
    sm = jax.nn.softmax(jnp.asarray(
        rng.normal(0, 1, (1, H, W, C)).astype(np.float32)), axis=-1)
    mask = jnp.ones((1, H, W), bool)
    out = seg.crf_refine(xyz, sm, mask, iters=2, compat=jnp.asarray(compat),
                         compat_bias=jnp.asarray(bias))
    assert out.shape == (1, H, W, C)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
