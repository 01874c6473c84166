"""Range-image semantic segmentation network (RangeNet++-style) in flax.

TPU-native replacement for the reference's torch darknet Segmentator
(frontend/scan2shape/script/*/segmentator.py, backbone/darknet.py,
decoder/darknet.py): a darknet53-style encoder that strides only along the
width axis (the lidar-bonnetal convention for range images), a mirrored
upsampling decoder with skip connections, and a 1x1 classification head.
Runs in bfloat16 on the MXU; weights are either trained elsewhere and
converted, or random for pipeline testing (the reference likewise loads
pickled pretrained weights, load_model.py:6-20).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBNLeaky(nn.Module):
    features: int
    kernel: int = 3
    stride_w: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(1, self.stride_w), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         dtype=jnp.float32)(x)
        return nn.leaky_relu(x, 0.1)


class ResidualBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBNLeaky(self.features // 2, kernel=1, dtype=self.dtype)(x, train)
        h = ConvBNLeaky(self.features, kernel=3, dtype=self.dtype)(h, train)
        return x + h


class DarknetEncoder(nn.Module):
    """Darknet-53-ish: stage widths 64..1024, width-only strides (OS=32 on W)."""
    stage_blocks: Sequence[int] = (1, 2, 8, 8, 4)
    base: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        x = ConvBNLeaky(32, kernel=3, dtype=self.dtype)(x, train)
        feats = self.base
        for blocks in self.stage_blocks:
            skips.append(x)
            x = ConvBNLeaky(feats, kernel=3, stride_w=2, dtype=self.dtype)(x, train)
            for _ in range(blocks):
                x = ResidualBlock(feats, dtype=self.dtype)(x, train)
            feats = min(feats * 2, 1024)
        return x, skips


class Decoder(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        for skip in reversed(skips):
            target_w = skip.shape[2]
            b, h, w, c = x.shape
            # width-only nearest upsample x2
            x = jnp.repeat(x, 2, axis=2)[:, :, :target_w, :]
            feats = max(c // 2, 32)
            x = ConvBNLeaky(feats, kernel=3, dtype=self.dtype)(x, train)
            if skip.shape[-1] == x.shape[-1]:
                x = x + skip
            else:
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
                x = ConvBNLeaky(feats, kernel=1, dtype=self.dtype)(x, train)
        return x


class RangeSegmentator(nn.Module):
    """5-channel range image [B, H, W, 5] -> per-pixel class logits."""
    num_classes: int = 20
    stage_blocks: Sequence[int] = (1, 2, 8, 8, 4)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        h, skips = DarknetEncoder(self.stage_blocks, dtype=self.dtype)(x, train)
        d = Decoder(dtype=self.dtype)(h, skips, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(d)
        return logits


def small_segmentator(num_classes: int = 16) -> RangeSegmentator:
    """Lightweight variant for tests / realtime CPU fallback."""
    return RangeSegmentator(num_classes=num_classes, stage_blocks=(1, 1, 2, 2))


def init_params(model: RangeSegmentator, rng, height=64, width=1024):
    x = jnp.zeros((1, height, width, 5), jnp.float32)
    return model.init(rng, x, train=False)


def segment(model: RangeSegmentator, variables, range_input: jnp.ndarray):
    """range_input [B, H, W, 5] -> labels [B, H, W] int32 (argmax, like
    infer_node.py:231-236)."""
    logits = model.apply(variables, range_input, train=False)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# CRF post-processing head (scan2shape/script/CRF.py)
# ---------------------------------------------------------------------------

def crf_refine(xyz: jnp.ndarray, softmax: jnp.ndarray, mask: jnp.ndarray,
               iters: int = 3, window=(3, 5), xyz_sigma: float = 0.7,
               xyz_coef: float = -0.1,
               compat: jnp.ndarray = None,
               compat_bias: jnp.ndarray = None) -> jnp.ndarray:
    """Mean-field CRF refinement of per-pixel class probabilities on the
    range image (the RangeNet++ optional post head, CRF.py:10-127):
    per iteration, each pixel gathers its window's class probabilities
    weighted by a Gaussian of 3D distance (LocallyConnectedXYZLayer), the
    message is mixed through a class-compatibility matrix
    (ones - identity, scaled by xyz_coef — the compat 1x1 conv init,
    CRF.py:94-101; the conv is *learned* in the reference, and smoothing
    requires the Potts-penalty sign, so xyz_coef defaults negative here),
    added to the current softmax, and renormalized.

    The torch original im2cols per class; here the window is a stack of
    `h*w` rolled copies, so the whole head is a fused elementwise/reduce
    graph — no gathers, XLA-friendly.

    xyz [B,H,W,3] (invalid pixels arbitrary), softmax [B,H,W,C],
    mask [B,H,W] valid pixels."""
    B, H, W, C = softmax.shape
    wh, ww = window
    assert wh % 2 == 1 and ww % 2 == 1, "window must be odd"
    if compat is None:
        compat = (jnp.ones((C, C)) - jnp.eye(C)) * xyz_coef
    if compat_bias is None:
        compat_bias = jnp.zeros((C,), softmax.dtype)
    den = 2.0 * xyz_sigma * xyz_sigma
    maskf = mask.astype(softmax.dtype)

    shifts = [(dy, dx) for dy in range(-(wh // 2), wh // 2 + 1)
              for dx in range(-(ww // 2), ww // 2 + 1)]

    def one_iter(sm):
        sm = sm * maskf[..., None]
        msg = jnp.zeros_like(sm)
        for dy, dx in shifts:
            x_s = jnp.roll(xyz, (dy, dx), axis=(1, 2))
            sm_s = jnp.roll(sm, (dy, dx), axis=(1, 2))
            m_s = jnp.roll(maskf, (dy, dx), axis=(1, 2))
            d2 = jnp.sum((x_s - xyz) ** 2, axis=-1)
            w = jnp.exp(-d2 / den) * m_s
            msg = msg + sm_s * w[..., None]
        reweight = msg @ compat + compat_bias
        return jax.nn.softmax(reweight + sm, axis=-1)

    sm = softmax
    for _ in range(iters):
        sm = one_iter(sm)
    return sm


def segment_with_crf(model: RangeSegmentator, variables,
                     range_input: jnp.ndarray, iters: int = 3,
                     window=(3, 5), xyz_sigma: float = 0.7,
                     xyz_coef: float = -0.1,
                     compat: jnp.ndarray = None,
                     compat_bias: jnp.ndarray = None) -> jnp.ndarray:
    """Forward + CRF refinement -> labels. The range image's channels 1:4
    are x,y,z exactly as the reference's CRF consumes them (CRF.py:110),
    channel 0 is range; mask = range > 0."""
    logits = model.apply(variables, range_input, train=False)
    sm = jax.nn.softmax(logits, axis=-1)
    xyz = range_input[..., 1:4]
    mask = range_input[..., 0] > 0
    sm = crf_refine(xyz, sm, mask, iters=iters, window=window,
                    xyz_sigma=xyz_sigma, xyz_coef=xyz_coef,
                    compat=compat, compat_bias=compat_bias)
    return jnp.argmax(sm, axis=-1).astype(jnp.int32)
