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
