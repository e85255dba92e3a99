"""ResNet backbone (detectron2-compatible R50/R101) in Flax, NHWC.

Mirrors detectron2's builtin `build_resnet_backbone` used by the reference's
Base-*.yaml configs (MODEL.RESNETS: caffe-style MSRA weights, FrozenBN,
STRIDE_IN_1X1=True, conv bias=False). Output features: res2 (stride 4) ..
res5 (stride 32). FrozenBN is folded to affine scale/bias in the 'frozen'
collection (see layers.FrozenBatchNorm).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bm2f_tpu.models.layers import FrozenBatchNorm, c2_xavier_init

# (num_blocks per stage) for each depth; 14 = one bottleneck per stage
# (dryrun/test-size model — same channel plan and feature strides as R50)
RESNET_STAGES = {
    14: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


def msra_conv_init(key, shape, dtype=jnp.float32):
    """detectron2 c2_msra_fill = kaiming_normal(fan_out, relu)."""
    fan_out = shape[0] * shape[1] * shape[3]
    std = (2.0 / fan_out) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            kernel_init=msra_conv_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        return FrozenBatchNorm(self.features, name="norm")(x)


class BottleneckBlock(nn.Module):
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    has_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = ConvBN(self.bottleneck_channels, 1, s1, self.dtype, name="conv1")(x)
        out = nn.relu(out)
        out = ConvBN(self.bottleneck_channels, 3, s3, self.dtype, name="conv2")(out)
        out = nn.relu(out)
        out = ConvBN(self.out_channels, 1, 1, self.dtype, name="conv3")(out)
        if self.has_shortcut:
            shortcut = ConvBN(
                self.out_channels, 1, self.stride, self.dtype, name="shortcut"
            )(x)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


def _max_pool_3x3_s2(x):
    """torch MaxPool2d(3, stride=2, padding=1) — pads with -inf."""
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


class ResNet(nn.Module):
    depth: int = 50
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        # stem
        x = ConvBN(64, 7, 2, self.dtype, name="stem_conv1")(x)
        x = nn.relu(x)
        x = _max_pool_3x3_s2(x)

        outs = {}
        num_blocks = RESNET_STAGES[self.depth]
        in_ch, out_ch, bott = 64, 256, 64
        for stage_idx, n in enumerate(num_blocks):
            stage_name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            for b in range(n):
                x = BottleneckBlock(
                    bottleneck_channels=bott,
                    out_channels=out_ch,
                    stride=stride if b == 0 else 1,
                    has_shortcut=(b == 0),
                    dtype=self.dtype,
                    name=f"{stage_name}_block{b}",
                )(x)
            if stage_name in self.out_features:
                outs[stage_name] = x
            out_ch *= 2
            bott *= 2
        return outs


RESNET_FEATURE_CHANNELS = {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}
RESNET_FEATURE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
