"""ResNet backbone in Flax, NHWC (TPU-native) layout.

Capability parity: detectron2 `build_resnet_backbone` with
OUT_FEATURES=["res3","res4","res5"], FrozenBN, STRIDE_IN_1X1=False
(torchvision-style bottlenecks), FREEZE_AT=2 — the R50 used by the flagship
configs (reference configs/image_joint_r50.yaml MODEL.RESNETS).

Frozen batch-norm is an affine fold: y = (x - mean) / sqrt(var+eps) * scale + bias.
All four tensors are parameters so converted torch checkpoints map 1:1; the
optimizer masks them (and optionally whole stages, FREEZE_AT) out of updates.

Params live in fp32; convolutions run in `dtype` (bfloat16 on TPU) so the MXU
does the heavy lifting.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # fold into a single multiply-add (XLA fuses into the preceding conv)
        mul = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * mul + add


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    use_shortcut_proj: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name)
        out = conv(self.bottleneck_channels, 1, 1, "conv1")(x)
        out = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        # stride in the 3x3 conv (STRIDE_IN_1X1=False, torchvision convention)
        out = conv(self.bottleneck_channels, 3, self.stride, "conv2")(out)
        out = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.out_channels, 1, 1, "conv3")(out)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="bn3")(out)
        if self.use_shortcut_proj:
            sc = conv(self.out_channels, 1, self.stride, "shortcut")(x)
            sc = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning {res3, res4, res5} (strides 8/16/32)."""
    depth: int = 50
    in_channels: int = 3     # 4 for the SOT/VOS template branch
    out_features: Sequence[str] = ("res3", "res4", "res5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        stage_blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        x = x.astype(self.dtype)
        # stem: 7x7/2 conv + maxpool/2
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = {}
        channels = 256
        for stage_idx, n_blocks in enumerate(stage_blocks):
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    out_channels=channels,
                    bottleneck_channels=channels // 4,
                    stride=stride if b == 0 else 1,
                    use_shortcut_proj=(b == 0),
                    dtype=self.dtype,
                    name=f"res{stage_idx + 2}_block{b}")(x)
            name = f"res{stage_idx + 2}"
            if name in self.out_features:
                outs[name] = x
            channels *= 2
        return outs


def resnet_param_label(path: Tuple[str, ...]) -> str:
    """Classify a ResNet param path for optimizer param groups.

    Returns "frozen" for FrozenBN stats and FREEZE_AT<=2 stages (stem, res2),
    else "backbone" (gets BACKBONE_MULTIPLIER lr).
    """
    name = "/".join(path)
    if any(k in name for k in ("mean", "var")):
        return "frozen"
    if name.startswith(("stem", "res2")):
        return "frozen"
    return "backbone"
