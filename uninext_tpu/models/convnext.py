"""ConvNeXt backbone in Flax (NHWC).

Capability parity: reference uninext/backbone/convnext.py:60-264 (D2ConvNeXt,
out_features res3-res5 with per-stage LayerNorms). Depthwise 7x7 + pointwise
MLP blocks with layer scale; drop-path omitted at inference and applied via
the 'droppath' rng in training.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        x = gamma * x
        if self.drop_path > 0 and not deterministic:
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("droppath"), keep,
                (x.shape[0],) + (1,) * (x.ndim - 1))
            x = x * mask / keep
        return inp + x


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (192, 384, 768, 1536)    # large
    drop_path_rate: float = 0.0
    in_channels: int = 3
    out_features: Sequence[str] = ("res3", "res4", "res5")
    # D2ConvNeXt sets layer_scale_init_value=1.0 for every variant
    # (reference backbone/convnext.py:203-218); the upstream ConvNeXt paper
    # default 1e-6 makes blocks near-identity and cripples from-scratch
    # training. Converted checkpoints overwrite gamma either way.
    layer_scale_init: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        # python-level constants (np, not jnp: this runs under trace)
        import numpy as np
        dp_rates = [float(r) for r in
                    np.linspace(0, self.drop_path_rate, sum(self.depths))]
        cur = 0
        outs = {}
        for stage in range(4):
            if stage == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                            dtype=self.dtype, name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down_norm_{stage}")(x)
                x = nn.Conv(self.dims[stage], (2, 2), strides=(2, 2),
                            dtype=self.dtype, name=f"down_conv_{stage}")(x)
            for b in range(self.depths[stage]):
                x = ConvNeXtBlock(self.dims[stage],
                                  layer_scale_init=self.layer_scale_init,
                                  drop_path=dp_rates[cur + b],
                                  dtype=self.dtype,
                                  name=f"stage{stage}_block{b}")(
                                      x, deterministic)
            cur += self.depths[stage]
            name = f"res{stage + 2}"
            if name in self.out_features:
                outs[name] = nn.LayerNorm(epsilon=1e-6,
                                          name=f"out_norm_{name}")(x)
        return outs
