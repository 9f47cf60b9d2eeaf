"""ConvNeXt backbone (flax.linen, NHWC).

TPU-native reimplementation of the architecture behind HF `ConvNextModel` —
the reference's direct-angle variant
(`angle_prediction/convnext/convnext_finetuning.py:55-64`, model id
"facebook/convnext-base-224", Linear(hidden_sizes[-1] -> 1) on
pooler_output).

Parity notes (verified against transformers.models.convnext.modeling_convnext):
- stem Conv k4/s4 + LN(1e-6)
- stage blocks: depthwise 7x7 -> LN(1e-6) -> Linear 4x -> exact GELU ->
  Linear -> layer-scale gamma (init 1e-6) -> +residual (drop-path)
- between stages: LN(1e-6) + Conv k2/s2
- pooler: spatial mean then LN(config.layer_norm_eps = 1e-12)
NHWC throughout, so every LayerNorm is a plain last-axis norm (HF's
channels_first permutes are layout artifacts with no TPU equivalent).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geovpr.models.backbone import BackboneOutput
from geovpr.models.layers import DropPath, gelu_fast

CONVNEXT_VARIANTS = {
    "tiny-224": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "base-224": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layerscale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, name="dwconv",
                    dtype=self.dtype)(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=self.dtype)(h)
        h = nn.Dense(4 * self.dim, name="pwconv1", dtype=self.dtype)(h)
        h = gelu_fast(h)
        h = nn.Dense(self.dim, name="pwconv2", dtype=self.dtype)(h)
        gamma = self.param("gamma", nn.initializers.constant(self.layerscale_init),
                           (self.dim,))
        h = h * gamma.astype(h.dtype)
        return x + DropPath(self.drop_path)(h, deterministic)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 deterministic: bool = True) -> BackboneOutput:
        del train
        x = x.astype(self.dtype)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem",
                    dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm", dtype=self.dtype)(x)

        total = sum(self.depths)
        rates = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        for s, depth in enumerate(self.depths):
            if s > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"downsample{s}_norm",
                                 dtype=self.dtype)(x)
                x = nn.Conv(self.dims[s], (2, 2), strides=(2, 2),
                            name=f"downsample{s}_conv", dtype=self.dtype)(x)
            for b in range(depth):
                x = ConvNeXtBlock(self.dims[s], drop_path=float(rates[bi]),
                                  name=f"stage{s}_block{b}",
                                  dtype=self.dtype)(x, deterministic)
                bi += 1

        tokens = x.reshape(x.shape[0], -1, x.shape[-1]).astype(jnp.float32)
        pooled = jnp.mean(tokens, axis=1)
        # HF pooler LN uses config.layer_norm_eps (default 1e-12)
        pooled = nn.LayerNorm(epsilon=1e-12, name="pool_norm",
                              dtype=jnp.float32)(pooled)
        return BackboneOutput(pooled=pooled, tokens=tokens)
