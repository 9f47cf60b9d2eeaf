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
from geovpr.models.dinov2 import PScaleBias, _layer_norm
from geovpr.models.layers import DropPath, Mlp

CONVNEXT_VARIANTS = {
    "tiny-224": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "base-224": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
}

LN_EPS = 1e-6


class ConvNeXtBlock(nn.Module):
    """dwconv 7x7 -> LN -> channel MLP (pw1 -> GELU -> pw2) -> LayerScale
    -> +residual.

    The channel MLP is ~96% of ConvNeXt-B's FLOPs (16*HW*C^2 vs the
    dwconv's 98*HW*C per block), so it reuses the shared `Mlp` module —
    which carries the whole w8a8 serving stack (calibration sows, the
    fused LN->int8 MLP->LayerScale->+residual Pallas kernel, the XLA int8
    fallback). The one structural delta vs the transformer blocks: the
    residual is the PRE-dwconv stream, passed as `fused_residual`.
    """

    dim: int
    drop_path: float = 0.0
    layerscale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    int8_mlp: bool = False
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, name="dwconv",
                    dtype=self.dtype)(x)
        n_scale, n_bias = PScaleBias(self.dim, name="norm")()
        mlp = Mlp(hidden_dim=4 * self.dim, out_dim=self.dim, name="mlp",
                  dtype=self.dtype, int8=self.int8_mlp,
                  calibrate=self.calibrate)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layerscale_init),
                           (self.dim,))
        if (self.int8_mlp and deterministic
                and not self.is_initializing()):
            return mlp(h, deterministic=True,
                       fused=(n_scale, n_bias, gamma, LN_EPS),
                       fused_residual=x)
        h = _layer_norm(h, n_scale, n_bias, eps=LN_EPS)
        h = mlp(h, deterministic=deterministic)
        h = h * gamma.astype(h.dtype)
        return x + DropPath(self.drop_path)(h, deterministic)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # w8a8 serving path / its calibration pass (models/quantize.py)
    int8_mlp: bool = False
    calibrate: bool = False

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
                                  dtype=self.dtype, int8_mlp=self.int8_mlp,
                                  calibrate=self.calibrate)(x, deterministic)
                bi += 1

        tokens = x.reshape(x.shape[0], -1, x.shape[-1]).astype(jnp.float32)
        pooled = jnp.mean(tokens, axis=1)
        # HF pooler LN uses config.layer_norm_eps (default 1e-12)
        pooled = nn.LayerNorm(epsilon=1e-12, name="pool_norm",
                              dtype=jnp.float32)(pooled)
        return BackboneOutput(pooled=pooled, tokens=tokens)
