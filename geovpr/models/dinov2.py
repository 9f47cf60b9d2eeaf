"""DINOv2 ViT backbone (flax.linen, NHWC, static shapes).

TPU-native reimplementation of the architecture behind HF `Dinov2Model` —
the reference's DINOv2 paths: unfrozen fine-tuning
(`dinov2salad/dinov2salad_finetuning_2.py:117` mean-pool), CLS-token angle
regression (`angle_prediction/dinov2salad/dino_angle_finetuning.py:45`,
`dino_v2_gemini.py:99-114`), and the frozen backbone inside the hub SALAD
descriptor model (`dinov2salad/dinov2salad_finetuning.py:19`).

Parity notes (verified against transformers.models.dinov2.modeling_dinov2):
- patch embed Conv k14/s14, CLS token prepended, learned absolute position
  embeddings (bicubically interpolated at import time when the target
  resolution differs from the checkpoint's 224)
- per layer: LN(eps 1e-6) -> MHSA (separate q/k/v) -> out proj ->
  LayerScale(lambda1) -> +res -> LN -> MLP(4x exact GELU) -> LayerScale ->
  +res
- final LN; `pooled` = CLS token.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from geovpr.models.backbone import BackboneOutput
from geovpr.models.layers import DropPath, LayerScale, Mlp

DINOV2_VARIANTS = {
    "small-14": dict(hidden_size=384, num_layers=12, num_heads=6),
    "base-14": dict(hidden_size=768, num_layers=12, num_heads=12),
    "large-14": dict(hidden_size=1024, num_layers=24, num_heads=16),
}

LN_EPS = 1e-6


class SelfAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, name="query", dtype=self.dtype)(x)
        k = nn.Dense(self.dim, name="key", dtype=self.dtype)(x)
        v = nn.Dense(self.dim, name="value", dtype=self.dtype)(x)

        def heads(t):
            return t.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (head_dim ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj", dtype=self.dtype)(out)


class DinoV2Block(nn.Module):
    dim: int
    num_heads: int
    layerscale_init: float = 1.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm1", dtype=self.dtype)(x)
        h = SelfAttention(self.dim, self.num_heads, name="attn",
                          dtype=self.dtype)(h)
        h = LayerScale(self.dim, self.layerscale_init, name="ls1")(h)
        x = x + DropPath(self.drop_path)(h, deterministic)
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm2", dtype=self.dtype)(x)
        h = Mlp(hidden_dim=4 * self.dim, name="mlp", dtype=self.dtype)(
            h, deterministic=deterministic)
        h = LayerScale(self.dim, self.layerscale_init, name="ls2")(h)
        return x + DropPath(self.drop_path)(h, deterministic)


class DinoV2(nn.Module):
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 14
    image_size: int = 224
    layerscale_init: float = 1.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 deterministic: bool = True) -> BackboneOutput:
        del train
        x = x.astype(self.dtype)
        b = x.shape[0]
        x = nn.Conv(self.hidden_size, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed", dtype=self.dtype)(x)
        x = x.reshape(b, -1, self.hidden_size)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.hidden_size))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.num_patches + 1, self.hidden_size))
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x],
                            axis=1)
        x = x + pos.astype(self.dtype)

        for i in range(self.num_layers):
            x = DinoV2Block(self.hidden_size, self.num_heads,
                            layerscale_init=self.layerscale_init,
                            drop_path=self.drop_path_rate,
                            name=f"block{i}", dtype=self.dtype)(x, deterministic)

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm", dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return BackboneOutput(pooled=x[:, 0], tokens=x[:, 1:], cls=x[:, 0])
