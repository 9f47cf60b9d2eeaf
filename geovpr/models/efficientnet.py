"""EfficientNet-B0 backbone (flax.linen, NHWC).

TPU-native reimplementation of the architecture behind
``torchvision.models.efficientnet_b0`` — the backbone of the reference's
best angle-prediction runs (`angle_prediction/efficient_net/
en_finetuning_gemini.py:68-88`, MAAE 26.326 deg) and the direct-regression
variant (`efficientnet_finetuning.py:50-60`).

The module structure and parameter names are chosen so torchvision
checkpoints convert mechanically (see `geovpr/models/convert_torch.py`):
stem Conv3x3/s2 -> 7 MBConv stages (expand, depthwise, SE(0.25), project,
stochastic depth 0.2 linearly scaled) -> head Conv1x1 to 1280 -> global
average pool. BatchNorm runs in inference mode by default (`use_running_stats`)
— fine-tuning at reference batch sizes keeps running stats frozen-updated the
torch way when train=True.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from geovpr.models.backbone import BackboneOutput
from geovpr.models.layers import DropPath, SqueezeExcite


@dataclasses.dataclass(frozen=True)
class MBConvSpec:
    expand_ratio: int
    kernel: int
    stride: int
    in_ch: int
    out_ch: int
    layers: int


# torchvision efficientnet_b0 inverted-residual setting
B0_STAGES: Sequence[MBConvSpec] = (
    MBConvSpec(1, 3, 1, 32, 16, 1),
    MBConvSpec(6, 3, 2, 16, 24, 2),
    MBConvSpec(6, 5, 2, 24, 40, 2),
    MBConvSpec(6, 3, 2, 40, 80, 3),
    MBConvSpec(6, 5, 1, 80, 112, 3),
    MBConvSpec(6, 5, 2, 112, 192, 4),
    MBConvSpec(6, 3, 1, 192, 320, 1),
)

BN_EPS = 1e-3  # torchvision EfficientNet uses eps=0.001 BatchNorm
BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (0.1)


class ConvBNAct(nn.Module):
    out_ch: int
    kernel: int
    stride: int = 1
    groups: int = 1
    use_act: bool = True
    # "torch": symmetric (k-1)//2 padding (torchvision semantics — what the
    #          reference's efficientnet_b0 uses);
    # "tf":    TF-SAME asymmetric padding for stride-2 convs (HF/google
    #          checkpoints; pad = (k//2 - 1, k//2) per spatial dim).
    conv_padding: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        half = self.kernel // 2
        if self.conv_padding == "tf" and self.stride == 2:
            pad = [(half - 1 if half > 0 else 0, half)] * 2
        else:
            sym = (self.kernel - 1) // 2
            pad = [(sym, sym)] * 2
        x = nn.Conv(
            self.out_ch, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=False, name="conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            name="bn", dtype=jnp.float32)(x)
        if self.use_act:
            x = nn.silu(x)
        return x


class MBConv(nn.Module):
    spec: MBConvSpec
    stride: int
    in_ch: int
    drop_path: float
    conv_padding: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 deterministic: bool = True) -> jax.Array:
        s = self.spec
        residual = x
        expanded = self.in_ch * s.expand_ratio
        h = x
        if s.expand_ratio != 1:
            h = ConvBNAct(expanded, 1, name="expand", dtype=self.dtype)(h, train)
        h = ConvBNAct(expanded, s.kernel, stride=self.stride, groups=expanded,
                      conv_padding=self.conv_padding,
                      name="dw", dtype=self.dtype)(h, train)
        # torchvision SE squeeze width: max(1, in_ch // 4) on the block's
        # *input* channels (squeeze ratio 0.25)
        h = SqueezeExcite(max(1, self.in_ch // 4), name="se",
                          dtype=self.dtype)(h)
        h = ConvBNAct(s.out_ch, 1, use_act=False, name="project",
                      dtype=self.dtype)(h, train)
        if self.stride == 1 and self.in_ch == s.out_ch:
            h = DropPath(self.drop_path)(h, deterministic=deterministic)
            h = h + residual
        return h


class EfficientNetB0(nn.Module):
    """NHWC EfficientNet-B0 feature extractor -> (B, 1280) pooled features."""

    stochastic_depth: float = 0.2
    conv_padding: str = "torch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 deterministic: bool = True) -> BackboneOutput:
        x = x.astype(self.dtype)
        x = ConvBNAct(32, 3, stride=2, conv_padding=self.conv_padding,
                      name="stem", dtype=self.dtype)(x, train)

        total_blocks = sum(s.layers for s in B0_STAGES)
        block_idx = 0
        for stage_i, spec in enumerate(B0_STAGES):
            for layer_i in range(spec.layers):
                stride = spec.stride if layer_i == 0 else 1
                in_ch = spec.in_ch if layer_i == 0 else spec.out_ch
                dp = self.stochastic_depth * block_idx / total_blocks
                x = MBConv(spec, stride=stride, in_ch=in_ch, drop_path=dp,
                           conv_padding=self.conv_padding,
                           name=f"stage{stage_i}_block{layer_i}",
                           dtype=self.dtype)(x, train, deterministic)
                block_idx += 1

        x = ConvBNAct(1280, 1, name="head", dtype=self.dtype)(x, train)
        tokens = x.reshape(x.shape[0], -1, x.shape[-1])
        pooled = jnp.mean(tokens, axis=1)
        return BackboneOutput(pooled=pooled.astype(jnp.float32),
                              tokens=tokens.astype(jnp.float32))
