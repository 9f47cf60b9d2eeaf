"""DINOv2 + SALAD global-descriptor model.

The reference treats this as a frozen black box from
`torch.hub.load("serizba/salad", "dinov2_salad")`
(`dinov2salad/dinov2salad_finetuning.py:19,92`) whose output is an 8448-dim
descriptor (`nn.Linear(8448, 512)` at :29 consuming `(B, 8448)` features at
:36). Here the whole thing is implemented natively: the DINOv2 ViT-B/14
backbone (`geovpr.models.dinov2`) plus the SALAD optimal-transport
aggregation head (PAPERS.md "Optimal Transport Aggregation for Visual Place
Recognition"):

- per-token local features: 1x1 MLP 768 -> 512 -> cluster_dim (128)
- per-token cluster scores: 1x1 MLP 768 -> 512 -> num_clusters (64)
- CLS global token: MLP 768 -> 512 -> token_dim (256)
- Sinkhorn OT assignment with learnable dustbin (3 log-domain iterations,
  `geovpr.ops.sinkhorn`), dustbin mass (N - M)
- aggregation V[b,c,d] = sum_n P[b,c,n] f[b,n,d]; intra-cluster L2 norm,
  flatten, concat with L2-normed global token, final L2 norm
  -> 64*128 + 256 = 8448 dims, matching the reference's descriptor size.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from geovpr.models.backbone import BackboneOutput
from geovpr.models.dinov2 import DINOV2_VARIANTS, DinoV2
from geovpr.models.layers import normalize_l2
from geovpr.ops.sinkhorn import salad_assignment


class SaladHead(nn.Module):
    num_clusters: int = 64
    cluster_dim: int = 128
    token_dim: int = 256
    hidden: int = 512
    sinkhorn_iters: int = 3
    # w8a8 serving path for the two token-wide 768->hidden matmuls (95% of
    # the head's FLOPs); both share the SAME input, so one activation
    # scale/quantize feeds both int8 matmuls. fc2s, the CLS path, and
    # Sinkhorn stay in bf16/f32 — small, and score precision feeds the OT.
    int8: bool = False
    calibrate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, cls: jax.Array) -> jax.Array:
        """tokens: (B, N, C) patch features; cls: (B, C). -> (B, 8448)."""
        tokens = tokens.astype(self.dtype)
        cls = cls.astype(self.dtype)
        b, n, c = tokens.shape

        if self.calibrate:
            self.sow("quant_calib", "a_tokens",
                     jnp.max(jnp.abs(tokens.astype(jnp.float32))))
        if self.int8:
            q = {
                name: self.variable("quant", name, init, shape, dt)
                for name, init, shape, dt in (
                    ("a_tokens_scale", jnp.ones, (), jnp.float32),
                    ("feat_fc1_kernel_q", jnp.zeros, (c, self.hidden),
                     jnp.int8),
                    ("feat_fc1_kernel_scale", jnp.ones, (self.hidden,),
                     jnp.float32),
                    ("feat_fc1_bias", jnp.zeros, (self.hidden,),
                     jnp.float32),
                    ("score_fc1_kernel_q", jnp.zeros, (c, self.hidden),
                     jnp.int8),
                    ("score_fc1_kernel_scale", jnp.ones, (self.hidden,),
                     jnp.float32),
                    ("score_fc1_bias", jnp.zeros, (self.hidden,),
                     jnp.float32),
                )
            }
        if self.int8 and not self.is_initializing():
            from geovpr.ops.quant import quantize_act
            a_t = q["a_tokens_scale"].value
            xq = quantize_act(tokens.astype(jnp.float32).reshape(-1, c),
                              a_t)

            def fc1_q(prefix):
                yi = jax.lax.dot(xq, q[f"{prefix}_kernel_q"].value,
                                 preferred_element_type=jnp.int32)
                y = (yi.astype(jnp.float32)
                     * (a_t * q[f"{prefix}_kernel_scale"].value)
                     + q[f"{prefix}_bias"].value)
                return jax.lax.stop_gradient(
                    jnp.maximum(y, 0.0).reshape(b, n, self.hidden)
                    .astype(self.dtype))

            f = fc1_q("feat_fc1")
            s = fc1_q("score_fc1")
        else:
            f = nn.relu(
                nn.Dense(self.hidden, name="feat_fc1",
                         dtype=self.dtype)(tokens))
            s = nn.relu(
                nn.Dense(self.hidden, name="score_fc1",
                         dtype=self.dtype)(tokens))
        f = nn.Dense(self.cluster_dim, name="feat_fc2", dtype=self.dtype)(f)
        s = nn.Dense(self.num_clusters, name="score_fc2", dtype=self.dtype)(s)

        t = nn.Dense(self.hidden, name="token_fc1", dtype=self.dtype)(cls)
        t = nn.relu(t)
        t = nn.Dense(self.token_dim, name="token_fc2", dtype=self.dtype)(t)

        dustbin = self.param("dustbin", nn.initializers.ones, ())
        # scores to (B, M clusters, N tokens)
        p = salad_assignment(s.transpose(0, 2, 1).astype(jnp.float32),
                             dustbin, num_iters=self.sinkhorn_iters)
        # V[b, c, d] = sum_n P[b, c, n] * f[b, n, d]
        v = jnp.einsum("bcn,bnd->bcd", p.astype(jnp.float32),
                       f.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        v = normalize_l2(v, axis=-1)          # intra-cluster L2
        flat = v.reshape(v.shape[0], -1)      # (B, M * D)
        out = jnp.concatenate(
            [normalize_l2(t.astype(jnp.float32)), flat], axis=-1)
        return normalize_l2(out)              # (B, token_dim + M*D) unit norm


class DinoV2Salad(nn.Module):
    """Full descriptor model: DINOv2-B/14 -> SALAD -> (B, 8448) unit vectors."""

    variant: str = "base-14"
    image_size: int = 224
    num_clusters: int = 64
    cluster_dim: int = 128
    token_dim: int = 256
    sinkhorn_iters: int = 3
    use_pallas: bool = True
    remat: bool = False
    # w8a8 serving path (inference only) / its calibration pass —
    # see geovpr/models/quantize.py
    int8_mlp: bool = False
    int8_attn: bool = False
    calibrate: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def descriptor_dim(self) -> int:
        return self.num_clusters * self.cluster_dim + self.token_dim

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 deterministic: bool = True) -> BackboneOutput:
        backbone = DinoV2(**DINOV2_VARIANTS[self.variant],
                          image_size=self.image_size, name="backbone",
                          use_pallas=self.use_pallas, remat=self.remat,
                          int8_mlp=self.int8_mlp, int8_attn=self.int8_attn,
                          calibrate=self.calibrate, dtype=self.dtype)
        out = backbone(x, train=train, deterministic=deterministic)
        desc = SaladHead(
            num_clusters=self.num_clusters, cluster_dim=self.cluster_dim,
            token_dim=self.token_dim, sinkhorn_iters=self.sinkhorn_iters,
            int8=self.int8_mlp, calibrate=self.calibrate,
            name="salad", dtype=self.dtype)(out.tokens, out.cls)
        return BackboneOutput(pooled=desc, tokens=out.tokens, cls=out.cls)
