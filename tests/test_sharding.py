"""Tensor-parallel sharding-rule tests on the 8-device CPU mesh.

The reference has no parallelism of any kind (SURVEY.md §2.2); these pin the
new framework's Megatron-style column/row-parallel rules for ViT blocks and
verify real sharded execution for both DINOv2 and Swin — the "optional TP for
the larger Swin-B-384 config" called out in SURVEY.md §2.2.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from geovpr.parallel.mesh import create_mesh
from geovpr.parallel.sharding_rules import (
    COLUMN_PARALLEL,
    ROW_PARALLEL,
    param_spec,
    shard_params,
)


class KeyPath:
    def __init__(self, key):
        self.key = key


def _path(*names):
    return tuple(KeyPath(n) for n in names)


class TestParamSpec:
    def test_column_parallel_output_dim(self):
        leaf = jnp.zeros((16, 64))
        for name in ("fc1", "query", "key", "value"):
            spec = param_spec(_path("block0", "attn", name, "kernel"), leaf)
            assert spec == P(None, "model"), name

    def test_row_parallel_input_dim(self):
        leaf = jnp.zeros((64, 16))
        for name in ("fc2", "proj"):
            spec = param_spec(_path("block0", name, "kernel"), leaf)
            assert spec == P("model", None), name

    def test_bias_and_norm_replicated(self):
        assert param_spec(_path("block0", "fc1", "bias"),
                          jnp.zeros((64,))) == P()
        assert param_spec(_path("norm", "scale"), jnp.zeros((8,))) == P()

    def test_column_row_cover_mlp_and_attention(self):
        assert "fc1" in COLUMN_PARALLEL and "fc2" in ROW_PARALLEL
        assert "proj" in ROW_PARALLEL


class TestShardParams:
    def _mesh(self):
        return create_mesh((2, 4), ("data", "model"))

    def test_dinov2_tp_execution(self):
        from geovpr.models.dinov2 import DinoV2

        mesh = self._mesh()
        model = DinoV2(hidden_size=64, num_layers=2, num_heads=4,
                       patch_size=14, image_size=28)
        x = jnp.zeros((8, 28, 28, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        params = shard_params(mesh, variables["params"])

        fc1 = params["block0"]["mlp"]["fc1"]["kernel"]
        assert "model" in str(fc1.sharding.spec)
        proj = params["block0"]["attn"]["proj"]["kernel"]
        assert proj.sharding.spec == P("model", None)

        @jax.jit
        def fwd(p, x):
            return model.apply({"params": p}, x).pooled

        out = fwd(params, jax.device_put(
            jnp.ones((8, 28, 28, 3)),
            NamedSharding(mesh, P("data", None, None, None))))
        assert np.isfinite(np.asarray(out)).all()

    def test_swin_tp_execution(self):
        from geovpr.models.swin import SwinTransformer

        mesh = self._mesh()
        model = SwinTransformer(embed_dim=32, depths=(1, 1), num_heads=(2, 4),
                                window_size=4, image_size=32, patch_size=4,
                                drop_path_rate=0.0)
        x = jnp.zeros((8, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        params = shard_params(mesh, variables["params"])

        q = params["stage0_block0"]["attn"]["query"]["kernel"]
        assert q.sharding.spec == P(None, "model")
        fc2 = params["stage0_block0"]["mlp"]["fc2"]["kernel"]
        assert fc2.sharding.spec == P("model", None)

        @jax.jit
        def fwd(p, x):
            return model.apply({"params": p}, x).pooled

        out = fwd(params, jax.device_put(
            jnp.ones((8, 32, 32, 3)),
            NamedSharding(mesh, P("data", None, None, None))))
        assert out.shape == (8, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_indivisible_dims_replicate(self):
        mesh = self._mesh()
        params = {"attn": {"query": {"kernel": jnp.zeros((6, 6))}}}
        out = shard_params(mesh, params)  # 6 % 4 != 0 -> replicate
        assert out["attn"]["query"]["kernel"].sharding.spec == P()


class TestShardStateMoments:
    def test_multi_transform_moments_sharded(self):
        """Adam moments must get TP shardings even under multi_transform
        (differential-LR recipes) — a treedef match against the params tree
        misses MaskedNode-wrapped states and replicates everything."""
        import jax.numpy as jnp2
        from geovpr.core.config import OptimConfig
        from geovpr.parallel.sharding_rules import shard_state
        from geovpr.train.optimizer import build_optimizer
        from geovpr.train.state import create_train_state
        from geovpr.models.dinov2 import DinoV2
        import flax.linen as nn

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, train=False, deterministic=True):
                out = DinoV2(hidden_size=64, num_layers=1, num_heads=4,
                             patch_size=14, image_size=28,
                             name="backbone")(x, train, deterministic)
                return nn.Dense(2, name="head_out")(out.cls)

        mesh = create_mesh((2, 4), ("data", "model"))
        tx = build_optimizer(
            OptimConfig(lr=1e-3, backbone_lr_scale=0.5, schedule="constant"),
            total_steps=10)
        state = create_train_state(Tiny(), tx, jax.random.PRNGKey(0),
                                   jnp2.zeros((1, 28, 28, 3)), out_dim=2)
        state = shard_state(mesh, state)

        found = []

        def check(path, leaf):
            names = [str(getattr(p, "key", p)) for p in path]
            if (hasattr(leaf, "sharding") and len(names) >= 2
                    and names[-1] == "kernel" and names[-2] == "fc1"):
                found.append(str(leaf.sharding.spec))
            return leaf

        jax.tree_util.tree_map_with_path(check, state.opt_state)
        assert found, "no fc1 kernels found in opt_state"
        assert all("model" in s for s in found), found
