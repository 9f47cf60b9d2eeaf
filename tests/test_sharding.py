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


class TestHybridMesh:
    def test_fallback_layout_and_axes(self):
        from geovpr.parallel.mesh import create_hybrid_mesh
        # 8 virtual CPU devices, (data, model) with the data axis spanning
        # 2 "hosts" x 2 chips: ici (2, 2) x dcn (2, 1)
        mesh = create_hybrid_mesh((2, 2), (2, 1), ("data", "model"))
        assert mesh.shape == {"data": 4, "model": 2}
        assert mesh.devices.size == 8

    def test_shape_mismatch_raises(self):
        from geovpr.parallel.mesh import create_hybrid_mesh
        with pytest.raises(ValueError):
            create_hybrid_mesh((2, 2), (4, 1), ("data", "model"))
        with pytest.raises(ValueError):
            create_hybrid_mesh((2, 2), (2,), ("data", "model"))

    def test_sharded_step_on_hybrid_mesh(self):
        """A batch-sharded computation compiles and runs on the hybrid mesh
        with gradients implicitly psum'd across both mesh factors of the
        data axis (the cross-host layout)."""
        from geovpr.parallel.mesh import create_hybrid_mesh
        mesh = create_hybrid_mesh((4, 1), (2, 1), ("data", "model"))
        x = jax.device_put(np.arange(16, dtype=np.float32).reshape(8, 2),
                           NamedSharding(mesh, P("data", None)))
        w = jax.device_put(np.ones((2, 2), np.float32),
                           NamedSharding(mesh, P()))

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        g = jax.jit(jax.grad(loss))(w, x)
        xh, wh = np.asarray(x), np.asarray(w)
        expected = 2 * xh.T @ (xh @ wh) / (xh @ wh).size
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)


class TestCrossMeshRestore:
    def test_checkpoint_roundtrip_across_topologies(self, tmp_path):
        """Save on a 1-D 8-device data mesh, restore into a (4, 2)
        data x model TP-sharded template: values must match and the restored
        arrays must carry the TEMPLATE's shardings (round-1 left this to the
        checkpoint file's recorded topology)."""
        from geovpr.core.config import ModelConfig, OptimConfig
        from geovpr.models.dinov2 import DinoV2
        from geovpr.parallel.sharding_rules import shard_state
        from geovpr.train.checkpoint import restore_checkpoint, save_checkpoint
        from geovpr.train.optimizer import build_optimizer
        from geovpr.train.state import create_train_state
        import flax.linen as nn

        class TinyDino(nn.Module):
            @nn.compact
            def __call__(self, x, train=False, deterministic=True):
                out = DinoV2(hidden_size=64, num_layers=1, num_heads=4,
                             patch_size=14, image_size=28,
                             name="backbone")(x, train, deterministic)
                return nn.Dense(2, name="head_out")(out.cls)

        tx = build_optimizer(OptimConfig(lr=1e-3), None, 10)
        sample = jnp.zeros((1, 28, 28, 3))

        mesh_a = create_mesh((8,), ("data",))
        state_a = create_train_state(TinyDino(), tx, jax.random.PRNGKey(0),
                                     sample, out_dim=2)
        save_checkpoint(str(tmp_path / "ckpt"), state_a, epoch=0)
        ref = jax.tree_util.tree_map(np.asarray, state_a.params)

        mesh_b = create_mesh((4, 2), ("data", "model"))
        state_b = create_train_state(TinyDino(), tx, jax.random.PRNGKey(7),
                                     sample, out_dim=2)
        state_b = shard_state(mesh_b, state_b)
        restored, epoch = restore_checkpoint(str(tmp_path / "ckpt"), state_b)
        assert epoch == 0

        fc1 = restored.params["backbone"]["block0"]["mlp"]["fc1"]["kernel"]
        assert "model" in str(fc1.sharding.spec), (
            f"restore dropped the template sharding: {fc1.sharding.spec}")
        got = jax.tree_util.tree_map(np.asarray, restored.params)
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(a, b)
