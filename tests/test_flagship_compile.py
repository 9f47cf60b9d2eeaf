"""Flagship-shape multichip compile checks (no execution).

`__graft_entry__.dryrun_multichip` executes a tiny-but-real TP/DP train
step and AOT-compiles the base-14 descriptor forward at production dims;
what it deliberately skips (XLA CPU needs ~9 min for it) is the
production-dimension TRAIN program: the Swin-B-384 geopose train step —
the reference's flagship recipe (swin_attempt_2.py) — partitioned over a
(data, model) mesh. A sharding rule that only breaks at full depth/width
(e.g. a TP split that collides with the window-12 bias tables or the
(2,2,18,2) stage layout) would pass every tiny-config test and explode at
launch; this compiles the full program over the virtual 8-device mesh so
it fails CI instead. Compile-only: no weights are materialized
(jax.eval_shape -> ShapeDtypeStruct with NamedShardings).
"""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from geovpr.cli.presets import build_preset, objective_for
from geovpr.data.transforms import normalize
from geovpr.parallel.mesh import create_mesh
from geovpr.parallel.sharding_rules import _guarded_spec
from geovpr.train.model import RegressionModel
from geovpr.train.optimizer import build_optimizer
from geovpr.train.state import create_train_state
from geovpr.train.steps import make_train_step


@pytest.mark.slow
def test_swin_b384_train_step_compiles_on_8dev_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh((4, 2), ("data", "model"))
    cfg = build_preset("swin_b384_gemini2")
    model = RegressionModel(config=cfg.model)
    tx = build_optimizer(cfg.optim, None, 10)

    def _make_state():
        return create_train_state(model, tx, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 384, 384, 3)), out_dim=2)

    abs_state = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype,
            sharding=NamedSharding(mesh, _guarded_spec(path, leaf, mesh,
                                                       "model")))
            if hasattr(leaf, "shape") else leaf),
        jax.eval_shape(_make_state))
    sb = 8
    abs_batch = {
        "image": jax.ShapeDtypeStruct(
            (sb, 384, 384, 3), jnp.uint8,
            sharding=NamedSharding(mesh, P("data", None, None, None))),
        "target": jax.ShapeDtypeStruct(
            (sb, 2), jnp.float32, sharding=NamedSharding(mesh, P("data"))),
        "mask": jax.ShapeDtypeStruct(
            (sb,), jnp.bool_, sharding=NamedSharding(mesh, P("data"))),
    }
    step = make_train_step(objective_for(cfg), normalize_fn=normalize)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        abs_state, abs_batch).compile()
    assert compiled is not None


@pytest.mark.slow
def test_convnext_b224_train_step_compiles_on_8dev_mesh():
    """Same guard for the ConvNeXt angle recipe (convnext_finetuning.py):
    its channel MLPs now live in the shared Mlp module, so the Megatron
    fc1/fc2 TP splits apply to a conv backbone for the first time — and
    the dwconv/stem/downsample kernels must come out replicated (their
    channel dims collide with the 2-way model axis only at full width)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh((4, 2), ("data", "model"))
    cfg = build_preset("convnext_direct_maae")
    model = RegressionModel(config=cfg.model)
    tx = build_optimizer(cfg.optim, None, 10)

    def _make_state():
        return create_train_state(model, tx, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 224, 224, 3)), out_dim=1)

    abs_state = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype,
            sharding=NamedSharding(mesh, _guarded_spec(path, leaf, mesh,
                                                       "model")))
            if hasattr(leaf, "shape") else leaf),
        jax.eval_shape(_make_state))
    sb = 8
    abs_batch = {
        "image": jax.ShapeDtypeStruct(
            (sb, 224, 224, 3), jnp.uint8,
            sharding=NamedSharding(mesh, P("data", None, None, None))),
        "target": jax.ShapeDtypeStruct(
            (sb, 1), jnp.float32, sharding=NamedSharding(mesh, P("data"))),
        "mask": jax.ShapeDtypeStruct(
            (sb,), jnp.bool_, sharding=NamedSharding(mesh, P("data"))),
    }
    step = make_train_step(objective_for(cfg), normalize_fn=normalize)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        abs_state, abs_batch).compile()
    assert compiled is not None
