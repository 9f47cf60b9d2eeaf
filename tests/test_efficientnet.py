"""EfficientNet-B0 numerical parity (CPU, random init — no downloads).

Two oracles:

1. HF transformers `EfficientNetModel` with the b0 config — the TF-padding
   path (`conv_padding="tf"` + `convert_efficientnet_hf`). Strong independent
   implementation covering conv/BN/SE/SiLU numerics end to end.
2. A handwritten torch replica of the *torchvision* efficientnet_b0 layout
   (symmetric padding) — oracles the `conv_padding="torch"` path and
   `convert_efficientnet_b0`, since torchvision itself is not in this image.
   The reference's runs used torchvision (`efficientnet_finetuning.py:53`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geovpr.models.efficientnet import B0_STAGES, EfficientNetB0
from geovpr.models.convert_torch import (
    convert_efficientnet_b0,
    convert_efficientnet_hf,
)


def build_torchvision_style_b0():
    """Minimal torch replica of torchvision's efficientnet_b0 `features`
    (state_dict-compatible key layout)."""
    import torch
    import torch.nn as nn

    def conv_bn_act(in_ch, out_ch, k, stride=1, groups=1, act=True):
        layers = [
            nn.Conv2d(in_ch, out_ch, k, stride, padding=(k - 1) // 2,
                      groups=groups, bias=False),
            nn.BatchNorm2d(out_ch, eps=1e-3),
        ]
        if act:
            layers.append(nn.SiLU(inplace=True))
        return nn.Sequential(*layers)

    class SE(nn.Module):
        def __init__(self, ch, squeeze):
            super().__init__()
            self.fc1 = nn.Conv2d(ch, squeeze, 1)
            self.fc2 = nn.Conv2d(squeeze, ch, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = torch.nn.functional.silu(self.fc1(s))
            return x * torch.sigmoid(self.fc2(s))

    class MBConv(nn.Module):
        def __init__(self, spec, stride, in_ch):
            super().__init__()
            expanded = in_ch * spec.expand_ratio
            block = []
            if spec.expand_ratio != 1:
                block.append(conv_bn_act(in_ch, expanded, 1))
            block.append(conv_bn_act(expanded, expanded, spec.kernel,
                                     stride=stride, groups=expanded))
            block.append(SE(expanded, max(1, in_ch // 4)))
            block.append(conv_bn_act(expanded, spec.out_ch, 1, act=False))
            self.block = nn.Sequential(*block) if False else nn.ModuleList(block)
            self.use_res = stride == 1 and in_ch == spec.out_ch

        def forward(self, x):
            h = x
            for m in self.block:
                h = m(h)
            return x + h if self.use_res else h

    class Features(nn.Module):
        def __init__(self):
            super().__init__()
            feats = [conv_bn_act(3, 32, 3, stride=2)]
            for spec in B0_STAGES:
                stage = []
                for j in range(spec.layers):
                    stride = spec.stride if j == 0 else 1
                    in_ch = spec.in_ch if j == 0 else spec.out_ch
                    stage.append(MBConv(spec, stride, in_ch))
                feats.append(nn.Sequential(*stage))
            feats.append(conv_bn_act(320, 1280, 1))
            self.features = nn.Sequential(*feats)

        def forward(self, x):
            return self.features(x)

    torch.manual_seed(0)
    m = Features()
    # randomize BN stats so eval-mode parity is non-trivial
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    m.eval()
    return m


class TestTorchvisionStyleParity:
    @pytest.fixture(scope="class")
    def oracle(self):
        return build_torchvision_style_b0()

    def test_parity(self, oracle):
        import torch
        variables = convert_efficientnet_b0(oracle.state_dict())
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)
        out = EfficientNetB0().apply(variables, jnp.array(x), train=False)
        with torch.no_grad():
            feats = oracle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
            pooled = feats.mean((2, 3)).numpy()
        np.testing.assert_allclose(np.asarray(out.pooled), pooled,
                                   atol=2e-4, rtol=1e-3)


class TestHFParity:
    @pytest.fixture(scope="class")
    def oracle(self):
        import torch
        from transformers import EfficientNetConfig, EfficientNetModel
        torch.manual_seed(0)
        cfg = EfficientNetConfig(width_coefficient=1.0, depth_coefficient=1.0,
                                 hidden_dim=1280)
        m = EfficientNetModel(cfg)
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, torch.nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.5)
                    mod.running_var.uniform_(0.5, 2.0)
        m.eval()
        return m

    def test_parity_last_hidden_and_pooled(self, oracle):
        import torch
        variables = convert_efficientnet_hf(oracle.state_dict())
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
        out = EfficientNetB0(conv_padding="tf").apply(
            variables, jnp.array(x), train=False)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        pooled_ref = ref.pooler_output.numpy()
        np.testing.assert_allclose(np.asarray(out.pooled), pooled_ref,
                                   atol=3e-4, rtol=1e-3)
        # token parity too: (B, 1280, 7, 7) -> (B, 49, 1280)
        tok_ref = ref.last_hidden_state.permute(0, 2, 3, 1).reshape(2, -1, 1280)
        np.testing.assert_allclose(np.asarray(out.tokens), tok_ref.numpy(),
                                   atol=3e-4, rtol=1e-3)


def test_jit_and_shapes():
    model = EfficientNetB0()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = fwd(variables, jnp.zeros((2, 224, 224, 3)))
    assert out.pooled.shape == (2, 1280)
    assert out.tokens.shape == (2, 49, 1280)


def test_train_mode_updates_batch_stats():
    model = EfficientNetB0()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    x = jnp.ones((2, 64, 64, 3))
    _, mutated = model.apply(
        variables, x, train=True, deterministic=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
    old = variables["batch_stats"]["stem"]["bn"]["mean"]
    new = mutated["batch_stats"]["stem"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
