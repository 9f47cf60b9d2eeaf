"""Device-side augmentation unit tests (geovpr/data/transforms.py).

Covers the round-2 parity additions — GaussNoise (swin_attempt_3.py:66) and
RandomAffine (dino_v2_gemini.py:60) — plus the pipeline wiring that includes
them.
"""

import numpy as np
import jax
import jax.numpy as jnp

from geovpr.data.transforms import (
    build_augment,
    gauss_noise,
    random_affine,
)


def _imgs(b=4, size=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.2, 0.8, (b, size, size, 3))
                       .astype(np.float32))


class TestGaussNoise:
    def test_p_zero_is_identity(self):
        x = _imgs()
        y = gauss_noise(jax.random.PRNGKey(0), x, p=0.0)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_p_one_perturbs_every_sample_at_albumentations_scale(self):
        x = _imgs(b=8, size=32)
        y = gauss_noise(jax.random.PRNGKey(1), x, p=1.0)
        d = np.asarray(y - x)
        assert (np.abs(d).reshape(8, -1).max(axis=1) > 0).all()
        # var_limit (10, 50) on 0-255 => std 3.2-7.1/255 ~ [0.0124, 0.0277]
        stds = d.reshape(8, -1).std(axis=1)
        assert (stds > 0.008).all() and (stds < 0.035).all()

    def test_partial_p_leaves_some_samples_untouched(self):
        x = _imgs(b=64)
        y = gauss_noise(jax.random.PRNGKey(2), x, p=0.2)
        changed = (np.abs(np.asarray(y - x)).reshape(64, -1).max(axis=1) > 0)
        assert 0 < changed.sum() < 64


class TestRandomAffine:
    def test_identity_params_reproduce_input(self):
        x = _imgs()
        y = random_affine(jax.random.PRNGKey(0), x,
                          translate=(0.0, 0.0), scale=(1.0, 1.0))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_translation_moves_content(self):
        # bright square at the center; translation must move its centroid
        x = np.zeros((1, 33, 33, 3), np.float32)
        x[0, 14:19, 14:19] = 1.0
        y = np.asarray(random_affine(
            jax.random.PRNGKey(3), jnp.asarray(x),
            translate=(0.3, 0.3), scale=(1.0, 1.0)))
        yy, xx = np.meshgrid(np.arange(33), np.arange(33), indexing="ij")
        w0 = x[0, :, :, 0]
        w1 = y[0, :, :, 0]
        c0 = np.array([(yy * w0).sum(), (xx * w0).sum()]) / w0.sum()
        c1 = np.array([(yy * w1).sum(), (xx * w1).sum()]) / w1.sum()
        assert np.linalg.norm(c1 - c0) > 1.0
        # zero fill: total mass can only shrink (content may leave the frame)
        assert w1.sum() <= w0.sum() + 1e-3

    def test_zoom_out_shrinks_content(self):
        x = np.zeros((1, 33, 33, 3), np.float32)
        x[0, 8:25, 8:25] = 1.0
        y = np.asarray(random_affine(
            jax.random.PRNGKey(4), jnp.asarray(x),
            translate=(0.0, 0.0), scale=(0.5, 0.500001)))
        # area scales by ~s^2 = 0.25
        ratio = y[0, :, :, 0].sum() / x[0, :, :, 0].sum()
        assert 0.15 < ratio < 0.35


class TestPipelineWiring:
    def test_geo_heavy_includes_noise_and_returns_flip(self):
        fn = build_augment("geo_heavy")
        x = _imgs(b=6)
        out, flip = fn(jax.random.PRNGKey(0), x)
        assert out.shape == x.shape and flip.shape == (6,)
        assert flip.dtype == jnp.bool_

    def test_angle_rot_affine_runs_without_flips(self):
        fn = build_augment("angle_rot")
        x = _imgs(b=6)
        out, flip = fn(jax.random.PRNGKey(0), x)
        assert out.shape == x.shape
        assert not bool(flip.any())  # heading targets must never be remapped
