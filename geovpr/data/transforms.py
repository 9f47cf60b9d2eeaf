"""Device-side image transforms (pure jnp — run inside the jitted step).

Replaces the reference's host-side torchvision/albumentations pipelines
(`swin_finetuning_2.py:78-82`, `swin_attempt_3.py:60-69`,
`dino_v2_gemini.py:57-62`) with XLA-fused device ops:

- uint8 -> float normalize (ImageNet stats by default),
- random horizontal flip — returns the flip decision so angle targets can be
  remapped consistently (theta -> (180 - theta) mod 360); the reference's
  flip-aware variant re-sampled the flip when adjusting the target
  (swin_angle_finetuning_gemini.py:59-76, an acknowledged approximation) —
  here one decision drives both image and label,
- brightness/contrast/saturation jitter (torchvision ColorJitter semantics),
- random rotation via map_coordinates bilinear resampling (albumentations
  Rotate / torchvision RandomRotation analog),
- random resized crop (scale/ratio sampling like torchvision's
  RandomResizedCrop, bilinear).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(images: jax.Array,
              mean: Sequence[float] = IMAGENET_MEAN,
              std: Sequence[float] = IMAGENET_STD) -> jax.Array:
    """uint8/float images (B,H,W,3) -> normalized float32."""
    x = images.astype(jnp.float32)
    x = x / 255.0 if images.dtype == jnp.uint8 else x
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def random_flip(rng: jax.Array, images: jax.Array,
                p: float = 0.5) -> Tuple[jax.Array, jax.Array]:
    """Per-sample horizontal flip. Returns (images, flipped (B,) bool)."""
    flip = jax.random.bernoulli(rng, p, (images.shape[0],))
    flipped = jnp.where(flip[:, None, None, None],
                        images[:, :, ::-1, :], images)
    return flipped, flip


def color_jitter(rng: jax.Array, images: jax.Array,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2) -> jax.Array:
    """torchvision ColorJitter-style multiplicative jitter (float images)."""
    b_key, c_key, s_key = jax.random.split(rng, 3)
    batch = images.shape[0]

    def factors(key, strength):
        return jax.random.uniform(key, (batch, 1, 1, 1),
                                  minval=1.0 - strength, maxval=1.0 + strength)

    x = images * factors(b_key, brightness)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * factors(c_key, contrast) + mean
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - gray) * factors(s_key, saturation) + gray
    return x


def random_rotate(rng: jax.Array, images: jax.Array,
                  max_degrees: float = 15.0) -> jax.Array:
    """Per-sample rotation about the center, bilinear, zero-padded
    (albumentations Rotate(limit=15) analog, swin_attempt_3.py:64)."""
    b, h, w, c = images.shape
    angles = jax.random.uniform(rng, (b,), minval=-max_degrees,
                                maxval=max_degrees) * (jnp.pi / 180.0)

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def rotate_one(img, angle):
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        src_y = cy + (yy - cy) * cos - (xx - cx) * sin
        src_x = cx + (yy - cy) * sin + (xx - cx) * cos
        coords = jnp.stack([src_y.ravel(), src_x.ravel()])

        def sample_channel(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, coords, order=1, mode="constant", cval=0.0).reshape(h, w)

        return jnp.stack([sample_channel(img[..., i]) for i in range(c)],
                         axis=-1)

    return jax.vmap(rotate_one)(images, angles)


def random_resized_crop(rng: jax.Array, images: jax.Array,
                        scale: Tuple[float, float] = (0.8, 1.0),
                        ratio: Tuple[float, float] = (0.9, 1.1)) -> jax.Array:
    """Sample a crop box per image and resize back to the input size
    (torchvision RandomResizedCrop analog, swin_finetuning_2.py:78)."""
    b, h, w, c = images.shape
    a_key, r_key, y_key, x_key = jax.random.split(rng, 4)
    area = jax.random.uniform(a_key, (b,), minval=scale[0], maxval=scale[1])
    aspect = jax.random.uniform(r_key, (b,), minval=ratio[0], maxval=ratio[1])
    ch = jnp.sqrt(area / aspect) * h
    cw = jnp.sqrt(area * aspect) * w
    ch = jnp.clip(ch, 1.0, h)
    cw = jnp.clip(cw, 1.0, w)
    y0 = jax.random.uniform(y_key, (b,)) * (h - ch)
    x0 = jax.random.uniform(x_key, (b,)) * (w - cw)

    yy = jnp.linspace(0.0, 1.0, h)
    xx = jnp.linspace(0.0, 1.0, w)

    def crop_one(img, y0i, x0i, chi, cwi):
        src_y = y0i + yy * (chi - 1.0)
        src_x = x0i + xx * (cwi - 1.0)
        gy, gx = jnp.meshgrid(src_y, src_x, indexing="ij")
        coords = jnp.stack([gy.ravel(), gx.ravel()])

        def sample_channel(chan):
            return jax.scipy.ndimage.map_coordinates(
                chan, coords, order=1, mode="nearest").reshape(h, w)

        return jnp.stack([sample_channel(img[..., i]) for i in range(c)],
                         axis=-1)

    return jax.vmap(crop_one)(images, y0, x0, ch, cw)


def gauss_noise(rng: jax.Array, images: jax.Array,
                var_range: Tuple[float, float] = (10.0, 50.0),
                p: float = 0.2) -> jax.Array:
    """albumentations GaussNoise analog (swin_attempt_3.py:66): additive
    gaussian noise with a per-sample variance drawn from `var_range` on the
    0-255 scale (albumentations' var_limit default), applied with
    probability `p` per sample. Input images are [0,1] floats."""
    k_apply, k_var, k_noise = jax.random.split(rng, 3)
    b = images.shape[0]
    apply = jax.random.bernoulli(k_apply, p, (b,))
    var = jax.random.uniform(k_var, (b,), minval=var_range[0],
                             maxval=var_range[1])
    std01 = jnp.sqrt(var) / 255.0
    noise = jax.random.normal(k_noise, images.shape) \
        * std01[:, None, None, None]
    # albumentations clips back to the valid range immediately (the step's
    # final clip would also catch this, but downstream transforms in other
    # pipelines must see in-range pixels)
    noisy = jnp.clip(images + noise, 0.0, 1.0)
    return jnp.where(apply[:, None, None, None], noisy, images)


def random_affine(rng: jax.Array, images: jax.Array,
                  translate: Tuple[float, float] = (0.1, 0.1),
                  scale: Tuple[float, float] = (0.9, 1.1)) -> jax.Array:
    """torchvision RandomAffine(degrees=0, translate=(0.1,0.1),
    scale=(0.9,1.1)) analog (dino_v2_gemini.py:60): per-sample zoom about
    the center plus a translation of up to translate*(W,H) pixels, bilinear,
    zero fill. `translate` is (horizontal, vertical) fractions like
    torchvision."""
    b, h, w, c = images.shape
    k_s, k_tx, k_ty = jax.random.split(rng, 3)
    s = jax.random.uniform(k_s, (b,), minval=scale[0], maxval=scale[1])
    tx = jax.random.uniform(k_tx, (b,), minval=-translate[0],
                            maxval=translate[0]) * w
    ty = jax.random.uniform(k_ty, (b,), minval=-translate[1],
                            maxval=translate[1]) * h

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def affine_one(img, si, tyi, txi):
        # inverse map: output pixel -> source pixel (shift then unzoom)
        src_y = cy + (yy - cy - tyi) / si
        src_x = cx + (xx - cx - txi) / si
        coords = jnp.stack([src_y.ravel(), src_x.ravel()])

        def sample_channel(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, coords, order=1, mode="constant", cval=0.0).reshape(h, w)

        return jnp.stack([sample_channel(img[..., i]) for i in range(c)],
                         axis=-1)

    return jax.vmap(affine_one)(images, s, ty, tx)


def build_augment(name: str):
    """Augmentation pipelines keyed by DataConfig.augment.

    Each returns (images, flip_mask) — flip_mask is all-False for pipelines
    without flips so angle-target remapping is uniform at the call site.
    """
    if name == "none":
        def none_fn(rng, images):
            return images, jnp.zeros(images.shape[0], bool)
        return none_fn

    if name == "geo_light":
        # RandomResizedCrop + flip + jitter (swin_finetuning_2.py:78-82)
        def light(rng, images):
            k1, k2, k3 = jax.random.split(rng, 3)
            x = random_resized_crop(k1, images)
            x, flip = random_flip(k2, x)
            x = color_jitter(k3, x)
            return x, flip
        return light

    if name == "geo_heavy":
        # flip + jitter + rotate15 + gauss noise, in the reference's order
        # (swin_attempt_3.py:60-69, albumentations)
        def heavy(rng, images):
            k1, k2, k3, k4 = jax.random.split(rng, 4)
            x, flip = random_flip(k1, images)
            x = color_jitter(k2, x)
            x = random_rotate(k3, x, 15.0)
            x = gauss_noise(k4, x)
            return x, flip
        return heavy

    if name == "angle_rot":
        # rotation-heavy pipeline for angle nets (dino_v2_gemini.py:57-62):
        # RandomRotation(45) -> RandomAffine(translate/scale) -> ColorJitter;
        # NOTE image rotation here does NOT remap the heading target, same
        # as the reference (rotation around the optical axis changes roll,
        # not heading)
        def rot(rng, images):
            k1, k2, k3 = jax.random.split(rng, 3)
            x = random_rotate(k1, images, 45.0)
            x = random_affine(k2, x)
            x = color_jitter(k3, x)
            return x, jnp.zeros(images.shape[0], bool)
        return rot

    raise ValueError(f"unknown augment pipeline {name!r}")
