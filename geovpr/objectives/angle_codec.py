"""Angle <-> sin/cos codec.

The reference has TWO inconsistent column orders (SURVEY.md §3.4 trap):

- EfficientNet family stores targets as ``[cos, sin]`` and decodes with
  ``atan2(x[:,1], x[:,0])`` (en_finetuning_gemini.py:60,221),
- Swin/DINOv2 sincos family stores ``[sin, cos]`` and decodes
  ``atan2(x[:,0], x[:,1])`` (swin_angle_finetuning_sin_cos.py:47,73;
  dino_v2_gemini.py:138).

Both are internally consistent; this module makes the order an explicit,
named, tested property so a checkpoint can never be decoded with the wrong
convention. ``cos_sin`` is the framework default (it matches the best
committed runs, MAAE 26.326 deg).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def wrap_degrees(deg: jnp.ndarray) -> jnp.ndarray:
    """Wrap any angle to [0, 360). The train manifest contains angles up to
    750 deg (SURVEY.md §2.3 row 23); scripts that train directly on degrees
    apply `% 360` to predictions (efficientnet_finetuning.py:110)."""
    return jnp.mod(deg, 360.0)


@dataclasses.dataclass(frozen=True)
class SinCosCodec:
    """Encode degrees to a 2-vector on the unit circle and decode back.

    order: "cos_sin" -> columns [cos t, sin t]; "sin_cos" -> [sin t, cos t].
    """

    order: str = "cos_sin"

    def __post_init__(self):
        if self.order not in ("cos_sin", "sin_cos"):
            raise ValueError(f"unknown codec order {self.order!r}")

    def encode(self, deg: jnp.ndarray) -> jnp.ndarray:
        rad = jnp.deg2rad(deg)
        s, c = jnp.sin(rad), jnp.cos(rad)
        pair = (c, s) if self.order == "cos_sin" else (s, c)
        return jnp.stack(pair, axis=-1)

    def decode(self, x: jnp.ndarray) -> jnp.ndarray:
        """2-vector -> degrees in [0, 360). Matches
        `(rad2deg(atan2(sin, cos)) + 360) % 360` (en_finetuning_gemini.py:221-223)."""
        if self.order == "cos_sin":
            c, s = x[..., 0], x[..., 1]
        else:
            s, c = x[..., 0], x[..., 1]
        deg = jnp.rad2deg(jnp.arctan2(s, c))
        return jnp.mod(deg + 360.0, 360.0)

    def normalize(self, x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
        """Project raw head output onto the unit circle
        (swin_angle_finetuning_sin_cos.py:62 uses F.normalize)."""
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)
        return x / norm

    def flip_horizontal(self, deg: jnp.ndarray) -> jnp.ndarray:
        """Heading remap under horizontal image flip: t -> (180 - t) mod 360
        (swin_angle_finetuning_gemini.py:59-76 — done there with a re-sampled
        flip decision; here the caller applies it iff the image was flipped)."""
        return jnp.mod(180.0 - deg, 360.0)
