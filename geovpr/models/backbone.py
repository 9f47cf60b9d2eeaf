"""Common backbone interface.

Every backbone maps NHWC images to a `BackboneOutput`:

- ``pooled``: (B, D) global feature — what regression heads consume. Which
  pooling produced it is the module's `pooling` knob (the reference uses the
  HF pooler for Swin v1-v3 (`swin_attempt_2.py:125`), mean-pool of
  last_hidden_state for Swin v4 (`swin_attempt_3.py:164-170`), the CLS token
  for DINOv2 (`dino_angle_finetuning.py:45`), and global avg-pool for
  EfficientNet/ConvNeXt).
- ``tokens``: (B, N, D) final token/feature-map sequence (ViTs) or flattened
  spatial features (convnets) — what the SALAD aggregation head consumes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax


class BackboneOutput(NamedTuple):
    pooled: jax.Array            # (B, D)
    tokens: Optional[jax.Array]  # (B, N, D) or None
    cls: Optional[jax.Array] = None  # (B, D) CLS token where one exists
