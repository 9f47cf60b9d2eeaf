"""Lane-packing helpers for small-head attention cores (Pallas TPU).

At head dims below the 128-lane MXU tile, per-head core matmuls starve
the MXU contraction depth (dh=32 fills a quarter; dh=64 half). The fix
shared by the Swin window kernels (`pallas_swin_block`) and the ViT MHSA
kernels (`pallas_mhsa`): ride g = 128/dh heads on ONE matmul by making
the stationary operand block-diagonal — row band j carries head j's
slab with every lane outside head j zeroed. Cross-head products are then
EXACT zeros (x + 0 == x keeps the packed result bit-identical under
sequential MXU accumulation), one 128-deep contraction computes g heads'
dh-deep products, and the issued core-op count drops g-fold.

The operand assembly is g masked VPU copies of an (n, 128) slab
(~1% of the packed matmul's cycles) — NOT a selector matmul, which is
what sank earlier head-packing attempts (docs/DESIGN.md).

Measured: packing wins on TRAINING kernels (Swin-B-384 step 169 → 141 ms
at B=32) and LOSES on serving forwards (no stored-probability planes to
amortize the assembly; int8 eval 59.6 → 63.0 ms) — gate accordingly in
the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def band_mask(g: int, n: int, dh: int):
    """(g*n, g*dh) block-diag selector: row band j keeps only head-j
    lanes. Built from iotas in-kernel — no HBM input, Mosaic folds it to
    vselects."""
    band = jax.lax.broadcasted_iota(jnp.int32, (g * n, g * dh), 0) // n
    lane = jax.lax.broadcasted_iota(jnp.int32, (g * n, g * dh), 1) // dh
    return band == lane


def block_diag(t, g: int, bmask):
    """(n, g*dh) head-interleaved slab -> (g*n, g*dh) block-diagonal
    operand: row band j = t with every lane outside head j zeroed (see
    module docstring for why the zeros are exact)."""
    tiled = jnp.concatenate([t] * g, axis=0)
    return jnp.where(bmask, tiled, jnp.zeros_like(tiled))


def per_band(x, n: int, g: int, reduce_fn):
    """Per-head-band lane reduction of a packed (rows, g*n) plane,
    broadcast back to the packed layout."""
    return jnp.concatenate(
        [jnp.broadcast_to(reduce_fn(x[:, j * n:(j + 1) * n]),
                          (x.shape[0], n)) for j in range(g)], axis=1)
