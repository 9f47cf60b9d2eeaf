"""Mixed-precision dtype policy.

The reference runs fp32 eager PyTorch throughout (it never sets a dtype).
On TPU the MXU wants bfloat16 activations with fp32 accumulation, so the
framework carries an explicit policy instead of a global default:

- ``param_dtype``   dtype parameters are stored in (fp32 by default so the
                    optimizer state stays full-precision),
- ``compute_dtype`` dtype activations/matmuls are computed in (bf16 on TPU),
- ``output_dtype``  dtype regression heads emit (fp32 so losses/metrics and
                    CSV export keep full precision).

Modules cast inputs to ``compute_dtype`` at their boundary and cast the final
head output to ``output_dtype``; XLA keeps accumulation in fp32 via
``preferred_element_type`` on the matmuls.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    @classmethod
    def full_precision(cls) -> "DTypePolicy":
        """fp32 everywhere — used for parity tests against fp32 references."""
        return cls(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                   output_dtype=jnp.float32)

    @classmethod
    def tpu_default(cls) -> "DTypePolicy":
        return cls()

    def cast_input(self, x):
        return x.astype(self.compute_dtype)

    def cast_output(self, x):
        return x.astype(self.output_dtype)
