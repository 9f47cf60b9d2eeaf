"""PRNG plumbing.

The reference seeds only in one of its 22 scripts
(`angle_prediction/dinov2salad/dino_v2_gemini.py:40-45` — torch / numpy /
cudnn.deterministic). Here every source of randomness flows from one
`jax.random.PRNGKey`, split by named streams so adding a consumer never
perturbs the others.
"""

from __future__ import annotations

import jax


class PRNGSeq:
    """Named, order-independent PRNG stream factory.

    >>> rng = PRNGSeq(0)
    >>> params_key = rng["params"]
    >>> dropout_key = rng["dropout"]

    Keys are derived with `jax.random.fold_in` over a stable hash of the
    stream name, so `rng["dropout"]` is identical no matter how many other
    streams were requested first.
    """

    def __init__(self, seed: int):
        self._root = jax.random.PRNGKey(seed)
        self._counters: dict[str, int] = {}

    @staticmethod
    def _stable_hash(name: str) -> int:
        # Python's hash() is salted per-process; use a deterministic FNV-1a.
        h = 0xCBF29CE484222325
        for byte in name.encode():
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h & 0x7FFFFFFF

    def __getitem__(self, name: str) -> jax.Array:
        return jax.random.fold_in(self._root, self._stable_hash(name))

    def next(self, name: str) -> jax.Array:
        """A fresh key each call within a named stream (for per-step keys)."""
        count = self._counters.get(name, 0)
        self._counters[name] = count + 1
        return jax.random.fold_in(self[name], count)
