"""GEOVPR_COMPILE_CACHE wires the JAX persistent compilation cache.

The reference recompiles nothing (eager torch); here every fresh process
pays a full XLA compile unless the persistent cache is enabled. The knob
lives in geovpr/__init__.py so one env var covers every CLI/bench/library
entry point. Subprocess tests because the hook runs at package import;
each subprocess pins itself to CPU via the jax_platforms config knob (the
axon TPU plugin in this image ignores the JAX_PLATFORMS env var — see
conftest.py).
"""

import os
import subprocess
import sys

_FORCE_CPU = "import jax; jax.config.update('jax_platforms', 'cpu'); "

_PROBE = (
    "import geovpr; " + _FORCE_CPU +
    "import sys; sys.stdout.write(str(jax.config.jax_compilation_cache_dir))"
)


def _run(env_extra, prog=_PROBE):
    env = {k: v for k, v in os.environ.items()
           if k != "GEOVPR_COMPILE_CACHE"}
    env.update(env_extra)
    out = subprocess.run([sys.executable, "-c", prog], env=env,
                         capture_output=True, text=True, check=True)
    return out.stdout.strip()


def test_env_set_enables_cache(tmp_path):
    cache = tmp_path / "xla-cache"
    got = _run({"GEOVPR_COMPILE_CACHE": str(cache)})
    assert got == str(cache)


def test_env_unset_leaves_default():
    got = _run({})
    assert got in ("None", "")


def test_cache_populates_and_hits(tmp_path):
    # run a compile-worthy jit twice in separate processes; the second
    # must find cache entries from the first (we assert population +
    # successful reuse-path execution, not wall time — CPU compiles are
    # fast enough that timing would flake)
    cache = tmp_path / "xla-cache"
    prog = (
        "import geovpr; " + _FORCE_CPU +
        "import jax.numpy as jnp; "
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0); "
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1); "
        "x = jnp.ones((256, 256), jnp.float32); "
        "print(jax.jit(lambda a: (a @ a.T).sum())(x))"
    )
    env_extra = {"GEOVPR_COMPILE_CACHE": str(cache)}
    first = _run(env_extra, prog)
    assert "16777216" in first
    entries = list(cache.iterdir())
    assert entries, "first process wrote no cache entries"
    second = _run(env_extra, prog)
    assert "16777216" in second
