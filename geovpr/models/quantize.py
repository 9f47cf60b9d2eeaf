"""Post-training quantization for the int8 serving path.

`quantize_for_serving` turns a trained model + variables into variables
carrying a "quant" collection (int8 MLP kernels, per-out-channel weight
scales, static per-tensor activation scales, f32 bias copies) that the
``Mlp(int8=True)`` path consumes. The f32 "params" stay untouched — the
checkpoint remains the source of truth and the quant collection is a
derived, re-creatable artifact.

Calibration: one (or more) representative batches run through the model
built with ``calibrate=True``; each Mlp sows the amax of its input and of
its activation output into the "quant_calib" collection. Static scales =
max over calibration batches / 127 (per-tensor symmetric). This is the
standard PTQ recipe; dynamic per-batch scales were measured to cost two
extra full activation passes per matmul (docs/DESIGN.md).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from geovpr.ops.quant import quantize_weight


def _walk(calib: dict, params: dict, out: dict):
    """Recurse through the sown calib tree; a node holding a_in/a_mid is an
    Mlp module scope, a node holding attn_x/attn_ctx is a transformer block
    scope with quantizable attention projections — emit quant entries from
    the params subtree at the same path."""
    if "a_in" in calib:
        a_in = float(np.max(np.asarray(calib["a_in"])))
        a_mid = float(np.max(np.asarray(calib["a_mid"])))
        w1q, s1 = quantize_weight(params["fc1"]["kernel"])
        w2q, s2 = quantize_weight(params["fc2"]["kernel"])
        out["a_in_scale"] = jnp.float32(a_in / 127.0 + 1e-12)
        out["a_mid_scale"] = jnp.float32(a_mid / 127.0 + 1e-12)
        out["fc1_kernel_q"] = w1q
        out["fc1_kernel_scale"] = s1
        out["fc1_bias"] = jnp.asarray(params["fc1"]["bias"], jnp.float32)
        out["fc2_kernel_q"] = w2q
        out["fc2_kernel_scale"] = s2
        out["fc2_bias"] = jnp.asarray(params["fc2"]["bias"], jnp.float32)
        return
    if "a_tokens" in calib:
        # SALAD head scope: the two token-wide fc1 matmuls share one input
        # (geovpr/models/salad.py SaladHead) and so one activation scale
        a_t = float(np.max(np.asarray(calib["a_tokens"])))
        out["a_tokens_scale"] = jnp.float32(a_t / 127.0 + 1e-12)
        for prefix in ("feat_fc1", "score_fc1"):
            wq, ws = quantize_weight(params[prefix]["kernel"])
            out[f"{prefix}_kernel_q"] = wq
            out[f"{prefix}_kernel_scale"] = ws
            out[f"{prefix}_bias"] = jnp.asarray(params[prefix]["bias"],
                                                jnp.float32)
        return
    if "attn_x" in calib:
        # attention projections: qkv kernels concatenated column-wise in the
        # q|k|v order the fused kernel expects (pallas_mhsa)
        ap = params["attn"]
        wqkv = np.concatenate([np.asarray(ap[k]["kernel"], np.float32)
                               for k in ("query", "key", "value")], axis=1)
        wq, sq = quantize_weight(wqkv)
        woq, so = quantize_weight(ap["proj"]["kernel"])
        out["attn_a_x"] = jnp.float32(
            float(np.max(np.asarray(calib["attn_x"]))) / 127.0 + 1e-12)
        out["attn_a_ctx"] = jnp.float32(
            float(np.max(np.asarray(calib["attn_ctx"]))) / 127.0 + 1e-12)
        # int8-score / int8-PV scales (INT8_QK_SCORES / INT8_PV): q/k/v
        # post-projection amax
        out["attn_a_q"] = jnp.float32(
            float(np.max(np.asarray(calib["attn_q"]))) / 127.0 + 1e-12)
        out["attn_a_k"] = jnp.float32(
            float(np.max(np.asarray(calib["attn_k"]))) / 127.0 + 1e-12)
        out["attn_a_v"] = jnp.float32(
            float(np.max(np.asarray(calib["attn_v"]))) / 127.0 + 1e-12)
        out["attn_wqkv_q"] = wq
        out["attn_wqkv_scale"] = sq
        out["attn_wo_q"] = woq
        out["attn_wo_scale"] = so
    for key, sub in calib.items():
        if isinstance(sub, dict):
            _walk(sub, params[key], out.setdefault(key, {}))


def quantize_for_serving(model, variables: dict,
                         calib_batches: Sequence[Any]) -> dict:
    """Build the "quant" collection for ``model`` (any model whose Mlp
    modules accept int8/calibrate — DinoV2, DinoV2Salad, Swin).

    Args:
      model: the flax module the variables belong to (int8 flags off or on
        — a calibrate=True clone is used internally).
      variables: {"params": ...} (+ any other collections) to quantize.
      calib_batches: iterable of image batches for activation-range
        calibration (one representative batch is usually enough).
    Returns: variables dict with the "quant" collection added.
    """
    # calibration must run the f32/bf16 path (the int8 path would read the
    # not-yet-built quant collection), so the int8 flags are forced off here
    # (named `int8_mlp`/`int8_attn` on backbones, `int8` on a bare Mlp)
    off = {name: False for name in ("int8_mlp", "int8_attn", "int8")
           if hasattr(model, name)}
    calib_model = model.clone(calibrate=True, **off)

    # jitted: an eager apply dispatches hundreds of ops one-by-one, which
    # costs minutes through a remote-device tunnel (measured 227 s for a
    # 12-block backbone at B=8 vs ~60 s compile + <1 s run jitted)
    @jax.jit
    def _calib(v, images):
        _, st = calib_model.apply(v, images, mutable=["quant_calib"])
        return st["quant_calib"]

    amax: dict | None = None
    for images in calib_batches:
        tree = jax.device_get(_calib(variables, images))
        amax = tree if amax is None else _merge_max(amax, tree)
    if amax is None:
        raise ValueError("calib_batches is empty")

    quant: dict = {}
    _walk(amax, variables["params"], quant)
    if not quant:
        raise ValueError(
            "no Mlp modules sowed calibration stats — does the model "
            "thread calibrate=True into its Mlp layers?")
    return {**variables, "quant": quant}


def _merge_max(a, b):
    if isinstance(a, dict):
        return {k: _merge_max(a[k], b[k]) for k in a}
    # sown leaves are tuples of arrays
    return tuple(jnp.maximum(x, y) for x, y in zip(a, b))
