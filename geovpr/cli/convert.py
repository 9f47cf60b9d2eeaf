"""Checkpoint conversion entry point: torch/HF/hub state_dict -> flax msgpack.

    python -m geovpr.cli.convert --family swin --variant base-384 \
        swin_base.pth swin_base.msgpack

Every reference script starts from pretrained torch weights
(`swin_attempt_2.py:117` HF SwinModel; `dinov2salad_finetuning.py:19`
torch.hub serizba/salad; `efficientnet_finetuning.py:53` torchvision;
`convnext_finetuning.py:58` HF ConvNext; `dinov2salad_finetuning_2.py:117`
HF Dinov2) — this command turns any of those checkpoint files into the
msgpack `cli/train.py --pretrained` / RegressionModel `--variables` consume,
auto-selecting the right converter per family and validating every converted
array against the model's real parameter tree (names AND shapes) before
writing.
"""

from __future__ import annotations

import argparse
import json


FAMILIES = ("swin", "dinov2", "dinov2_facebook", "dinov2_salad",
            "convnext", "efficientnet")


def load_state_dict(path: str) -> dict:
    """Read a checkpoint file into a flat torch-style state_dict.

    Accepts raw state_dicts, full torch checkpoints (`model_state_dict` /
    `state_dict` wrappers, as the reference writes at swin_attempt_2.py:
    239-247), and `.safetensors` when that library is present. `module.`
    DataParallel prefixes are stripped.
    """
    if path.endswith(".safetensors"):
        try:
            from safetensors import safe_open
        except ImportError as e:  # not in the baked image — torch files work
            raise SystemExit("safetensors is not available in this "
                             "environment; convert from a torch .pth/.bin "
                             "file instead") from e
        with safe_open(path, framework="np") as f:
            sd = {k: f.get_tensor(k) for k in f.keys()}
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        for wrapper in ("model_state_dict", "state_dict", "model"):
            if isinstance(sd, dict) and wrapper in sd \
                    and isinstance(sd[wrapper], dict):
                sd = sd[wrapper]
                break
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    # HF files carry the bare model tree; hub/torchvision sometimes prefix
    # with the top module name — leave detection to the converters, but drop
    # a uniform leading "model." if every key has it
    if sd and all(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    return sd


def convert(family: str, variant: str, state_dict: dict,
            image_size: int = 0) -> dict:
    """Dispatch to the right converter in geovpr.models.convert_torch."""
    from geovpr.models import convert_torch as ct

    if family == "swin":
        from geovpr.models.swin import SWIN_VARIANTS
        return ct.convert_swin_hf(state_dict,
                                  depths=SWIN_VARIANTS[variant]["depths"])
    if family == "convnext":
        from geovpr.models.convnext import CONVNEXT_VARIANTS
        return ct.convert_convnext_hf(
            state_dict, depths=CONVNEXT_VARIANTS[variant]["depths"])
    if family in ("dinov2", "dinov2_facebook", "dinov2_salad"):
        from geovpr.models.dinov2 import DINOV2_VARIANTS
        num_layers = DINOV2_VARIANTS[variant]["num_layers"]
        grid = (image_size or 224) // 14
        if family == "dinov2_salad":
            return ct.convert_salad_hub(state_dict, num_layers=num_layers,
                                        target_grid=grid)
        # auto-detect layout: HF Dinov2Model vs facebookresearch ViT
        # (fused qkv, `blocks.N.*`) — the hub SALAD backbone's format
        if family == "dinov2_facebook" or not any(
                k.startswith("encoder.layer.") for k in state_dict):
            return ct.convert_dinov2_facebook(
                state_dict, num_layers=num_layers, target_grid=grid)
        return ct.convert_dinov2_hf(state_dict, num_layers=num_layers,
                                    target_grid=grid)
    if family == "efficientnet":
        # torchvision layout starts at features.*; HF at embeddings.*
        if any(k.startswith("features.") for k in state_dict):
            return ct.convert_efficientnet_b0(state_dict)
        return ct.convert_efficientnet_hf(state_dict)
    raise ValueError(f"unknown family {family!r}; known: {FAMILIES}")


def _default_image_size(family: str, variant: str) -> int:
    """The resolution a (family, variant) is built for when the caller
    doesn't pass one. Swin variants FIX their resolution (window
    partitioning) — defaulting those to 224 made `convert --family swin
    --variant base-384` unrunnable without an extra flag."""
    if family == "swin":
        from geovpr.models.swin import SWIN_VARIANTS
        return SWIN_VARIANTS[variant]["image_size"]
    return 224


def validate(family: str, variant: str, variables: dict,
             image_size: int = 0) -> dict:
    """Check every converted array exists in the real model tree with the
    right shape (via the same _merge_pretrained the train path uses), and
    report model parameters the checkpoint did NOT cover.

    Returns {"covered": n, "uncovered": [paths...]}.
    """
    import jax
    import jax.numpy as jnp

    from geovpr.core.config import ModelConfig
    from geovpr.models import build_backbone
    from geovpr.train.state import _merge_pretrained

    size = image_size or _default_image_size(family, variant)
    # layout aliases share one model family in the registry
    registry_family = {"dinov2_facebook": "dinov2"}.get(family, family)
    cfg = ModelConfig(family=registry_family, variant=variant,
                      image_size=size, use_pallas=False)
    backbone = build_backbone(cfg, dtype=jnp.float32)
    shapes = jax.eval_shape(backbone.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 3), jnp.float32))
    # raises on unknown keys / shape mismatches
    for coll in variables:
        _merge_pretrained(dict(shapes.get(coll, {})), variables[coll])

    def paths(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                yield from paths(v, p)
            else:
                yield p

    covered = set()
    model_paths = set()
    for coll in ("params", "batch_stats"):
        covered |= {f"{coll}:{p}" for p in paths(variables.get(coll, {}))}
        model_paths |= {f"{coll}:{p}" for p in paths(dict(shapes.get(coll, {})))}
    uncovered = sorted(model_paths - covered)
    return {"covered": len(covered), "uncovered": uncovered}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="torch .pth/.pt/.bin checkpoint (raw "
                               "state_dict or reference-style wrapper)")
    p.add_argument("dst", help="output flax msgpack path")
    p.add_argument("--family", required=True, choices=FAMILIES)
    p.add_argument("--variant", required=True,
                   help="e.g. base-384 (swin), base-14 (dinov2), b0, "
                        "base-224 (convnext)")
    p.add_argument("--image-size", type=int, default=0,
                   help="target input resolution (DINOv2 position "
                        "embeddings are bicubically resized to its patch "
                        "grid at import; default: family default)")
    p.add_argument("--allow-uncovered", action="store_true",
                   help="write the file even if some model parameters were "
                        "not present in the checkpoint (they stay randomly "
                        "initialized at load)")
    args = p.parse_args(argv)

    # conversion is pure host work (shape tracing + one tiny pos-embed
    # resize): run on the CPU backend so the CLI neither waits ~20s for TPU
    # init nor fails where the TPU plugin is unavailable
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (e.g. called from a test process)

    from flax.serialization import msgpack_serialize

    sd = load_state_dict(args.src)
    variables = convert(args.family, args.variant, sd,
                        image_size=args.image_size)
    report = validate(args.family, args.variant, variables,
                      image_size=args.image_size)
    if report["uncovered"] and not args.allow_uncovered:
        raise SystemExit(
            f"checkpoint leaves {len(report['uncovered'])} model parameters "
            f"uninitialized (e.g. {report['uncovered'][:5]}); pass "
            f"--allow-uncovered to write anyway")

    with open(args.dst, "wb") as f:
        f.write(msgpack_serialize(variables))
    print(json.dumps({"dst": args.dst, "family": args.family,
                      "variant": args.variant,
                      "arrays": report["covered"],
                      "uncovered": report["uncovered"]}))


if __name__ == "__main__":
    main()
