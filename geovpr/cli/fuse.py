"""Fused final-submission export — the reference's missing
`final_csv_generators/` stage (README.md:12 documents it; the directory is
absent from the snapshot, SURVEY.md §0). Its outputs are known from the
committed artifacts: sorted `test_predictions_sorted.csv` (geopose) and
`test_pred.csv` (angle); the BASELINE north star additionally fuses
descriptor retrieval into the same batched pass.

    python -m geovpr.cli.fuse \
        --geopose-preset swin_b384_gemini2 --geopose-run runs/training_g2_x \
        --angle-preset efficientnet_sincos_gemini --angle-run runs/training_a_y \
        --gallery-csv labels_train.csv --image-root dataset/images \
        --salad-variables salad_hub.msgpack \
        --test-dir dataset/test --out-dir final_csvs

ONE decode feeds ONE jitted forward per batch
(`geovpr.pipeline.fused.FusedPipeline`): the stream is decoded at the
largest head resolution and each head gets a device-side bilinear resize.
When the angle head uses the Resize(256)+CenterCrop(224) eval transform,
the decode additionally emits that exact aspect-preserving view
(`DualGeometrySource`) so fused predictions match cli/evaluate's
bit-for-bit geometry on non-square photos. Any component may be omitted.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _trainer_variables(trainer) -> dict:
    v = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        v["batch_stats"] = trainer.state.batch_stats
    return v


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--geopose-preset", default="")
    p.add_argument("--geopose-run", default="")
    p.add_argument("--angle-preset", default="")
    p.add_argument("--angle-run", default="")
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--test-dir", required=True)
    p.add_argument("--out-dir", default="final_csvs")
    p.add_argument("--batch-size", type=int, default=0,
                   help="fused batch size (default: the largest component "
                        "preset's batch size)")
    # retrieval component (north-star fusion: descriptors + top-k matches in
    # the same pass)
    p.add_argument("--gallery-csv", default="",
                   help="manifest of gallery images to index; enables the "
                        "retrieval component (requires --image-root)")
    p.add_argument("--save-index", default="",
                   help="persist the built gallery index (+ filenames) to "
                        "this .npz (see geovpr.retrieval.index.save_index)")
    p.add_argument("--load-index", default="",
                   help="enable the retrieval component from a previously "
                        "saved index instead of --gallery-csv")
    p.add_argument("--image-root", default="",
                   help="image root for --gallery-csv rows")
    p.add_argument("--salad-variables", default="",
                   help="flax msgpack of DinoV2Salad variables (from "
                        "`geovpr.cli.convert --family dinov2_salad`); random "
                        "init if omitted")
    p.add_argument("--salad-variant", default="base-14")
    p.add_argument("--salad-image-size", type=int, default=224)
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--approx", type=float, default=0.0,
                   help="retrieval serving mode: lax.approx_max_k at this "
                   "recall_target instead of exact top-k (1.94x at 1M, "
                   "benches/RETRIEVAL_OPT_r05.log)")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 serving path for every component whose family "
                        "supports it (swin/dinov2/dinov2_salad; conv "
                        "families fall back to bf16 with a note). Static "
                        "scales calibrated on the first gallery/test batch; "
                        "~0.9999 output cosine vs bf16")
    args = p.parse_args(argv)

    geo = bool(args.geopose_preset and args.geopose_run)
    ang = bool(args.angle_preset and args.angle_run)
    retr = bool(args.gallery_csv or args.load_index)
    if bool(args.geopose_preset) != bool(args.geopose_run) or \
            bool(args.angle_preset) != bool(args.angle_run):
        raise SystemExit("--geopose-preset/--geopose-run (and the angle "
                         "pair) must be given together")
    if args.gallery_csv and not args.image_root:
        raise SystemExit("--gallery-csv requires --image-root")
    if not geo and not ang and not retr:
        raise SystemExit("need at least one component: geopose "
                         "(--geopose-preset/--geopose-run), angle "
                         "(--angle-preset/--angle-run), or retrieval "
                         "(--gallery-csv)")

    import jax
    import jax.numpy as jnp

    from geovpr.cli.common import load_trained
    from geovpr.data.manifest import list_test_images, load_manifest
    from geovpr.data.pipeline import DualGeometrySource, ImageFolderSource
    from geovpr.parallel import create_mesh
    from geovpr.pipeline.fused import FusedPipeline
    from geovpr.retrieval.index import DescriptorIndex

    os.makedirs(args.out_dir, exist_ok=True)
    names = list_test_images(args.test_dir)
    paths = [os.path.join(args.test_dir, n) for n in names]

    mesh = create_mesh()
    pipe = FusedPipeline(top_k=args.top_k, mesh=mesh)
    sizes = []
    batch_sizes = []

    def _maybe_int8(trainer, cfg, component: str):
        """w8a8-quantize a restored component for serving (calibrating on
        the first test batch at the component's eval geometry); bf16
        passthrough for EfficientNet, which has no int8 path."""
        model = trainer.model
        variables = _trainer_variables(trainer)
        if not args.int8:
            return model, variables
        from geovpr.models.registry import supports_int8
        if not supports_int8(cfg.model.family):
            print(f"note: --int8 skipped for the {component} component "
                  f"(family {cfg.model.family!r} has no int8 path)")
            return model, variables
        from geovpr.data.pipeline import iterate_batches
        from geovpr.data.transforms import normalize
        from geovpr.models.quantize import quantize_for_serving

        calib_source = ImageFolderSource(
            paths=paths, targets=np.zeros((len(names), 1), np.float32),
            image_size=cfg.data.image_size, filenames=names,
            resize_to=cfg.data.eval_resize_to)
        batch = next(iter(iterate_batches(calib_source,
                                          cfg.data.batch_size)))
        variables = quantize_for_serving(
            model, variables, [normalize(jnp.asarray(batch["image"]))])
        return model.clone(int8_mlp=True), variables

    if geo:
        trainer, cfg = load_trained(args.geopose_preset, args.geopose_run,
                                    args.checkpoint)
        pipe.geopose_model, pipe.geopose_variables = _maybe_int8(
            trainer, cfg, "geopose")
        pipe.geopose_scaler = trainer.state.scaler
        pipe.geopose_size = cfg.data.image_size
        sizes.append(cfg.data.image_size)
        batch_sizes.append(cfg.data.batch_size)

    if ang:
        from geovpr.cli.presets import objective_for
        trainer, cfg = load_trained(args.angle_preset, args.angle_run,
                                    args.checkpoint)
        pipe.angle_model, pipe.angle_variables = _maybe_int8(
            trainer, cfg, "angle")
        pipe.angle_codec = getattr(objective_for(cfg), "codec", None)
        pipe.angle_size = cfg.data.image_size
        pipe.angle_resize_to = cfg.data.eval_resize_to
        sizes.append(max(cfg.data.image_size, cfg.data.eval_resize_to))
        batch_sizes.append(cfg.data.batch_size)

    if retr:
        from geovpr.cli.retrieve import extract_descriptors
        from geovpr.models.salad import DinoV2Salad

        model = DinoV2Salad(variant=args.salad_variant,
                            image_size=args.salad_image_size,
                            int8_mlp=args.int8, int8_attn=args.int8,
                            dtype=(jnp.bfloat16
                                   if jax.default_backend() == "tpu"
                                   else jnp.float32))
        if args.salad_variables:
            from flax.serialization import msgpack_restore
            with open(args.salad_variables, "rb") as f:
                variables = msgpack_restore(f.read())
        else:
            print("WARNING: no --salad-variables given; using random init "
                  "(descriptors will not be meaningful)")
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, args.salad_image_size, args.salad_image_size,
                           3)))
        if args.load_index:
            g_source = ImageFolderSource(
                paths=paths, targets=np.zeros((len(names), 1), np.float32),
                image_size=args.salad_image_size, filenames=names)
        else:
            gallery = load_manifest(args.gallery_csv, args.image_root)
            g_source = ImageFolderSource(paths=gallery.paths(),
                                         targets=np.asarray(gallery.latlon),
                                         image_size=args.salad_image_size,
                                         filenames=gallery.filenames)
        if args.int8:
            from geovpr.data.pipeline import iterate_batches
            from geovpr.data.transforms import normalize
            from geovpr.models.quantize import quantize_for_serving

            # calibrate on gallery images, or (when serving from a saved
            # index) on the test images themselves — same camera domain
            batch = next(iter(iterate_batches(g_source,
                                              args.batch_size or 64)))
            variables = quantize_for_serving(
                model, variables, [normalize(jnp.asarray(batch["image"]))])
        pipe.descriptor_model = model
        pipe.descriptor_variables = variables
        pipe.descriptor_size = args.salad_image_size
        if args.load_index:
            from geovpr.retrieval.index import load_index
            pipe.index, meta = load_index(args.load_index, mesh)
            pipe.gallery_filenames = (
                list(meta["filenames"]) if "filenames" in meta else
                [f"row_{i}" for i in range(pipe.index.size)])
        else:
            g_desc = extract_descriptors(model, variables, g_source,
                                         batch_size=args.batch_size or 64,
                                         mesh=mesh)
            pipe.index = DescriptorIndex(dim=g_desc.shape[-1], mesh=mesh,
                                         quantize=args.int8).build(g_desc)
            pipe.gallery_filenames = gallery.filenames
            if args.save_index:
                from geovpr.retrieval.index import save_index
                save_index(pipe.index, args.save_index,
                           filenames=gallery.filenames,
                           latlon=np.asarray(gallery.latlon, np.float32))
        if args.approx and pipe.index is not None:
            # serving top-k mode (measured 1.94x at 1M x 8448 int8,
            # benches/RETRIEVAL_OPT_r05.log)
            pipe.index.topk_method = "approx"
            pipe.index.approx_recall = args.approx
        sizes.append(args.salad_image_size)
        batch_sizes.append(64)

    pipe.batch_size = args.batch_size or max(batch_sizes)
    stream_size = max(sizes)

    if ang and pipe.angle_resize_to:
        # the angle head's eval transform is short-side-resize+center-crop
        # over the ORIGINAL aspect (validation_script.py:124-129) — decode
        # once but emit that exact view alongside the square stream; a
        # square-then-device-crop approximation would change the head's
        # field of view on every non-square photo
        source = DualGeometrySource(
            paths=paths, targets=np.zeros((len(names), 1), np.float32),
            stream_size=stream_size, alt_size=pipe.angle_size,
            alt_resize_to=pipe.angle_resize_to, filenames=names)
        pipe.angle_size = 0
        pipe.angle_resize_to = 0
    else:
        source = ImageFolderSource(
            paths=paths, targets=np.zeros((len(names), 1), np.float32),
            image_size=stream_size, filenames=names)
    written = pipe.export(source, args.out_dir)

    outputs = {"num_images": len(names), "stream_size": stream_size,
               **{f"{k}_csv": v for k, v in written.items()}}
    print(json.dumps(outputs))


if __name__ == "__main__":
    main()
