"""Descriptor-retrieval entry point — the BASELINE north-star capability the
reference never implemented (it consumed SALAD descriptors only as MLP input,
`dinov2salad/dinov2salad_finetuning.py:35-36`; no nearest-neighbor code
exists anywhere in the snapshot, SURVEY.md §0).

    python -m geovpr.cli.retrieve \
        --gallery-csv labels_train.csv --query-csv labels_val.csv \
        --image-root dataset/images --out-dir out \
        [--variables salad.msgpack] [--top-k 5] [--positive-radius 25] \
        [--save-index gallery.npz]

Build-once/serve-many: `--save-index` persists the built index (int8 rows +
scales when --int8, plus gallery filenames/latlon) to one .npz; later runs
pass `--load-index gallery.npz` instead of --gallery-csv and skip gallery
extraction entirely.

Extracts DINOv2+SALAD descriptors for gallery and queries (jit-batched,
bf16), builds an HBM-resident index sharded over the mesh's data axis,
searches cosine top-k on device, reports proximity Recall@k (a query is
solved if any top-k match lies within --positive-radius meters — the labels
are a meters-scale grid), and writes `retrieval_matches.csv`.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def extract_descriptors(model, variables, source, batch_size: int,
                        mesh=None) -> np.ndarray:
    """Jit-batched descriptor extraction over an image source."""
    import jax
    import jax.numpy as jnp

    from geovpr.data.pipeline import iterate_batches, prefetch_to_device
    from geovpr.data.transforms import normalize

    @jax.jit
    def step(v, images):
        x = normalize(images)
        return model.apply(v, x, train=False, deterministic=True).pooled

    if mesh is not None and batch_size % mesh.devices.size != 0:
        mesh = None  # batch can't shard evenly; run replicated
    n = len(source)
    out = None
    for batch in prefetch_to_device(iterate_batches(source, batch_size),
                                    mesh):
        idx = batch.pop("_indices")
        desc = np.asarray(step(variables, batch["image"]), np.float32)
        if out is None:
            out = np.zeros((n, desc.shape[-1]), np.float32)
        out[idx] = desc[:len(idx)]
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gallery-csv", default="",
                   help="gallery manifest (required unless --load-index)")
    p.add_argument("--query-csv", required=True)
    p.add_argument("--save-index", default="",
                   help="persist the built gallery index (+ filenames and "
                        "latlon metadata) to this .npz for build-once/"
                        "serve-many")
    p.add_argument("--load-index", default="",
                   help="serve from a previously saved index instead of "
                        "extracting gallery descriptors")
    p.add_argument("--image-root", required=True)
    p.add_argument("--out-dir", default="retrieval_out")
    p.add_argument("--variables", default="",
                   help="flax msgpack of DinoV2Salad variables (e.g. from "
                        "convert_salad_hub); random init if omitted")
    p.add_argument("--variant", default="base-14",
                   help="DINOv2 variant (base-14 | small-14 | large-14)")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--positive-radius", type=float, default=25.0)
    p.add_argument("--approx", type=float, default=0.0,
                   help="serving top-k mode: use the TPU-native "
                   "lax.approx_max_k at this recall_target instead of "
                   "exact top-k — measured 1.94x search throughput at "
                   "0.99 with 0.9953 top-10 overlap on a 1M x 8448 int8 "
                   "gallery (benches/RETRIEVAL_OPT_r05.log)")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 serving path: quantize the backbone MLPs with "
                        "static activation scales calibrated on the first "
                        "gallery batch (~0.999 descriptor cosine vs bf16, "
                        "measured in bench.py --int8)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from geovpr.data.manifest import load_manifest
    from geovpr.data.pipeline import ImageFolderSource
    from geovpr.models.salad import DinoV2Salad
    from geovpr.parallel import create_mesh
    from geovpr.retrieval.index import (DescriptorIndex, load_index,
                                        recall_at_k_radius, save_index)

    if not args.gallery_csv and not args.load_index:
        p.error("either --gallery-csv or --load-index is required")
    os.makedirs(args.out_dir, exist_ok=True)
    gallery = (load_manifest(args.gallery_csv, args.image_root)
               if args.gallery_csv else None)
    queries = load_manifest(args.query_csv, args.image_root)

    model = DinoV2Salad(variant=args.variant, image_size=args.image_size,
                        int8_mlp=args.int8, int8_attn=args.int8,
                        dtype=jnp.bfloat16)
    if args.variables:
        from flax.serialization import msgpack_restore
        with open(args.variables, "rb") as f:
            variables = msgpack_restore(f.read())
    else:
        print("WARNING: no --variables given; using random init "
              "(descriptors will not be meaningful)")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.image_size, args.image_size, 3)))

    if args.int8:
        from geovpr.data.pipeline import iterate_batches
        from geovpr.data.transforms import normalize
        from geovpr.models.quantize import quantize_for_serving

        calib_manifest = gallery if gallery is not None else queries
        calib_src = ImageFolderSource(
            paths=calib_manifest.paths(),
            targets=np.asarray(calib_manifest.latlon),
            image_size=args.image_size, filenames=calib_manifest.filenames)
        batch = next(iter(iterate_batches(calib_src, args.batch_size)))
        # calibrate on what the model actually sees: normalized images
        calib = normalize(jnp.asarray(batch["image"]))
        variables = quantize_for_serving(model, variables, [calib])

    def source(m):
        return ImageFolderSource(paths=m.paths(),
                                 targets=np.asarray(m.latlon),
                                 image_size=args.image_size,
                                 filenames=m.filenames)

    mesh = create_mesh()
    if args.load_index:
        index, meta = load_index(args.load_index, mesh)
        gallery_filenames = (list(meta["filenames"])
                             if "filenames" in meta else
                             [f"row_{i}" for i in range(index.size)])
        gallery_latlon = meta.get("latlon")
    else:
        g_desc = extract_descriptors(model, variables, source(gallery),
                                     args.batch_size, mesh)
        # --int8 also quantizes the INDEX: int8 rows + per-row scales (4x
        # HBM capacity, int8 MXU score matmul) — one serving-fidelity knob
        index = DescriptorIndex(dim=g_desc.shape[-1], mesh=mesh,
                                quantize=args.int8).build(g_desc)
        gallery_filenames = gallery.filenames
        gallery_latlon = np.asarray(gallery.latlon, np.float32)
        if args.save_index:
            save_index(index, args.save_index,
                       filenames=gallery_filenames, latlon=gallery_latlon)

    if args.approx:
        index.topk_method = "approx"
        index.approx_recall = args.approx
    q_desc = extract_descriptors(model, variables, source(queries),
                                 args.batch_size, mesh)
    scores, nbrs = index.search(jnp.asarray(q_desc), k=args.top_k)
    scores, nbrs = np.asarray(scores), np.asarray(nbrs)

    recalls = {}
    if gallery_latlon is not None:
        recalls = {
            f"recall@{k}": float(recall_at_k_radius(
                jnp.asarray(nbrs), jnp.asarray(queries.latlon, jnp.float32),
                jnp.asarray(gallery_latlon, jnp.float32),
                args.positive_radius, k))
            for k in (1, min(5, args.top_k), args.top_k)
        }

    from geovpr.pipeline.export import write_retrieval_matches_csv
    path = os.path.join(args.out_dir, "retrieval_matches.csv")
    write_retrieval_matches_csv(path, queries.filenames, gallery_filenames,
                                nbrs, scores)

    out = {"gallery_size": index.size,
           "num_queries": len(queries.filenames),
           **recalls, "matches_csv": path}
    if args.save_index:
        out["saved_index"] = args.save_index
    print(json.dumps(out))


if __name__ == "__main__":
    main()
