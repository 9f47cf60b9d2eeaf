"""Benchmark: DINOv2-B/14 + SALAD descriptor extraction throughput.

This is the BASELINE.json headline metric: images/sec/chip for the north-star
descriptor path (target >= 5000 img/s/chip on TPU v5e). The reference
publishes no throughput numbers (BASELINE.md) — `vs_baseline` is measured
against that 5k target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N/5000}

Usage:
  python bench.py            # full bench, int8 serving config (default)
  python bench.py --bf16     # unquantized bf16 comparison number
  python bench.py --smoke    # tiny shapes (CPU-friendly sanity check)
"""

import argparse
import functools
import json
import statistics
import sys
import time


def _make_jpegs(n: int, src_hw: int, seed: int = 0):
    """Synthetic "camera" JPEGs on disk: smooth gradients + mild noise
    compress to realistic sizes (~tens of KB at 480p q90). Returns
    (paths, mean_kb); the temp dir is cleaned at exit."""
    import atexit
    import os
    import shutil
    import tempfile

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(seed)
    tmp = tempfile.mkdtemp(prefix="geovpr_bench_jpeg_")
    atexit.register(shutil.rmtree, tmp, True)
    yy, xx = np.mgrid[0:src_hw, 0:int(src_hw * 4 / 3)]
    paths = []
    for i in range(n):
        ch = ((yy * 0.9 + xx * 0.7 + i * 13) % 255).astype(np.uint8)
        arr = np.stack([ch, 255 - ch, ch // 2], -1)
        arr = np.clip(arr.astype(np.int16)
                      + rng.integers(-8, 8, arr.shape), 0,
                      255).astype(np.uint8)
        p = os.path.join(tmp, f"img_{i:05d}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    jpeg_kb = sum(os.path.getsize(p) for p in paths) / n / 1024
    return paths, jpeg_kb


def bench_input_pipeline(args):
    """--from-jpeg: sustained images/sec from encoded JPEG files -> decoded
    uint8 batch -> jax.device_put, for each host decode path (pil, native,
    cached). This is the piece `main` deliberately excludes (synthetic
    on-device images): the host side of the north-star pipeline.
    """
    import os

    import numpy as np
    import jax

    from geovpr.data.decoder import native_available
    from geovpr.data.pipeline import (
        CachedImageSource,
        ImageFolderSource,
        iterate_batches,
    )

    n = args.num_images or (64 if args.smoke else 512)
    size = 224 if not args.smoke else 56
    src_hw = args.jpeg_size or (480 if not args.smoke else 96)
    batch = args.batch or (32 if args.smoke else 64)

    rng = np.random.default_rng(0)
    paths, jpeg_kb = _make_jpegs(n, src_hw)

    def run_epochs(source, epochs):
        """Sustained decode -> assembled uint8 host batch, full passes.
        Deliberately NO per-batch device_put: H2D through the axon dev
        tunnel serializes pathologically and would hide the decode-path
        differences this mode exists to measure; the transfer leg is probed
        separately below and the reported value is min(host, h2d)."""
        rates = []
        for _ in range(epochs):
            t0 = time.perf_counter()
            got = 0
            for b in iterate_batches(source, batch):
                got += int(b["mask"].sum())
            rates.append(got / (time.perf_counter() - t0))
        return rates

    threads = args.threads or (os.cpu_count() or 1)
    results = {}
    for mode in ("pil", "native"):
        if mode == "native" and not native_available():
            results[mode] = None
            continue
        source = ImageFolderSource(
            paths=paths, targets=np.zeros((n, 1), np.float32),
            image_size=size, num_threads=threads, decoder=mode)
        results[mode] = max(run_epochs(source, 3))

    cached = CachedImageSource(ImageFolderSource(
        paths=paths, targets=np.zeros((n, 1), np.float32),
        image_size=size, num_threads=threads, decoder="native"
        if native_available() else "pil"))
    run_epochs(cached, 1)          # epoch 0 pays the decode
    results["cached"] = max(run_epochs(cached, 2))

    # H2D leg, measured once with fresh distinct buffers (repeating the same
    # buffers flatters the number: the runtime caches repeat transfers)
    bufs = [rng.integers(0, 255, (batch, size, size, 3)).astype(np.uint8)
            for _ in range(8)]
    t0 = time.perf_counter()
    jax.block_until_ready([jax.device_put(b) for b in bufs])
    h2d = 8 * batch / (time.perf_counter() - t0)

    best_mode = max((k for k, v in results.items() if v),
                    key=lambda k: results[k])
    feed = min(results[best_mode], h2d)
    print(json.dumps({
        "metric": "host_input_pipeline_throughput",
        "value": round(feed, 1),
        "unit": "images/sec",
        "vs_baseline": round(feed / 5000.0, 4),
    }))
    detail = {k: (round(v, 1) if v else None) for k, v in results.items()}
    print(f"# from-jpeg: {detail} h2d={h2d:.0f} (threads={threads}, "
          f"host_cpus={os.cpu_count()}, src={src_hw}p ~{jpeg_kb:.0f}KB, "
          f"out={size}px, n={n})", file=sys.stderr)


def bench_e2e(args):
    """--e2e: ONE sustained cold-stream number — encoded JPEG files ->
    native multi-threaded decode + resize -> double-buffered device feed
    (`prefetch_to_device`) -> on-device normalize -> int8 DINOv2-B+SALAD
    descriptors, measured end to end over a full pass (epoch-0/serving
    regime: nothing cached, every image decoded).

    The chip side alone measures ~5k img/s (`main`) and the host side
    alone ~736 img/s/core native decode (`--from-jpeg`); this mode
    measures what a user actually gets when the two must overlap,
    INCLUDING the H2D leg that `--from-jpeg` deliberately excludes.
    Tunnel caveat (quantified in the stderr breakdown): under the axon
    dev tunnel every device_put serializes through a remote RPC, so the
    e2e number here is a LOWER bound — on a locally attached v5e the H2D
    leg is PCIe DMA that prefetch overlaps with compute."""
    import os

    import numpy as np
    import jax
    import jax.numpy as jnp

    from geovpr.data.decoder import native_available
    from geovpr.data.pipeline import (ImageFolderSource, iterate_batches,
                                      prefetch_to_device)
    from geovpr.data.transforms import normalize
    from geovpr.models.salad import DinoV2Salad

    int8 = not args.bf16
    if args.smoke:
        model = DinoV2Salad(variant="small-14", image_size=56,
                            num_clusters=16, cluster_dim=32, token_dim=32,
                            int8_mlp=int8, int8_attn=int8,
                            dtype=jnp.bfloat16)
        n, batch = args.num_images or 64, args.batch or 16
    else:
        model = DinoV2Salad(variant="base-14", image_size=224,
                            int8_mlp=int8, int8_attn=int8,
                            dtype=jnp.bfloat16)
        n, batch = args.num_images or 2048, args.batch or 128
    size = model.image_size
    src_hw = args.jpeg_size or (480 if not args.smoke else 96)
    threads = args.threads or (os.cpu_count() or 1)

    paths, jpeg_kb = _make_jpegs(n, src_hw)
    decoder = "native" if native_available() else "pil"
    source = ImageFolderSource(paths=paths,
                               targets=np.zeros((n, 1), np.float32),
                               image_size=size, num_threads=threads,
                               decoder=decoder)
    if args.cached:
        # --e2e --cached: the steady state every multi-epoch train run and
        # RAM-resident serving deployment sees — epoch 0 pays the decode
        # into the RAM cache OFF the clock, then sustained passes measure
        # cached feed -> prefetched H2D -> chip. The cold number below this
        # one in DESIGN.md is the epoch-0/streaming regime.
        from geovpr.data.pipeline import CachedImageSource
        source = CachedImageSource(source)
        for _ in iterate_batches(source, batch):
            pass

    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, size, size, 3)))
    if int8:
        from geovpr.models.quantize import quantize_for_serving

        calib = jax.random.normal(jax.random.PRNGKey(2),
                                  (min(batch, 64), size, size, 3),
                                  jnp.bfloat16)
        variables = quantize_for_serving(model, variables, [calib])

    @jax.jit
    def extract(v, u8):
        return model.apply(v, normalize(u8).astype(jnp.bfloat16)).pooled

    # compile + warm up off the clock
    warm = jnp.zeros((batch, size, size, 3), jnp.uint8)
    jax.device_get(extract(variables, warm)[0, 0])

    def one_pass():
        t0 = time.perf_counter()
        probes = []
        got = 0
        for db in prefetch_to_device(iterate_batches(source, batch)):
            out = extract(variables, db["image"])
            probes.append(out[0, 0])
            got += int(db["mask"].sum())
        jax.device_get(jnp.stack(probes))   # drain the device before t1
        return got / (time.perf_counter() - t0)

    reps = 1 if args.smoke else (3 if args.cached else 2)
    e2e = max(one_pass() for _ in range(reps))

    # component breakdown for the caveat: host-only decode rate and the
    # fresh-buffer H2D rate (same probes as --from-jpeg)
    t0 = time.perf_counter()
    got = sum(int(b["mask"].sum()) for b in iterate_batches(source, batch))
    host_rate = got / (time.perf_counter() - t0)
    rng = np.random.default_rng(1)
    bufs = [rng.integers(0, 255, (batch, size, size, 3)).astype(np.uint8)
            for _ in range(8)]
    t0 = time.perf_counter()
    jax.block_until_ready([jax.device_put(b) for b in bufs])
    h2d = 8 * batch / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": ("e2e_cached" if args.cached else "e2e_jpeg")
                  + "_to_descriptor_throughput" + ("_int8" if int8 else ""),
        "value": round(e2e, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(e2e / 5000.0, 4),
    }))
    feed = "cached feed" if args.cached else f"host_decode ({decoder})"
    print(f"# e2e breakdown: {feed}={host_rate:.0f}/s "
          f"({threads} threads) h2d={h2d:.0f}/s (tunnel-serialized) "
          f"chip-only~see main bench; n={n} batch={batch} "
          f"src={src_hw}p ~{jpeg_kb:.0f}KB", file=sys.stderr)


def bench_train_step(args):
    """--train: full fine-tune step throughput — DINOv2-B/14 + MLP head,
    Huber loss, AdamW update, donated state (the swin_attempt_2.py-style
    geopose recipe on the DINOv2 backbone). Exercises the structured
    Pallas backward (saved qkv/ctx residuals + in-VMEM stage-split
    attention backward)."""
    import jax
    import jax.numpy as jnp
    import optax

    from geovpr.core.config import ModelConfig
    from geovpr.objectives.losses import huber_loss
    from geovpr.train.model import RegressionModel

    if args.smoke:
        cfg = ModelConfig(family="dinov2", variant="small-14", head="mlp",
                          out_dim=2, image_size=28)
        batch = args.batch or 4
        iters = 2
    else:
        cfg = ModelConfig(family="dinov2", variant="base-14", head="mlp",
                          out_dim=2, image_size=224)
        batch = args.batch or 64
        iters = args.iters

    model = RegressionModel(config=cfg)
    size = cfg.image_size
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(rng, jnp.zeros((1, size, size, 3)))
    params = variables["params"]
    tx = optax.adamw(5e-5, weight_decay=0.01)
    opt_state = tx.init(params)

    images = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, size, size, 3), jnp.bfloat16)
    targets = jax.random.normal(jax.random.PRNGKey(2), (batch, 2))

    def loss_fn(p, images):
        pred = model.apply({"params": p}, images, train=True)
        return huber_loss(pred.astype(jnp.float32), targets)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, images):
        def body(carry, _):
            params, opt_state, images = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, images)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # loop-carried dependency so steps cannot overlap-illusion
            images = images + (loss * 1e-24).astype(images.dtype)
            return (params, opt_state, images), loss
        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, images), None, length=iters)
        return params, opt_state, losses

    params, opt_state, losses = run(params, opt_state, images)
    jax.device_get(losses)          # compile + warmup

    reps = 2 if args.smoke else 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, losses = run(params, opt_state, images)
        jax.device_get(losses)
        times.append((time.perf_counter() - t0) / iters)

    best = min(times)
    img_per_sec = batch / best
    print(json.dumps({
        "metric": "dinov2_finetune_train_step_throughput",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / 5000.0, 4),
    }))
    print(f"# backend={jax.default_backend()} batch={batch} "
          f"step={best*1e3:.2f}ms iters={iters}", file=sys.stderr)


def bench_swin_eval(args):
    """--swin-eval: Swin-B-384 descriptor/backbone forward throughput in
    the w8a8 serving configuration (fused Pallas attention half-block +
    int8 MLPs/attention projections) — the geopose serving path of the
    reference's best run (`swin_transformer/swin_attempt_2.py`). Prints
    int8-vs-bf16 pooled-output fidelity every run."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from geovpr.models.swin import SwinTransformer, SWIN_VARIANTS

    int8 = not args.bf16
    if args.smoke:
        model = SwinTransformer(embed_dim=128, depths=(2, 2),
                                num_heads=(4, 8), window_size=12,
                                image_size=96, patch_size=4,
                                drop_path_rate=0.0, int8_mlp=int8,
                                int8_attn=int8, dtype=jnp.bfloat16)
        batch, iters = args.batch or 4, 2
    else:
        model = SwinTransformer(**SWIN_VARIANTS["base-384"],
                                drop_path_rate=0.0, int8_mlp=int8,
                                int8_attn=int8, dtype=jnp.bfloat16)
        # B=128 is the measured saturation batch (1,386.6 img/s vs 1,338
        # at B=64, 1,384.3 at B=256 — benches/KNOB_RETEST_r04.log queue6);
        # the throughput metric reports the saturated chip like the other
        # eval benches (B=256 there). --batch 64 restores the latency-
        # oriented point the fused pipeline runs at.
        batch, iters = args.batch or 128, args.iters
    size = model.image_size

    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, size, size, 3)))
    if int8:
        from geovpr.models.quantize import quantize_for_serving

        calib = jax.random.normal(jax.random.PRNGKey(2),
                                  (min(batch, 16), size, size, 3),
                                  jnp.bfloat16)
        variables = quantize_for_serving(model, variables, [calib])
        bf16_model = model.clone(int8_mlp=False, int8_attn=False)
        d_bf = np.asarray(jax.jit(
            lambda v, x: bf16_model.apply(v, x).pooled)(variables, calib),
            np.float32)
        d_q = np.asarray(jax.jit(
            lambda v, x: model.apply(v, x).pooled)(variables, calib),
            np.float32)
        cos = (d_bf * d_q).sum(-1) / (
            np.linalg.norm(d_bf, axis=-1) * np.linalg.norm(d_q, axis=-1))
        print(f"# int8 swin fidelity vs bf16: cosine min={cos.min():.5f} "
              f"mean={cos.mean():.5f}", file=sys.stderr)

    @jax.jit
    def run(v, images):
        def body(imgs, _):
            out = model.apply(v, imgs).pooled
            imgs = imgs + (out.mean() * 1e-24).astype(imgs.dtype)
            return imgs, out[0, 0]
        _, probes = jax.lax.scan(body, images, None, length=iters)
        return probes

    images = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, size, size, 3), jnp.bfloat16)
    jax.device_get(run(variables, images))
    reps = 2 if args.smoke else 3
    times = []
    for r in range(reps):
        im = images * (1.0 + 0.03 * r)
        im.block_until_ready()
        t0 = time.perf_counter()
        jax.device_get(run(variables, im))
        times.append((time.perf_counter() - t0) / iters)
    best = min(times)
    img_per_sec = batch / best
    print(json.dumps({
        "metric": "swin_b384_eval_throughput" + ("_int8" if int8 else ""),
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / 5000.0, 4),
    }))
    print(f"# backend={jax.default_backend()} batch={batch} "
          f"step={best*1e3:.2f}ms iters={iters}", file=sys.stderr)


def bench_convnext_eval(args):
    """--convnext-eval: ConvNeXt-B-224 backbone forward throughput — the
    reference's direct-angle family
    (`angle_prediction/convnext/convnext_finetuning.py:55-64`). Default
    configuration is w8a8 channel MLPs via the fused LN->int8 MLP->
    LayerScale->+residual kernel with ConvNeXt's separate pre-dwconv
    residual stream (~96% of the model's FLOPs quantized; dwconvs and
    stem/downsample convs stay bf16 XLA). Prints int8-vs-bf16 pooled
    fidelity every run; --bf16 opts out."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from geovpr.models.convnext import ConvNeXt, CONVNEXT_VARIANTS

    int8 = not args.bf16
    if args.smoke:
        model = ConvNeXt(depths=(1, 1), dims=(128, 256), int8_mlp=int8,
                         dtype=jnp.bfloat16)
        batch, iters, size = args.batch or 4, 2, 64
    else:
        model = ConvNeXt(**CONVNEXT_VARIANTS["base-224"], int8_mlp=int8,
                         dtype=jnp.bfloat16)
        batch, iters, size = args.batch or 256, args.iters, 224

    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, size, size, 3)))
    if int8:
        from geovpr.models.quantize import quantize_for_serving

        calib = jax.random.normal(jax.random.PRNGKey(2),
                                  (min(batch, 16), size, size, 3),
                                  jnp.bfloat16)
        variables = quantize_for_serving(model, variables, [calib])
        bf16_model = model.clone(int8_mlp=False)
        d_bf = np.asarray(jax.jit(
            lambda v, x: bf16_model.apply(v, x).pooled)(variables, calib),
            np.float32)
        d_q = np.asarray(jax.jit(
            lambda v, x: model.apply(v, x).pooled)(variables, calib),
            np.float32)
        cos = (d_bf * d_q).sum(-1) / (
            np.linalg.norm(d_bf, axis=-1) * np.linalg.norm(d_q, axis=-1))
        print(f"# int8 convnext fidelity vs bf16: cosine "
              f"min={cos.min():.5f} mean={cos.mean():.5f}", file=sys.stderr)

    @jax.jit
    def run(v, images):
        def body(imgs, _):
            out = model.apply(v, imgs).pooled
            imgs = imgs + (out.mean() * 1e-24).astype(imgs.dtype)
            return imgs, out[0, 0]
        _, probes = jax.lax.scan(body, images, None, length=iters)
        return probes

    images = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, size, size, 3), jnp.bfloat16)
    jax.device_get(run(variables, images))
    reps = 2 if args.smoke else 3
    times = []
    for r in range(reps):
        im = images * (1.0 + 0.03 * r)
        im.block_until_ready()
        t0 = time.perf_counter()
        jax.device_get(run(variables, im))
        times.append((time.perf_counter() - t0) / iters)
    best = min(times)
    img_per_sec = batch / best
    print(json.dumps({
        "metric": "convnext_b224_eval_throughput" + ("_int8" if int8 else ""),
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / 5000.0, 4),
    }))
    print(f"# backend={jax.default_backend()} batch={batch} "
          f"step={best*1e3:.2f}ms iters={iters}", file=sys.stderr)


def bench_swin_train(args):
    """--swin-train: Swin-B-384 fine-tune step throughput — Huber + AdamW
    + MLP head + stochastic depth, donated state (the reference's best
    geopose recipe, `swin_transformer/swin_attempt_2.py:157-159`).
    Exercises the stored-probability structured Pallas backward."""
    import jax
    import jax.numpy as jnp
    import optax

    from geovpr.models.swin import SwinTransformer, SWIN_VARIANTS

    if args.smoke:
        model = SwinTransformer(embed_dim=128, depths=(2, 2),
                                num_heads=(4, 8), window_size=12,
                                image_size=96, patch_size=4,
                                drop_path_rate=0.1, remat=args.remat,
                                dtype=jnp.bfloat16)
        batch, iters = args.batch or 2, 2
        head_dim = 256
    else:
        model = SwinTransformer(**SWIN_VARIANTS["base-384"],
                                drop_path_rate=0.1, remat=args.remat,
                                dtype=jnp.bfloat16)
        batch, iters = args.batch or 32, min(args.iters, 6)
        head_dim = 1024
    size = model.image_size

    v = jax.jit(model.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 3)))
    head = jax.random.normal(jax.random.PRNGKey(1), (head_dim, 2),
                             jnp.float32) * 0.01
    params = {"bb": v["params"], "head": head}
    tx = optax.adamw(5e-5, weight_decay=0.01)
    opt_state = tx.init(params)
    images = jax.random.normal(jax.random.PRNGKey(2),
                               (batch, size, size, 3), jnp.bfloat16)
    targets = jax.random.normal(jax.random.PRNGKey(3), (batch, 2))

    def loss_fn(p, im):
        out = model.apply({"params": p["bb"]}, im, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        pred = out.pooled.astype(jnp.float32) @ p["head"]
        return optax.huber_loss(pred, targets, delta=1.0).mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, images):
        def body(carry, _):
            params, opt_state, images = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, images)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            images = images * (1.0 + (loss * 1e-24).astype(images.dtype))
            return (params, opt_state, images), loss
        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, images), None, length=iters)
        return params, opt_state, losses

    params, opt_state, losses = run(params, opt_state, images)
    jax.device_get(losses)
    reps = 2 if args.smoke else 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, losses = run(params, opt_state, images)
        jax.device_get(losses)
        times.append((time.perf_counter() - t0) / iters)
    best = min(times)
    img_per_sec = batch / best
    print(json.dumps({
        "metric": "swin_b384_train_step_throughput"
                  + ("_remat" if args.remat else ""),
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / 5000.0, 4),
    }))
    print(f"# backend={jax.default_backend()} batch={batch} "
          f"step={best*1e3:.2f}ms iters={iters} remat={args.remat}",
          file=sys.stderr)


def bench_efficientnet_train(args):
    """--efficientnet-train: EfficientNet-B0 fine-tune step throughput on
    the reference's best angle recipe — sincos head, MSE on the [cos, sin]
    encoding, Adam(W) 1e-4, dropout 0.3
    (`angle_prediction/efficient_net/en_finetuning_gemini.py:158-192`).
    BatchNorm batch_stats are updated each step (mutable collection), like
    the real train step (train/steps.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from geovpr.core.config import ModelConfig
    from geovpr.objectives.angle_codec import SinCosCodec
    from geovpr.train.model import RegressionModel

    if args.smoke:
        cfg = ModelConfig(family="efficientnet", variant="b0",
                          head="sincos_linear", out_dim=2, image_size=64)
        batch, iters = args.batch or 4, 2
    else:
        cfg = ModelConfig(family="efficientnet", variant="b0",
                          head="sincos_linear", out_dim=2, image_size=224)
        batch, iters = args.batch or 256, args.iters

    model = RegressionModel(config=cfg)
    size = cfg.image_size
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, size, size, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(1e-4, weight_decay=0.0)
    opt_state = tx.init(params)
    codec = SinCosCodec(order="cos_sin")

    images = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, size, size, 3), jnp.bfloat16)
    deg = jax.random.uniform(jax.random.PRNGKey(2), (batch,)) * 360.0
    targets = codec.encode(deg)

    def loss_fn(p, stats, images):
        pred, mutated = model.apply(
            {"params": p, "batch_stats": stats}, images, train=True,
            deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        loss = jnp.mean((pred.astype(jnp.float32) - targets) ** 2)
        return loss, mutated["batch_stats"]

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def run(params, stats, opt_state, images):
        def body(carry, _):
            params, stats, opt_state, images = carry
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats, images)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            images = images * (1.0 + (loss * 1e-24).astype(images.dtype))
            return (params, stats, opt_state, images), loss
        (params, stats, opt_state, _), losses = jax.lax.scan(
            body, (params, stats, opt_state, images), None, length=iters)
        return params, stats, opt_state, losses

    params, batch_stats, opt_state, losses = run(params, batch_stats,
                                                 opt_state, images)
    jax.device_get(losses)
    reps = 2 if args.smoke else 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        params, batch_stats, opt_state, losses = run(params, batch_stats,
                                                     opt_state, images)
        jax.device_get(losses)
        times.append((time.perf_counter() - t0) / iters)
    best = min(times)
    img_per_sec = batch / best
    print(json.dumps({
        "metric": "efficientnet_b0_train_step_throughput",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / 5000.0, 4),
    }))
    print(f"# backend={jax.default_backend()} batch={batch} "
          f"step={best*1e3:.2f}ms iters={iters}", file=sys.stderr)


def bench_convnext_train(args):
    """--convnext-train: ConvNeXt-B-224 fine-tune step throughput on the
    reference's direct-angle recipe — linear head, predictions wrapped
    %360, MAAE as the training loss, Adam 1e-4
    (`angle_prediction/convnext/convnext_finetuning.py:55-64,70-72,112-113`).
    The only pure-LayerNorm conv family: no batch_stats collection, so the
    step is params+opt_state only (unlike --efficientnet-train)."""
    import jax
    import jax.numpy as jnp
    import optax

    from geovpr.core.config import ModelConfig
    from geovpr.objectives.losses import maae_deg
    from geovpr.train.model import RegressionModel

    if args.smoke:
        cfg = ModelConfig(family="convnext", variant="tiny-224",
                          head="linear", out_dim=1, image_size=64)
        batch, iters = args.batch or 4, 2
    else:
        cfg = ModelConfig(family="convnext", variant="base-224",
                          head="linear", out_dim=1, image_size=224)
        batch, iters = args.batch or 64, args.iters

    model = RegressionModel(config=cfg)
    size = cfg.image_size
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, size, size, 3)))
    params = variables["params"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    images = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, size, size, 3), jnp.bfloat16)
    targets = jax.random.uniform(jax.random.PRNGKey(2), (batch,)) * 360.0

    def loss_fn(p, images):
        pred = model.apply({"params": p}, images, train=True,
                           deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(0)})
        pred_deg = jnp.mod(pred.astype(jnp.float32)[:, 0], 360.0)
        return maae_deg(pred_deg, targets)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, images):
        def body(carry, _):
            params, opt_state, images = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, images)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            images = images * (1.0 + (loss * 1e-24).astype(images.dtype))
            return (params, opt_state, images), loss
        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, images), None, length=iters)
        return params, opt_state, losses

    params, opt_state, losses = run(params, opt_state, images)
    jax.device_get(losses)
    reps = 2 if args.smoke else 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, losses = run(params, opt_state, images)
        jax.device_get(losses)
        times.append((time.perf_counter() - t0) / iters)
    best = min(times)
    img_per_sec = batch / best
    print(json.dumps({
        "metric": "convnext_b224_train_step_throughput",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / 5000.0, 4),
    }))
    print(f"# backend={jax.default_backend()} batch={batch} "
          f"step={best*1e3:.2f}ms iters={iters}", file=sys.stderr)


def bench_fuse(args):
    """--fuse: fused three-head + retrieval serving throughput — the
    BASELINE.json north-star pipeline (config #5) and the replacement for
    the reference's missing `final_csv_generators/` stage
    (`/root/reference/README.md:12`): ONE image stream feeds Swin-B-384
    geopose + EfficientNet-B0 angle + DINOv2-SALAD descriptors, and the
    descriptors are searched against a 100k x 8448 int8 gallery, all inside
    one jitted forward per batch (`geovpr.pipeline.fused.FusedPipeline`).

    The measured function IS the shipped `FusedPipeline._forward` (the
    same code `FusedPipeline.run` jits as `_step`), plus the index's
    chunked-search arithmetic per batch. Also measures each component
    ALONE in the identical harness (same 384p stream, same device-side
    resizes) and prints the budget vs the serial ideal 1/sum(1/head)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from geovpr.core.config import ModelConfig
    from geovpr.models.salad import DinoV2Salad
    from geovpr.objectives.angle_codec import SinCosCodec
    from geovpr.pipeline.fused import FusedPipeline
    from geovpr.retrieval.index import DescriptorIndex, _quantize_rows
    from geovpr.train.model import RegressionModel

    int8 = not args.bf16
    k = 5
    if args.smoke:
        stream, geo_size, head_size, resize_to = 96, 56, 48, 56
        geo_cfg = ModelConfig(family="dinov2", variant="small-14",
                              head="mlp", out_dim=2, image_size=geo_size)
        desc = DinoV2Salad(variant="small-14", image_size=geo_size,
                           num_clusters=16, cluster_dim=32, token_dim=32,
                           int8_mlp=int8, int8_attn=int8)
        batch, iters, n_db = args.batch or 4, 2, 512
    else:
        stream, geo_size, head_size, resize_to = 384, 384, 224, 256
        geo_cfg = ModelConfig(family="swin", variant="base-384",
                              head="mlp", out_dim=2)
        desc = DinoV2Salad(variant="base-14", image_size=head_size,
                           int8_mlp=int8, int8_attn=int8,
                           dtype=jnp.bfloat16)
        batch, iters = args.batch or 64, max(args.iters // 2, 4)
        n_db = args.num_images or 100_000
    ang_cfg = ModelConfig(family="efficientnet", variant="b0",
                          head="sincos_linear", out_dim=2,
                          image_size=head_size)

    rng = jax.random.PRNGKey(0)
    geo_model = RegressionModel(config=geo_cfg)
    ang_model = RegressionModel(config=ang_cfg)
    geo_v = jax.jit(geo_model.init)(rng, jnp.zeros((1, geo_size, geo_size, 3)))
    ang_v = jax.jit(ang_model.init)(rng, jnp.zeros((1, head_size,
                                                    head_size, 3)))
    desc_v = jax.jit(desc.init)(rng, jnp.zeros((1, desc.image_size,
                                                desc.image_size, 3)))
    if int8:
        from geovpr.data.transforms import normalize
        from geovpr.models.quantize import quantize_for_serving

        # calibration at each head's own input geometry, normalized like
        # FusedPipeline._forward normalizes the stream (cli/fuse.py:131-139)
        def calib(size, n=16):
            u8 = jax.random.randint(jax.random.PRNGKey(2),
                                    (n, size, size, 3), 0, 256, jnp.uint8)
            return [normalize(u8)]
        geo_v = quantize_for_serving(geo_model, geo_v, calib(geo_size))
        geo_model = geo_model.clone(int8_mlp=True)
        desc_v = quantize_for_serving(desc, desc_v, calib(desc.image_size))
        # EfficientNet-B0 has no int8 path (registry.supports_int8) — the
        # fuse CLI likewise falls back to bf16 for it (cli/fuse.py:117-125)

    # gallery generated ON DEVICE (same rationale as --retrieval: a 100k x
    # 8448 f32 host array would cost minutes of tunnel H2D)
    probe_dim = jax.eval_shape(
        lambda v, x: desc.apply(v, x).pooled, desc_v,
        jnp.zeros((1, desc.image_size, desc.image_size, 3),
                  jnp.bfloat16)).shape[-1]

    @functools.partial(jax.jit, static_argnums=(1,))
    def make_db(seed, n):
        x = jax.random.normal(jax.random.PRNGKey(seed), (n, probe_dim),
                              jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    index = DescriptorIndex(dim=probe_dim, quantize=int8,
                            dtype=jnp.bfloat16)
    index.build(make_db(3, n_db))
    db, db_scale = index._db, index._db_scale
    jax.block_until_ready(db)

    pipe = FusedPipeline(
        geopose_model=geo_model, geopose_variables=geo_v,
        angle_model=ang_model, angle_variables=ang_v,
        angle_codec=SinCosCodec(order="cos_sin"),
        descriptor_model=desc, descriptor_variables=desc_v,
        geopose_size=geo_size, angle_size=head_size,
        angle_resize_to=resize_to, descriptor_size=desc.image_size,
        index=index, top_k=k, batch_size=batch)

    scores_fn = DescriptorIndex._scores

    def search(d, db, db_scale):
        # the index's single-mesh chunked-search arithmetic at one chunk
        # (B <= query_chunk): quantize queries per-row, int8 x int8 score
        # plane, device top-k — identical math to DescriptorIndex.search.
        # --approx N flips the reduction to lax.approx_max_k at that
        # recall_target (the serving-index configuration, cli/fuse.py
        # --approx), exactly as chunk_topk routes it.
        if int8:
            qq, qs = _quantize_rows(d)
        else:
            qq, qs = d.astype(jnp.bfloat16), None
        if args.approx:
            from geovpr.retrieval.index import chunk_topk
            return chunk_topk(qq, qs, db, db_scale, k,
                              method="approx", recall=args.approx)
        return jax.lax.top_k(scores_fn(qq, qs, db, db_scale), k)

    # every operand (model variables, the GB-scale gallery) rides as a jit
    # ARGUMENT — closing over them would bake them into the executable as
    # XLA constants (pipeline/fused.py:97-99; the retrieval bench hit the
    # same wall: remote compilers choke on multi-hundred-MB constant
    # programs)
    ops = (geo_v, ang_v, desc_v, db, db_scale)

    def timed(fn, tag, stream_hw=None):
        """Scan-chained throughput of `fn(ops, images_u8) -> probe scalar`
        over the shared 384p uint8 stream (honest-timing recipe: one
        compiled scan, loop-carried dependency, device_get off the clock
        end)."""
        @jax.jit
        def run(ops, images):
            def body(imgs, _):
                p = fn(ops, imgs)
                nxt = jnp.clip(imgs.astype(jnp.int32)
                               + (p * 1e-24).astype(jnp.int32), 0,
                               255).astype(jnp.uint8)
                return nxt, p
            _, probes = jax.lax.scan(body, images, None, length=iters)
            return probes

        hw = stream_hw or stream
        images = jax.random.randint(jax.random.PRNGKey(1),
                                    (batch, hw, hw, 3), 0, 256,
                                    jnp.uint8)
        jax.device_get(run(ops, images))          # compile + warmup
        times = []
        for r in range(2 if args.smoke else 3):
            im = jnp.clip(images.astype(jnp.int32) + r, 0,
                          255).astype(jnp.uint8)
            im.block_until_ready()
            t0 = time.perf_counter()
            jax.device_get(run(ops, im))
            times.append((time.perf_counter() - t0) / iters)
        rate = batch / min(times)
        print(f"# {tag}: {rate:.1f} img/s ({min(times)*1e3:.2f} ms/batch)",
              file=sys.stderr)
        return rate

    def fused_fn(ops, imgs):
        geo_v, ang_v, desc_v, db, db_scale = ops
        out = pipe._forward(geo_v, ang_v, desc_v, imgs)
        s, _ = search(out["descriptor"], db, db_scale)
        return (out["latlon"][0, 0] + out["angle"][0] + s[0, 0])

    # components alone, measured in the SAME harness (same stream dtype/
    # resolution, same device-side resizes) so the budget is apples-to-apples
    def solo(geo=None, ang=None, dsc=None):
        p = FusedPipeline(
            geopose_model=geo_model if geo else None, geopose_variables=geo_v,
            angle_model=ang_model if ang else None, angle_variables=ang_v,
            angle_codec=SinCosCodec(order="cos_sin"),
            descriptor_model=desc if dsc else None,
            descriptor_variables=desc_v,
            geopose_size=geo_size, angle_size=head_size,
            angle_resize_to=resize_to, descriptor_size=desc.image_size)

        def fn(ops, imgs):
            geo_v, ang_v, desc_v, db, db_scale = ops
            out = p._forward(geo_v, ang_v, desc_v, imgs)
            if geo:
                return out["latlon"][0, 0]
            if ang:
                return out["angle"][0]
            s, _ = search(out["descriptor"], db, db_scale)
            return s[0, 0]
        return fn

    fused = timed(fused_fn, "fused (3 heads + retrieval)")
    r_geo = timed(solo(geo=True), "geopose alone (Swin-B-384)")
    r_ang = timed(solo(ang=True), "angle alone (EfficientNet-B0 256->224)")
    r_dsc = timed(solo(dsc=True),
                  f"descriptors+search alone (SALAD + {n_db}x{probe_dim})")
    if args.ablate:
        # stream-geometry tax split (VERDICT r4 weak #3): the same
        # descriptor+search leg fed a NATIVE head-resolution uint8 stream —
        # no downsizing resize, no full-res stream in the program. The gap
        # vs `r_dsc` is the resize + stream-resolution cost; what remains
        # vs the standalone 224p bench is batch/program-shape effects.
        timed(solo(dsc=True),
              f"descriptors+search, native {desc.image_size}p stream",
              stream_hw=desc.image_size)

    serial = 1.0 / (1.0 / r_geo + 1.0 / r_ang + 1.0 / r_dsc)
    print(json.dumps({
        "metric": "fused_pipeline_throughput" + ("_int8" if int8 else ""),
        "value": round(fused, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(fused / serial, 4),
    }))
    print(f"# serial ideal 1/sum(1/head) = {serial:.1f} img/s; fused = "
          f"{fused:.1f} ({fused/serial*100:.1f}% of ideal); "
          f"backend={jax.default_backend()} batch={batch} stream={stream}p "
          f"iters={iters} k={k}", file=sys.stderr)


def bench_retrieval(args):
    """--retrieval: HBM-resident descriptor search throughput at production
    scale — N x 8448 gallery (SALAD descriptor width), cosine top-k on the
    MXU, int8 (per-row PTQ) vs bf16 rows. The north-star surface is
    BASELINE.json's "HBM-resident cosine-similarity matmul + on-device
    top-k"; the reference has no retrieval at all (SURVEY.md §0). Queries
    run through the index's chunked-search arithmetic (one
    (query_chunk, N) score plane live at a time) so the number reflects
    the shipped memory-bounded path."""
    import jax
    import jax.numpy as jnp

    from geovpr.retrieval.index import (DescriptorIndex, _quantize_rows,
                                        chunk_topk)

    if args.smoke:
        n_db, dim, n_q, k, iters, chunk = 2048, 256, 256, 10, 2, 128
    else:
        n_db = args.num_images or 100_000
        dim, n_q, k, iters, chunk = 8448, 4096, 10, max(args.iters // 2, 4), 1024
    if args.query_chunk:
        chunk = args.query_chunk
        # round the query count UP to a chunk multiple: _map_chunks
        # reshapes to (n_chunks, chunk, D), so a non-divisor chunk would
        # either crash the reshape or silently time a different chunk size
        n_q = ((max(n_q, chunk) + chunk - 1) // chunk) * chunk
    db_block = args.db_block
    topk_method = "approx" if args.approx else "exact"

    # gallery + queries generated ON DEVICE: a 100k x 8448 f32 host array
    # would cost 3.4 GB of host RAM and minutes of tunnel H2D
    @functools.partial(jax.jit, static_argnums=(1,))
    def make(seed, n):
        x = jax.random.normal(jax.random.PRNGKey(seed), (n, dim), jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    # a gallery this big cannot exist in f32 on the chip (1M x 8448 f32 is
    # 33.8 GB) and its bf16 index (2 bytes/dim) may not fit either — above
    # this cut the bench builds int8-only, STREAMED through the chunked
    # build, and additionally reports the index build rate
    big = (n_db * dim * 2) > 13e9
    build_chunk = 65_536
    if not big:
        db_f32 = make(0, n_db)
    queries = make(1, n_q)
    results = {}
    build_rate = None
    for mode in ("bf16", "int8"):
        quant = mode == "int8"
        if big and not quant:
            print(f"# bf16 skipped at n={n_db}: gallery would need "
                  f"{n_db*dim*2/1e9:.1f} GB HBM (> one v5e chip); int8 "
                  f"({n_db*dim/1e9:.1f} GB) is the only configuration "
                  f"that fits", file=sys.stderr)
            continue
        index = DescriptorIndex(dim=dim, quantize=quant,
                                dtype=jnp.bfloat16, query_chunk=chunk,
                                db_block=db_block, topk_method=topk_method,
                                approx_recall=args.approx or 0.95)
        if big:
            # build rate: device-generated f32 chunks -> per-row int8
            # quantization -> donated dynamic_update_slice install (peak
            # HBM = final index + one chunk); generation itself is a few
            # percent of the quantize+install cost at these shapes
            n_chunks_b = (n_db + build_chunk - 1) // build_chunk
            t0 = time.perf_counter()
            index.build_chunked(
                (make(100 + i, min(build_chunk, n_db - i * build_chunk))
                 for i in range(n_chunks_b)), n_db)
            jax.block_until_ready(index._db)
            build_rate = n_db / (time.perf_counter() - t0)
        else:
            index.build(db_f32)
        db, db_scale = index._db, index._db_scale
        jax.block_until_ready(db)
        hbm_gb = (db.size * db.dtype.itemsize
                  + (db_scale.size * 4 if quant else 0)) / 1e9

        # correctness probe through the PUBLIC search API: the first 512
        # queries are db rows 0..511 perturbed — top-1 must recover them
        # (the chunked build's chunk generator is deterministic, so row
        # 0..511 of a big build are make(100, ...)'s first rows)
        rows0 = make(100, build_chunk)[:512] if big else db_f32[:512]
        probe = rows0 + 1e-3 * make(2, 512)
        _, top = index.search(probe, k=1)
        import numpy as np
        r1 = float((np.asarray(top)[:, 0] == np.arange(512)).mean())
        if topk_method == "approx" or db_block:
            # honest fidelity probe for the non-single-shot reductions:
            # top-k overlap vs the EXACT single-shot search on RANDOM
            # queries (no planted near-duplicate, ties genuinely close)
            rnd = make(7, 256)
            _, t_got = index.search(rnd, k=k)
            exact = DescriptorIndex(
                dim=dim, quantize=quant, dtype=jnp.bfloat16,
                query_chunk=chunk, db_block=0, topk_method="exact")
            exact._install(index._db, index._db_scale, n_real=index._n)
            _, t_ref = exact.search(rnd, k=k)
            a, b = np.asarray(t_got), np.asarray(t_ref)
            overlap = np.mean([
                len(set(a[i]) & set(b[i])) / k for i in range(a.shape[0])])
            print(f"# {mode} top-{k} overlap vs exact single-shot on 256 "
                  f"random queries: {overlap:.4f}", file=sys.stderr)

        n_chunks = n_q // chunk
        scores_fn = DescriptorIndex._scores

        # timing: iterations chained inside ONE compiled scan (per-call
        # tunnel dispatch would otherwise dominate; see "Honest
        # benchmarking" in docs/DESIGN.md). db rides as a jit ARGUMENT —
        # closing over a GB-scale constant overflows the remote compiler.
        # The per-chunk reduction is the SAME chunk_topk the shipped
        # search uses (db_block / exact-vs-approx knobs included);
        # --ablate swaps it for a plane row-max, isolating the score
        # matmul + plane traffic from the top-k cost.
        def make_run(reducer):
            @jax.jit
            def run(db, db_scale, q):
                def one_chunk(qb, qsb):
                    return reducer(qb, qsb, db, db_scale)

                def body(qv, _):
                    # per-row query quantization at search time is part of
                    # the real int8 serving cost
                    qq, qs = _quantize_rows(qv) if quant else (
                        qv.astype(jnp.bfloat16), None)
                    s, i = DescriptorIndex._map_chunks(
                        one_chunk, qq, qs, n_chunks, n_q, k)
                    qv = qv + (s[0, 0] * 1e-24).astype(qv.dtype)
                    return qv, s[0, 0]
                _, probes = jax.lax.scan(body, q, None, length=iters)
                return probes
            return run

        def topk_reducer(qb, qsb, db, db_scale):
            # n_real masks the install-time padding rows (gallery padded
            # to a db_block multiple so the blocked reshape is a bitcast)
            return chunk_topk(qb, qsb, db, db_scale, k, db_block=db_block,
                              n_real=n_db if db.shape[0] != n_db else None,
                              method=topk_method,
                              recall=args.approx or 0.95)

        def max_reducer(qb, qsb, db, db_scale):
            # matmul-only ablation: same plane, cheapest possible
            # reduction (row max, broadcast to k columns for shape parity)
            m = jnp.max(scores_fn(qb, qsb, db, db_scale), axis=-1,
                        keepdims=True)
            mk = jnp.broadcast_to(m, (m.shape[0], k))
            return mk, jnp.zeros(mk.shape, jnp.int32)

        db_args = (db, db_scale) if quant else (db, None)

        def timed_run(run):
            jax.device_get(run(*db_args, queries))  # compile + warmup
            times = []
            for r in range(2 if args.smoke else 3):
                qv = queries * (1.0 + 1e-6 * r)
                qv.block_until_ready()
                t0 = time.perf_counter()
                jax.device_get(run(*db_args, qv))
                times.append((time.perf_counter() - t0) / iters)
            return min(times)

        best = timed_run(make_run(topk_reducer))
        results[mode] = {"qps": n_q / best, "ms": best * 1e3,
                         "hbm_gb": hbm_gb, "recall1": r1}
        if args.ablate:
            mm = timed_run(make_run(max_reducer))
            results[mode]["mm_ms"] = mm * 1e3
            print(f"# {mode} ablation: matmul+plane-max {mm*1e3:.2f} ms "
                  f"vs full {best*1e3:.2f} ms -> top-k share "
                  f"{(best-mm)*1e3:.2f} ms ({(best-mm)/best*100:.1f}%)",
                  file=sys.stderr)
        del index, db, db_scale, db_args

    q8 = results["int8"]
    print(json.dumps({
        "metric": "retrieval_search_throughput_int8",
        "value": round(q8["qps"], 1),
        "unit": f"queries/sec vs {n_db}x{dim} gallery",
        # vs_baseline is int8-vs-bf16 at matched scale; null when the bf16
        # gallery cannot fit on the chip at all (the int8 capacity IS the
        # headline there — a 0.0 sentinel reads as a measured 0x ratio,
        # ADVICE r4)
        "vs_baseline": round(q8["qps"] / results["bf16"]["qps"], 4)
                       if "bf16" in results else None,
    }))
    for mode, r in results.items():
        print(f"# {mode}: {r['qps']:.0f} q/s ({r['ms']:.2f} ms/{n_q} "
              f"queries, k={k}), gallery {r['hbm_gb']:.2f} GB HBM, "
              f"probe recall@1={r['recall1']:.4f}", file=sys.stderr)
    if build_rate is not None:
        print(f"# chunked index build: {build_rate:.0f} rows/s "
              f"({n_db} rows in {n_db/build_rate:.1f} s, chunk="
              f"{build_chunk}, on-device generate+quantize+install)",
              file=sys.stderr)
    print(f"# backend={jax.default_backend()} chunk={chunk} "
          f"iters={iters}", file=sys.stderr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--batch", type=int, default=0)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--from-jpeg", action="store_true",
                        help="benchmark the HOST input pipeline instead: "
                             "encoded JPEG files -> uint8 batches -> device "
                             "(pil vs native vs cached)")
    parser.add_argument("--train", action="store_true",
                        help="benchmark the fine-tune train step instead "
                             "(DINOv2-B + MLP head, Huber, AdamW)")
    parser.add_argument("--swin-eval", action="store_true",
                        help="benchmark the Swin-B-384 serving forward "
                             "(fused Pallas attention + w8a8 unless "
                             "--bf16)")
    parser.add_argument("--convnext-eval", action="store_true",
                        help="benchmark the ConvNeXt-B-224 serving forward "
                             "(w8a8 channel MLPs via the fused kernel "
                             "unless --bf16)")
    parser.add_argument("--convnext-train", action="store_true",
                        help="ConvNeXt-B-224 direct-MAAE train step "
                             "(convnext_finetuning.py recipe)")
    parser.add_argument("--efficientnet-train", action="store_true",
                        help="benchmark the EfficientNet-B0 fine-tune step "
                             "(sincos angle recipe: MSE on [cos,sin], "
                             "AdamW, BatchNorm stats updated)")
    parser.add_argument("--swin-train", action="store_true",
                        help="benchmark the Swin-B-384 fine-tune step "
                             "(Huber + AdamW, stored-p structured Pallas "
                             "backward)")
    parser.add_argument("--remat", action="store_true",
                        help="with --swin-train: jax.checkpoint each block "
                             "(activation memory O(1), enables larger "
                             "per-chip batch)")
    parser.add_argument("--int8", action="store_true",
                        help="(default) w8a8 serving path: quantized MLPs + "
                             "attention projections with static calibrated "
                             "activation scales; prints descriptor-fidelity "
                             "cosine vs bf16 every run")
    parser.add_argument("--bf16", action="store_true",
                        help="benchmark the unquantized bf16 path instead "
                             "of the int8 serving configuration")
    parser.add_argument("--retrieval", action="store_true",
                        help="benchmark HBM-resident descriptor search "
                             "(100k x 8448 gallery, int8 vs bf16, chunked "
                             "cosine top-k on device)")
    parser.add_argument("--fuse", action="store_true",
                        help="benchmark the fused three-head + retrieval "
                             "serving pipeline (Swin geopose + EfficientNet "
                             "angle + SALAD descriptors + gallery search in "
                             "ONE jitted forward) with a per-head budget")
    parser.add_argument("--e2e", action="store_true",
                        help="sustained cold-stream number: JPEG files -> "
                             "native decode threads -> prefetched device "
                             "feed -> int8 descriptors, one pass end to "
                             "end")
    parser.add_argument("--cached", action="store_true",
                        help="with --e2e: warm-cache steady state — epoch 0 "
                             "decodes into the RAM cache off the clock, then "
                             "sustained passes measure cached feed + H2D + "
                             "chip (the multi-epoch/RAM-resident regime)")
    parser.add_argument("--num-images", type=int, default=0)
    parser.add_argument("--db-block", type=int, default=0,
                        help="with --retrieval: two-stage blocked top-k "
                        "db row-block size (0 = single-shot lax.top_k "
                        "over the full gallery width)")
    parser.add_argument("--query-chunk", type=int, default=0,
                        help="with --retrieval: override the query chunk "
                        "(default 1024)")
    parser.add_argument("--approx", type=float, default=0.0,
                        help="with --retrieval or --fuse: use "
                        "lax.approx_max_k at this recall_target instead "
                        "of exact top-k (the serving-index mode)")
    parser.add_argument("--ablate", action="store_true",
                        help="with --retrieval: also time the score "
                        "matmul with a plane row-max instead of top-k "
                        "(isolates the top-k cost)")
    parser.add_argument("--jpeg-size", type=int, default=0)
    parser.add_argument("--threads", type=int, default=0)
    args = parser.parse_args()

    if args.from_jpeg:
        bench_input_pipeline(args)
        return
    if args.e2e:
        bench_e2e(args)
        return
    if args.retrieval:
        bench_retrieval(args)
        return
    if args.fuse:
        bench_fuse(args)
        return
    if args.swin_eval:
        bench_swin_eval(args)
        return
    if args.swin_train:
        bench_swin_train(args)
        return
    if args.convnext_train:
        bench_convnext_train(args)
        return
    if args.efficientnet_train:
        bench_efficientnet_train(args)
        return
    if args.convnext_eval:
        bench_convnext_eval(args)
        return
    if args.train:
        bench_train_step(args)
        return

    import jax
    import jax.numpy as jnp

    from geovpr.models.salad import DinoV2Salad

    # the int8 serving configuration IS the headline descriptor-extraction
    # path (past the all-bf16 roofline, fidelity printed every run);
    # --bf16 opts out for the unquantized comparison number
    args.int8 = not args.bf16

    if args.smoke:
        model = DinoV2Salad(variant="small-14", image_size=56,
                            num_clusters=16, cluster_dim=32, token_dim=32,
                            int8_mlp=args.int8, int8_attn=args.int8,
                            dtype=jnp.bfloat16)
        batch = args.batch or 8
        iters = 3
    else:
        model = DinoV2Salad(variant="base-14", image_size=224,
                            int8_mlp=args.int8, int8_attn=args.int8,
                            dtype=jnp.bfloat16)
        batch = args.batch or 256
        iters = args.iters

    rng = jax.random.PRNGKey(0)
    size = model.image_size
    variables = jax.jit(model.init)(rng, jnp.zeros((1, size, size, 3)))
    if args.int8:
        import numpy as np

        from geovpr.models.quantize import quantize_for_serving

        calib = jax.random.normal(jax.random.PRNGKey(2),
                                  (min(batch, 64), size, size, 3),
                                  jnp.bfloat16)
        variables = quantize_for_serving(model, variables, [calib])
        # descriptor fidelity: cosine(int8 descriptor, bf16 descriptor)
        bf16_model = model.clone(int8_mlp=False, int8_attn=False)
        d_bf = np.asarray(jax.jit(
            lambda v, x: bf16_model.apply(v, x).pooled)(variables, calib),
            np.float32)
        d_q = np.asarray(jax.jit(
            lambda v, x: model.apply(v, x).pooled)(variables, calib),
            np.float32)
        cos = (d_bf * d_q).sum(-1) / (
            np.linalg.norm(d_bf, axis=-1) * np.linalg.norm(d_q, axis=-1))
        print(f"# int8 descriptor fidelity vs bf16: cosine "
              f"min={cos.min():.5f} mean={cos.mean():.5f}", file=sys.stderr)

    # Honest timing under a remote-device tunnel: `block_until_ready` can
    # return before device work drains there, so instead we (a) chain every
    # iteration on the previous one's output inside ONE compiled scan (no
    # overlap illusion, no dispatch gaps) and (b) end the clock only after
    # `jax.device_get` has materialized result bytes on the host.
    def extract(v, images):
        return model.apply(v, images).pooled

    @jax.jit
    def run(v, images):
        def body(imgs, _):
            out = extract(v, imgs)
            # loop-carried data dependency; adding ~1e-24 is exact identity
            # in bf16/f32 but XLA cannot elide the dependence on `out`
            imgs = imgs + (out.mean() * 1e-24).astype(imgs.dtype)
            return imgs, out[0, 0]
        _, probes = jax.lax.scan(body, images, None, length=iters)
        return probes

    images = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, size, size, 3), jnp.bfloat16)
    jax.device_get(run(variables, images))  # compile + warmup

    # distinct inputs per rep, materialized BEFORE the clock starts —
    # measurement hygiene against any replay/caching shortcut in the
    # remote-device runtime (device_get already guards against the
    # non-blocking block_until_ready, see above)
    reps = 2 if args.smoke else 3
    rep_images = [
        jax.random.normal(jax.random.PRNGKey(10 + r),
                          (batch, size, size, 3), jnp.bfloat16)
        for r in range(reps)
    ]
    for im in rep_images:
        im.block_until_ready()
    times = []
    for im in rep_images:
        t0 = time.perf_counter()
        jax.device_get(run(variables, im))
        times.append((time.perf_counter() - t0) / iters)

    best = min(times)
    median = statistics.median(times)
    img_per_sec = batch / best
    result = {
        "metric": "dinov2_salad_descriptor_extraction_throughput"
                  + ("_int8" if args.int8 else ""),
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / 5000.0, 4),
    }
    print(json.dumps(result))
    print(f"# backend={jax.default_backend()} batch={batch} "
          f"median={median*1e3:.2f}ms best={best*1e3:.2f}ms "
          f"iters={iters}", file=sys.stderr)


def _main_with_retry():
    """The axon tunnel's remote-compile endpoint occasionally drops a
    response mid-body (INTERNAL: "response body closed before all bytes
    were read") — a transient transport flake, not a program error. The
    driver runs this script unattended, so retry the whole bench once in a
    fresh interpreter state before reporting failure."""
    import os
    import subprocess

    try:
        main()
        return
    except Exception as e:  # noqa: BLE001 — classify, then re-raise
        msg = f"{type(e).__name__}: {e}"
        transient = ("remote_compile" in msg or "DEADLINE_EXCEEDED" in msg
                     or "response body closed" in msg or "UNAVAILABLE" in msg)
        if not transient or os.environ.get("GEOVPR_BENCH_NO_RETRY"):
            raise
        print(f"# transient tunnel error, retrying once: {msg.splitlines()[0]}",
              file=sys.stderr)
    env = dict(os.environ, GEOVPR_BENCH_NO_RETRY="1")
    # fresh process: the poisoned backend state dies with this interpreter
    raise SystemExit(subprocess.call([sys.executable, *sys.argv], env=env))


if __name__ == "__main__":
    _main_with_retry()
