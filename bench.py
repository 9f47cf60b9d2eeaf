"""Benchmark: DINOv2-B/14 + SALAD descriptor extraction throughput.

This is the BASELINE.json headline metric: images/sec/chip for the north-star
descriptor path (target >= 5000 img/s/chip on TPU v5e). The reference
publishes no throughput numbers (BASELINE.md) — `vs_baseline` is measured
against that 5k target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N/5000}

Usage:
  python bench.py            # full bench on the attached TPU chip
  python bench.py --smoke    # tiny shapes (CPU-friendly sanity check)
"""

import argparse
import json
import statistics
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--batch", type=int, default=0)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from geovpr.models.salad import DinoV2Salad

    if args.smoke:
        model = DinoV2Salad(variant="small-14", image_size=56,
                            num_clusters=16, cluster_dim=32, token_dim=32,
                            dtype=jnp.bfloat16)
        batch = args.batch or 8
        iters = 3
    else:
        model = DinoV2Salad(variant="base-14", image_size=224,
                            dtype=jnp.bfloat16)
        batch = args.batch or 256
        iters = args.iters

    rng = jax.random.PRNGKey(0)
    size = model.image_size
    variables = jax.jit(model.init)(rng, jnp.zeros((1, size, size, 3)))

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

    reps = 2 if args.smoke else 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(run(variables, images))
        times.append((time.perf_counter() - t0) / iters)

    best = min(times)
    median = statistics.median(times)
    img_per_sec = batch / best
    result = {
        "metric": "dinov2_salad_descriptor_extraction_throughput",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / 5000.0, 4),
    }
    print(json.dumps(result))
    print(f"# backend={jax.default_backend()} batch={batch} "
          f"median={median*1e3:.2f}ms best={best*1e3:.2f}ms "
          f"iters={iters}", file=sys.stderr)


if __name__ == "__main__":
    main()
