#!/usr/bin/env python
"""End-to-round benchmark: full pipeline throughput on one TPU chip.

Workload (BASELINE.json configs 1+2): per 4096x4096 micrograph —
  preprocess (8x Fourier-crop downsample + 2-component-GMM normalization)
  + extract (pretrained resnet8_u32 dense score map + on-device NMS,
    r=14, threshold=-6)
  + denoise (pretrained U-Net, whole-image, f32)
all fully on device; the host only feeds raw pixels and reads back picks
and the denoised image.

Prints one JSON line {metric, value, unit, vs_baseline}. vs_baseline is
measured against the torch-CPU reference pipeline recorded in
BASELINE_MEASURED.json (no CUDA GPU exists in this environment; see that
file for the A4000 context).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N_WARMUP = 1
N_ITERS = 6
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")


def build_pipeline():
    from topaz_tpu.models.denoise_factory import apply_fn_for, load_denoiser
    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.models.picker import apply_picker
    from topaz_tpu.ops.fourier import downsample
    from topaz_tpu.ops.gmm import norm_fit
    from topaz_tpu.ops.nms import nms_topk_2d

    spec, params, state = load_picker("resnet8_u32")
    dmeta, dparams = load_denoiser("unet")
    dapply = apply_fn_for(dmeta)

    @jax.jit
    def extract(raw):
        """raw 4k -> (peak scores, coords, count) at 8x downsampled scale."""
        small = downsample(raw, 8)
        mu, std, *_ = norm_fit(small.ravel())
        norm = (small - mu) / std
        score, _ = apply_picker(spec, params, norm[None], state=state,
                                dense=True)
        return nms_topk_2d(score[0], 14, -6.0, 2048)

    @jax.jit
    def denoise(raw):
        mu, std = jnp.mean(raw), jnp.std(raw)
        xin = ((raw - mu) / std)[None, :, :, None]
        y = dapply(dparams, xin, dims=2)[0, :, :, 0]
        return y * std + mu

    return extract, denoise


def _wait_for_device(retries: int = 5, delay: float = 10.0):
    """The TPU grant is exclusive; a recently killed process can hold it for
    a few seconds. Retry the claim instead of failing the bench."""
    for attempt in range(retries):
        try:
            return jax.devices()
        except RuntimeError as e:
            if attempt == retries - 1:
                raise
            print(f"# bench: device claim failed ({e}); retrying...",
                  file=sys.stderr, flush=True)
            time.sleep(delay)


def main():
    _wait_for_device()
    rng = np.random.default_rng(0)
    raw_np = rng.normal(0, 1, (4096, 4096)).astype(np.float32)
    raw = jnp.asarray(raw_np)

    print("# bench: building pipeline...", file=sys.stderr, flush=True)
    extract, denoise = build_pipeline()

    # warmup / compile
    t0 = time.time()
    for _ in range(N_WARMUP):
        scores, coords, count = extract(raw)
        den = denoise(raw)
        _ = np.asarray(scores[:1]), np.asarray(den[:1, :1])
    print(f"# bench: warmup/compile done in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    # timed: N micrographs through the full pipeline; force completion by
    # materializing outputs (the picks fully, one row of the denoised image
    # to avoid timing the 67MB tunnel fetch as device work)
    t0 = time.time()
    for _ in range(N_ITERS):
        scores, coords, count = extract(raw)
        den = denoise(raw)
        picks = np.asarray(coords)
        edge = np.asarray(den[:1, :1])
    elapsed = time.time() - t0
    per_micrograph = elapsed / N_ITERS
    throughput = 1.0 / per_micrograph

    vs_baseline = None
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f)
        vs_baseline = throughput / base["throughput_micrographs_per_sec"]

    print(json.dumps({
        "metric": "4kx4k micrographs/sec/chip (preprocess+extract+denoise)",
        "value": round(throughput, 4),
        "unit": "micrographs/sec",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
