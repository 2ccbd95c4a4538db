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

# same persistent compile cache as the CLI (one cache, not a repo-local
# twin — VERDICT r3 item 9); JAX_COMPILATION_CACHE_DIR still wins
from topaz_tpu.cli.main import _setup_compilation_cache

_setup_compilation_cache()

import jax.numpy as jnp
import numpy as np

from topaz_tpu.utils.batching import fetch_async

N_WARMUP = 1
N_ITERS = 6
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")

# Workload FLOP counts from XLA's cost analysis of the compiled programs
# (tools/count_flops.py; backend-independent). Regenerate with
#   JAX_PLATFORMS=cpu python tools/count_flops.py
# (last regenerated at HEAD 2026-08-19, labels-vector step signature;
#  tests/test_tools.py smoke-lowers the tool so a step refactor can't
#  silently strand these constants again)
DENOISE4K_FLOPS = 4.62152e12   # whole-image unet-v0.2.1 @ 4096^2
TRAIN_STEP_FLOPS = 4.51093e10  # GE-binomial resnet8_u32 fwd+bwd+adam, b=256


def bench_matmul_peak() -> dict:
    """Measured matmul peak of THIS chip per dtype (VERDICT r3 item 4):
    a chain of 8192^2 dots compiled as one program, best-of-3. This is
    the roofline denominator for the MFU numbers — the tunneled chip's
    delivered rate, not the v5e datasheet (197 TF/s bf16)."""
    n, chain_len = 8192, 8
    seed = np.random.default_rng(1)
    host = (seed.normal(0, 1, (n, n)) / np.sqrt(n)).astype(np.float32)
    out = {}
    # f32 at DEFAULT precision runs one bf16 MXU pass with f32
    # accumulation on TPU (what every f32 conv/matmul in this package
    # actually executes); HIGHEST is true multi-pass f32 arithmetic.
    cases = (("bf16", jnp.bfloat16, None),
             ("f32", jnp.float32, None),
             ("f32_highest", jnp.float32, jax.lax.Precision.HIGHEST))
    for name, dtype, prec in cases:
        a = jnp.asarray(host, dtype)

        @jax.jit
        def chain(x):
            y = x
            for _ in range(chain_len):
                y = jnp.dot(y, x, precision=prec)
            return y

        _ = np.asarray(chain(a)[:1, :1])  # compile + one run
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            r = chain(a)
            _ = np.asarray(r[:1, :1])
            best = min(best, time.time() - t0)
        out[f"measured_peak_tf_s_{name}"] = round(
            2.0 * n**3 * chain_len / best / 1e12, 1)
    out["peak_note"] = ("chain of 8192^2 dots, best-of-3, this chip via "
                        "the tunnel; f32 = default precision (one bf16 "
                        "MXU pass + f32 accumulate, what f32 convs here "
                        "actually run), f32_highest = multi-pass true f32")
    return out


DENOISE3D_SHAPE = (192, 384, 384)  # BASELINE config 4 tomogram


def bench_denoise3d(rng) -> dict:
    """denoise3d throughput (BASELINE config 4, VERDICT r3 item 5):
    one 192x384x384 tomogram through the 3D U-Net patch path at the
    reference defaults (-s 96 -p 48, topaz/commands/denoise3d.py:52-53),
    f32; and under the documented fast profile (bf16 + --auto-patch).
    Pretrained 3D weights are stripped from this mirror, so the model is
    random-init unet-3d — identical compute either way."""
    from topaz_tpu.denoise import Denoise3D, auto_patch_size

    tomo = rng.normal(0, 1, DENOISE3D_SHAPE).astype(np.float32)
    voxels = float(np.prod(DENOISE3D_SHAPE))
    out = {}
    fast_patch = auto_patch_size(DENOISE3D_SHAPE, padding=48)
    for label, dtype, patch in (("f32", None, 96),
                                ("fast", "bf16", fast_patch)):
        den = Denoise3D.from_arch("unet", dims=3, dtype=dtype)
        # warmup: run the full tomogram once — the device-resident path's
        # program is keyed on the full volume shape (unlike the old
        # streaming ("vol", d, B) key), so only an identical-shape run
        # pre-compiles what the timed run executes
        den.denoise(tomo, patch_size=patch, padding=48, verbose=False)
        t0 = time.time()
        den.denoise(tomo, patch_size=patch, padding=48, verbose=False)
        out[f"denoise3d_{label}_voxels_per_sec"] = round(
            voxels / (time.time() - t0), 0)
    out["denoise3d_fast_patch_size"] = int(fast_patch)
    out["denoise3d_workload"] = (
        f"{DENOISE3D_SHAPE} tomogram, 3D U-Net patch path; f32 at the "
        "reference defaults -s 96 -p 48, fast = bf16 + --auto-patch "
        "(BASELINE config 4)")
    return out


def build_pipeline(fast: bool = False):
    """The per-micrograph compute pipeline. ``fast=True`` builds the
    documented fast profile (CLI ``--fast``): histogram-EM normalization
    (bins=65536, all pixels) + bf16 denoise (params+activations bf16, f32
    out). Scoring/NMS stay f32 in both profiles (pick parity)."""
    from topaz_tpu.models.denoise_factory import apply_fn_for, load_denoiser
    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.models.picker import apply_picker
    from topaz_tpu.ops.fourier import downsample
    from topaz_tpu.ops.gmm import norm_fit, norm_fit_hist
    from topaz_tpu.ops.nms import nms_topk_2d

    spec, params, state = load_picker("resnet8_u32")
    dmeta, dparams = load_denoiser("unet")
    dapply = apply_fn_for(dmeta)
    if fast:
        dparams = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.bfloat16), dparams)

    @jax.jit
    def extract(raw):
        """raw 4k -> (peak scores, coords, count) at 8x downsampled scale."""
        small = downsample(raw, 8)
        if fast:
            mu, std, *_ = norm_fit_hist(small.ravel(), bins=65536)
        else:
            mu, std, *_ = norm_fit(small.ravel())
        norm = (small - mu) / std
        score, _ = apply_picker(spec, params, norm[None], state=state,
                                dense=True)
        return nms_topk_2d(score[0], 14, -6.0, 2048)

    @jax.jit
    def denoise(raw):
        mu, std = jnp.mean(raw), jnp.std(raw)
        xin = ((raw - mu) / std)[None, :, :, None]
        if fast:
            xin = xin.astype(jnp.bfloat16)
        y = dapply(dparams, xin, dims=2).astype(jnp.float32)[0, :, :, 0]
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


def bench_denoise_bf16(raw) -> float:
    """Denoise@4k in the documented bf16 opt-in fast mode (CLI:
    --precision bf16): micrographs/sec for the denoise stage alone,
    showing the measured headroom over the f32 parity default."""
    from topaz_tpu.models.denoise_factory import apply_fn_for, load_denoiser

    dmeta, dparams = load_denoiser("unet")
    dparams = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), dparams)
    dapply = apply_fn_for(dmeta)

    @jax.jit
    def denoise16(raw):
        mu, std = jnp.mean(raw), jnp.std(raw)
        xin = ((raw - mu) / std)[None, :, :, None].astype(jnp.bfloat16)
        y = dapply(dparams, xin, dims=2).astype(jnp.float32)[0, :, :, 0]
        return y * std + mu

    _ = np.asarray(denoise16(raw)[:1, :1])  # compile
    t0 = time.time()
    outs = [denoise16(raw) for _ in range(N_ITERS)]
    fetch_async(*[den[:1, :1] for den in outs])
    elapsed = time.time() - t0
    return N_ITERS / elapsed


def bench_compute(rng, fast: bool = False):
    """Device-compute throughput: one resident 4k micrograph through
    preprocess + extract + denoise@4k (round-1 headline, kept comparable).

    ``fast=True`` measures the documented fast profile. Returns
    (throughput, (extract, denoise)) — the compiled pipeline functions are
    reused by bench_extract_only and bench_fast_quality."""
    raw = jnp.asarray(rng.normal(0, 1, (4096, 4096)).astype(np.float32))

    label = "fast" if fast else "compute"
    print(f"# bench: building {label} pipeline...", file=sys.stderr,
          flush=True)
    extract, denoise = build_pipeline(fast=fast)

    # warmup / compile
    t0 = time.time()
    for _ in range(N_WARMUP):
        scores, coords, count = extract(raw)
        den = denoise(raw)
        _ = np.asarray(scores[:1]), np.asarray(den[:1, :1])
    print(f"# bench: {label} warmup/compile done in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    # timed: N micrographs through the full pipeline, dispatched back to
    # back; completion forced by draining every output at the end (the
    # picks fully, one row per denoised image so the 67MB tunnel fetch is
    # not timed as device work). Per-iteration synchronous fetches would
    # charge one tunnel RTT per micrograph to the device — production
    # streaming overlaps fetches with compute exactly like this.
    t0 = time.time()
    outs = []
    for _ in range(N_ITERS):
        scores, coords, count = extract(raw)
        den = denoise(raw)
        outs.append((coords, den[:1, :1]))
    fetch_async(*[a for pair in outs for a in pair])
    elapsed = time.time() - t0
    tput = N_ITERS / elapsed
    return tput, (extract, denoise)


N_QUALITY_MICS = 2


def bench_fast_quality(fns_f32, fns_fast) -> dict:
    """Fast-profile quality delta measured where quality means something
    (VERDICT r3 item 2): CTF-modulated fixture micrographs with planted
    particles (not N(0,1) noise, where threshold crossings are
    arbitrary). Reports planted-particle AP under both profiles, the
    Hungarian-matched fraction + displacement between the two pick sets
    (picks contract: /root/reference/topaz/extract.py:266-354), and the
    denoise relative error on the same realistic image."""
    from topaz_tpu.ops.metrics import average_precision, match_coordinates
    from topaz_tpu.utils.synthetic import make_ctf_micrograph

    rng = np.random.default_rng(7)
    hits = {"f32": [], "fast": []}
    scores = {"f32": [], "fast": []}
    n_targets = 0
    n_matched = 0
    n_union_max = 0
    disp = []
    rel_err = []
    counts = {"f32": 0, "fast": 0}
    for _ in range(N_QUALITY_MICS):
        raw, centers = make_ctf_micrograph(
            rng, size=4096, n_particles=80, signal=6.0,
            defocus_A=float(rng.uniform(10000.0, 30000.0)))
        # planted centers at the 8x-downsampled picking scale, (x, y)
        targets = np.array([[cx / 8.0, cy / 8.0] for cy, cx in centers])
        raw_j = jnp.asarray(raw)
        picks = {}
        for label, (extract, _dn) in (("f32", fns_f32), ("fast", fns_fast)):
            s, c, count = extract(raw_j)
            s = np.asarray(s)
            n = min(int(np.asarray(count)), len(s))
            picks[label] = (s[:n], np.asarray(c)[:n].astype(np.float64))
            counts[label] += n
            assignment, _ = match_coordinates(targets, picks[label][1], 14)
            hits[label].append(assignment)
            scores[label].append(picks[label][0])
        n_targets += len(targets)
        # profile-vs-profile pick matching (tight radius: the profiles
        # differ only in normalization statistics + denoise dtype)
        _s32, c32 = picks["f32"]
        _sf, cf = picks["fast"]
        assignment, dist = match_coordinates(c32, cf, 4)
        n_matched += int(assignment.sum())
        n_union_max += max(len(c32), len(cf))
        disp.extend(np.asarray(dist)[assignment > 0].tolist())
        d32 = np.asarray(fns_f32[1](raw_j))
        dfast = np.asarray(fns_fast[1](raw_j))
        rel_err.append(float(np.linalg.norm(dfast - d32)
                             / np.linalg.norm(d32)))
    ap = {k: float(average_precision(np.concatenate(hits[k]),
                                     np.concatenate(scores[k]),
                                     N=n_targets))
          for k in ("f32", "fast")}
    return {
        "fixture": (f"{N_QUALITY_MICS} CTF-modulated 4096^2 micrographs, "
                    "80 planted particles each, defocus spread "
                    "(topaz_tpu/utils/synthetic.make_ctf_micrograph)"),
        "ap_f32": round(ap["f32"], 4),
        "ap_fast": round(ap["fast"], 4),
        "picks_f32": counts["f32"],
        "picks_fast": counts["fast"],
        "matched_pick_fraction": round(n_matched / max(n_union_max, 1), 4),
        "matched_pick_mean_displacement_px": round(
            float(np.mean(disp)) if disp else 0.0, 3),
        "denoise_rel_err": round(float(np.mean(rel_err)), 5),
    }


def bench_extract_only(extract, raw) -> float:
    """Picking-only throughput (no denoise): the workload of `topaz
    extract` on preprocessed data — downsample + GMM normalize + dense
    score + NMS per 4k micrograph, already compiled by bench_compute.

    One untimed pass first: the call right after bench_compute's drain
    measures ~4x under the sustained rate (queue/transport settling over
    the tunneled link), and at ~19 ms/micrograph that transient would
    dominate the window."""
    outs = [extract(raw) for _ in range(4)]
    fetch_async(*[coords for _scores, coords, _count in outs])
    t0 = time.time()
    outs = [extract(raw) for _ in range(N_ITERS * 4)]
    fetch_async(*[coords for _scores, coords, _count in outs])
    return N_ITERS * 4 / (time.time() - t0)


TRAIN_BATCH = 256
# steady-state window: at ~2 ms/step the first few dispatches are still
# filling the async queue over the tunnel; 20 iters under-reported the
# sustained rate by ~35% (measured 108k@20 vs 143k@50 crops/s)
TRAIN_ITERS = 60


def bench_train(rng) -> float:
    """Picker-training throughput (BASELINE config 3): one jitted
    GE-binomial PU train step — on-device forward + penalty + backward +
    Adam — on resnet8_u32-shaped crops at the reference protocol's batch
    size (256). Returns crops/sec; the fused-sampler path (final 71x71
    crops) is what real training runs (profiles/PROFILE.md)."""
    import jax.numpy as jnp

    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.train.methods import make_loss_fn
    from topaz_tpu.train.trainer import (init_train_state, make_optimizer,
                                         make_train_step)

    spec, params, state = load_picker("resnet8_u32")
    loss_fn, _header, _split = make_loss_fn("GE-binomial", 0.025)
    opt = make_optimizer(2e-4, "adam")
    step = make_train_step(spec, loss_fn, opt)
    st = init_train_state(spec, params, state, opt, 0.025)
    crops = jnp.asarray(
        rng.normal(0, 1, (TRAIN_BATCH, spec.width, spec.width))
        .astype(np.float32))
    labels = jnp.asarray((np.arange(TRAIN_BATCH) < 16).astype(np.float32))

    t0 = time.time()
    st, metrics = step(st, crops, labels)
    _ = float(np.asarray(metrics["loss"]))
    print(f"# bench: train-step compile done in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    t0 = time.time()
    for _ in range(TRAIN_ITERS):
        st, metrics = step(st, crops, labels)
    _ = float(np.asarray(metrics["loss"]))  # drain the async queue
    elapsed = time.time() - t0
    return TRAIN_ITERS * TRAIN_BATCH / elapsed


N_PIPELINE_FILES = 32
PIPELINE_BATCH = 8


def bench_pipeline(rng) -> float:
    """End-to-end system throughput: N distinct 4096x4096 MRC files on
    disk -> prefetch-threaded load + host Fourier crop (8x) -> device GMM
    normalize + dense scoring + NMS + U-Net denoise at picking scale ->
    picks and denoised images fetched to host. Includes all host I/O.

    The host->device link here is a ~15 MB/s relay (an environment
    artifact; a real v5e host moves GB/s over PCIe), so the pipeline runs
    the Fourier crop in the loader threads (host_downsample) and ships
    only the 8x-downsampled pixels — the same bytes-on-the-wire decision a
    production deployment would make for any constrained ingest link.
    """
    import shutil
    import tempfile

    from topaz_tpu.io import mrc
    from topaz_tpu.pipeline import MicrographPipeline

    tmpdir = tempfile.mkdtemp(prefix="topaz_bench_")
    try:
        print(f"# bench: writing {N_PIPELINE_FILES} 4k micrographs...",
              file=sys.stderr, flush=True)
        paths = []
        w = 96  # plant each particle in a local +-4 sigma window only
        yy, xx = np.mgrid[-w:w, -w:w].astype(np.float32)
        blob = 3.0 * np.exp(-(yy**2 + xx**2) / (2 * 24.0**2))
        for i in range(N_PIPELINE_FILES):
            x = rng.standard_normal((4096, 4096), dtype=np.float32)
            for cy, cx in rng.integers(300, 3800, size=(40, 2)):
                x[cy - w : cy + w, cx - w : cx + w] -= blob
            p = os.path.join(tmpdir, f"mic{i}.mrc")
            mrc.write(p, x)
            paths.append(p)

        pipe = MicrographPipeline(
            model="resnet8_u32", denoise_model="unet", scale=8, radius=14,
            threshold=-6.0, normalize=True, host_downsample=True,
            num_workers=2,  # single host CPU here; more threads just fight the GIL
        )
        # warmup/compile on the first batch worth of files
        t0 = time.time()
        for _ in pipe.process(paths[:PIPELINE_BATCH],
                              batch_size=PIPELINE_BATCH):
            pass
        print(f"# bench: pipeline warmup/compile done in "
              f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)

        best = 0.0
        for rep in range(3):  # best-of-3: the tunnel has large variance
            t0 = time.time()
            n_done = 0
            n_picks = 0
            for path, scores, coords, den in pipe.process(
                    paths, batch_size=PIPELINE_BATCH):
                n_done += 1
                n_picks += len(scores)
            elapsed = time.time() - t0
            assert n_done == N_PIPELINE_FILES
            print(f"# bench: pipeline rep {rep}: {n_done} files, "
                  f"{n_picks} picks, {elapsed:.1f}s", file=sys.stderr,
                  flush=True)
            best = max(best, n_done / elapsed)
        return best
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def main():
    _wait_for_device()
    rng = np.random.default_rng(0)

    compute_tput, fns_f32 = bench_compute(rng)
    raw4k = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (4096, 4096))
        .astype(np.float32))
    extract_tput = bench_extract_only(fns_f32[0], raw4k)
    fast_tput, fns_fast = bench_compute(np.random.default_rng(0), fast=True)
    print("# bench: measuring fast-profile quality on the CTF fixture...",
          file=sys.stderr, flush=True)
    fast_quality = bench_fast_quality(fns_f32, fns_fast)
    print("# bench: matmul peak micro-bench...", file=sys.stderr, flush=True)
    peaks = bench_matmul_peak()
    print("# bench: denoise3d (BASELINE config 4)...", file=sys.stderr,
          flush=True)
    denoise3d = bench_denoise3d(rng)
    pipeline_tput = bench_pipeline(rng)
    train_tput = bench_train(rng)
    bf16_denoise_tput = bench_denoise_bf16(
        jnp.asarray(rng.normal(0, 1, (4096, 4096)).astype(np.float32)))

    # model FLOP utilization against THIS chip's measured peak (the
    # roofline denominator the r3 verdict asked to pin down)
    mfu = {}
    if DENOISE4K_FLOPS:
        mfu["mfu_denoise4k_bf16"] = round(
            DENOISE4K_FLOPS * bf16_denoise_tput
            / (peaks["measured_peak_tf_s_bf16"] * 1e12), 4)
    if TRAIN_STEP_FLOPS:
        mfu["mfu_train_step_f32"] = round(
            TRAIN_STEP_FLOPS * (train_tput / TRAIN_BATCH)
            / (peaks["measured_peak_tf_s_f32"] * 1e12), 4)
    mfu["mfu_note"] = ("achieved FLOP/s over the measured matmul peak of "
                       "this chip (not the v5e datasheet); workload FLOPs "
                       "from XLA cost analysis (tools/count_flops.py)")

    vs_baseline = None
    pipeline_vs_cpu = None
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f)
        vs_baseline = compute_tput / base["throughput_micrographs_per_sec"]
        # same-work CPU estimate for the pipeline workload: measured
        # preprocess + scoring + NMS, denoise scaled to picking resolution
        # (512^2 = 4k^2/64)
        t = base["timings_sec"]
        cpu_same_work = (t["preprocess"] + t["dense_score_512"] + t["nms"]
                         + t["denoise_4k_estimated"] / 64.0)
        pipeline_vs_cpu = pipeline_tput * cpu_same_work

    print(json.dumps({
        "metric": "4kx4k micrographs/sec/chip (preprocess+extract+denoise)",
        "value": round(compute_tput, 4),
        "unit": "micrographs/sec",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
        "extra": {
            "fast_profile_mic_per_sec": round(fast_tput, 4),
            "fast_profile_workload": (
                "same compute workload under the documented --fast "
                "profile: histogram-EM normalization (bins=65536) + bf16 "
                "denoise; scoring/NMS stay f32"),
            "fast_profile_quality_delta": fast_quality,
            **peaks,
            **mfu,
            **denoise3d,
            "extract_only_mic_per_sec": round(extract_tput, 4),
            "extract_only_workload": (
                "picking without the denoise arm (topaz extract on raw "
                "4k: device 8x Fourier crop + GMM normalize + dense "
                "resnet8_u32 score + NMS), f32"),
            "pipeline_end_to_end_mic_per_sec": round(pipeline_tput, 4),
            "pipeline_workload": (
                f"{N_PIPELINE_FILES} distinct on-disk 4k MRCs -> threaded "
                "load + host 8x Fourier crop -> device GMM+score+NMS+"
                "denoise@512 -> picks+denoised fetched; batch="
                f"{PIPELINE_BATCH}"),
            "pipeline_vs_cpu_ref_same_work_est": (
                round(pipeline_vs_cpu, 1) if pipeline_vs_cpu else None),
            "train_crops_per_sec": round(train_tput, 1),
            "denoise4k_bf16_mic_per_sec": round(bf16_denoise_tput, 4),
            "denoise4k_bf16_note": ("documented opt-in fast mode "
                                    "(--precision bf16, ~0.4% rel err); "
                                    "headline stays f32 for bit-level "
                                    "reference parity"),
            "train_workload": ("GE-binomial PU train step, resnet8_u32 "
                               f"crops, batch {TRAIN_BATCH}, jitted "
                               "fwd+penalty+bwd+Adam (BASELINE config 3)"),
            "note": ("host->device link here is a ~15 MB/s tunnel "
                     "(environment artifact), hence host-side Fourier crop; "
                     "compute number is round-1 methodology except output "
                     "fetches drain once at the end instead of per "
                     "micrograph (removes tunnel RTT from device timing)"),
        },
    }))


if __name__ == "__main__":
    main()
