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

Reporting contract (VERDICT r4):
  * every throughput metric is {med, best, reps, spread_pct} — the
    single-number headline is the MEDIAN, not the best run ever seen
    (the tunnel swings +-50% round over round);
  * the matmul-peak roofline denominators are re-measured until they
    satisfy the physical ordering peak_bf16 >= peak_f32_default >=
    peak_f32_highest (f32-default IS one bf16 MXU pass) and sit under
    1.25x the v5e datasheet; otherwise peak_unreliable=true is published
    and the MFU fields are withheld instead of impossible numbers
    (BENCH_r04 shipped mfu 2.64 from an 8.4 TF/s bf16 denominator);
  * every published mfu_* is checked <= 1;
  * the stdout JSON line is kept under ~1900 chars — the driver records
    only the last ~2000 chars of output, and the round-4 line outgrew
    that window and failed to parse (BENCH_r04.json parsed: null).
    Prose workload descriptions go to stderr; the full detailed record
    is also written to profiles/bench_last_local.json.
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
N_REPS = 3  # timed windows per metric -> med/best/spread in the artifact
COMPUTE_SIZE = 4096  # micrograph edge for the compute/denoise workloads
                     # (module constant so a CPU smoke drive can shrink it)
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
# fixture-trained picker (tools/quality_compare.py --keep-checkpoint,
# AP ~0.66 on the hardened CTF fixture): bench_fast_quality scores with
# it so ap_f32/ap_fast sit at an operating point a regression would move
# (the pretrained resnet8_u32 is near chance on this fixture and its AP
# only compared two noise floors — VERDICT r4 weak #4)
FIXTURE_CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profiles", "fixture_resnet8_r5.npz")

# Workload FLOP counts from XLA's cost analysis of the compiled programs
# (tools/count_flops.py; backend-independent). Regenerate with
#   JAX_PLATFORMS=cpu python tools/count_flops.py
# (last regenerated at HEAD 2026-08-19, labels-vector step signature;
#  tests/test_tools.py smoke-lowers the tool so a step refactor can't
#  silently strand these constants again)
DENOISE4K_FLOPS = 4.62152e12   # whole-image unet-v0.2.1 @ 4096^2
TRAIN_STEP_FLOPS = 4.51093e10  # GE-binomial resnet8_u32 fwd+bwd+adam, b=256

# physical sanity cap for the measured peak: the v5e datasheet bf16 rate
# (197 TF/s) plus timing-noise headroom. A "measurement" above this is a
# clock glitch, not a faster chip.
V5E_DATASHEET_BF16_TF_S = 197.0
PEAK_CAP_TF_S = 1.25 * V5E_DATASHEET_BF16_TF_S
# same idea for HBM: v5e datasheet ~819 GB/s
V5E_DATASHEET_HBM_GB_S = 819.0
HBM_CAP_GB_S = 1.25 * V5E_DATASHEET_HBM_GB_S


def bench_hbm_peak(reps: int = 3, k_small: int = 16,
                   k_big: int = 256, n: int = 256 * 1024 * 1024) -> dict:
    """Measured HBM streaming bandwidth of THIS chip, by two-point
    differencing: ONE compiled program runs ``k`` loop-carried
    elementwise passes (y = y + 1) over a 1 GiB f32 array, with ``k`` a
    traced scalar so the same executable is timed at k_small and k_big.
    Each while-loop iteration reads + writes every byte (XLA cannot fuse
    across the loop back edge), so bandwidth =
    (k_big - k_small) * 2 GiB / (t_big - t_small) — the dispatch/fetch
    RTT (~25-40 ms over the tunnel here) and any fixed per-call overhead
    cancel in the difference. A naive single-pass version measured
    "82 GB/s"; that was the RTT, not the memory system. This is the
    roofline denominator for the bandwidth-utilization numbers: the 4k
    U-Net's top levels are HBM-bound (64ch x 4096^2 activations are
    ~2 GiB in bf16 per tensor), so bytes/s — not FLOP/s — is the binding
    resource for denoise, and an 'MFU 0.2' there is the roofline, not a
    deficiency. ``n`` (f32 elements; default 1 GiB) is a parameter only
    so device-free tests can exercise the plumbing."""
    x = jnp.zeros((n,), jnp.float32)

    @jax.jit
    def touch(x, k):
        return jax.lax.fori_loop(0, k, lambda i, y: y + 1.0, x)

    def timed(k):
        t0 = time.time()
        y = touch(x, jnp.int32(k))
        _ = np.asarray(y[:1])
        return time.time() - t0

    timed(1)  # compile + first-dispatch penalty
    best = 0.0
    for _ in range(reps):
        t_small, t_big = timed(k_small), timed(k_big)
        if t_big > t_small:
            gb_s = ((k_big - k_small) * 2.0 * 4.0 * n
                    / (t_big - t_small) / 1e9)
            if gb_s <= HBM_CAP_GB_S:
                best = max(best, gb_s)
    return {"measured_hbm_gb_s": round(best, 0),
            "hbm_unreliable": not (0 < best <= HBM_CAP_GB_S)}


def _bytes_accessed(jitted, *args):
    """TPU-compiled bytes accessed of an already-jitted function (cache
    hit — no recompile). Returns None when the backend's cost analysis
    does not expose it; callers then skip the bandwidth-utilization
    metric instead of publishing a guess."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        val = cost.get("bytes accessed")
        return float(val) if val else None
    except Exception:  # noqa: BLE001 — strictly best-effort instrumentation
        return None


def _stats(reps):
    """{med, best, reps, spread_pct} for a list of throughput reps —
    med is the published headline; spread records tunnel weather."""
    v = sorted(float(x) for x in reps)
    n = len(v)
    med = v[n // 2] if n % 2 else 0.5 * (v[n // 2 - 1] + v[n // 2])
    return {"med": round(med, 4), "best": round(v[-1], 4),
            "reps": [round(float(x), 4) for x in reps],
            "spread_pct": round(100.0 * (v[-1] - v[0]) / med, 1)
            if med else None}


def _peaks_ok(p):
    """Physical invariants on the roofline denominators: bf16 >= f32
    default (f32-default is itself ONE bf16 MXU pass with f32
    accumulation, so it can never beat bf16) >= f32 HIGHEST (multi-pass),
    and nothing above the datasheet+noise cap."""
    return (p["bf16"] >= p["f32"] >= p["f32_highest"] > 0
            and p["bf16"] <= PEAK_CAP_TF_S)


def bench_matmul_peak(max_attempts: int = 3, reps: int = 5) -> dict:
    """Measured matmul peak of THIS chip per dtype: a chain of 8192^2
    dots compiled as one program. Per dtype the peak is the best rep
    across up to ``max_attempts`` full sweeps; sweeps repeat until the
    physical invariants hold (_peaks_ok). If they never do, the result
    is published with peak_unreliable=true and the caller withholds MFU
    rather than divide by a corrupted denominator (VERDICT r4 weak #1:
    best-of-3 once was not enough on the tunneled chip)."""
    n, chain_len = 8192, 8
    seed = np.random.default_rng(1)
    host = (seed.normal(0, 1, (n, n)) / np.sqrt(n)).astype(np.float32)
    cases = (("bf16", jnp.bfloat16, None),
             ("f32", jnp.float32, None),
             ("f32_highest", jnp.float32, jax.lax.Precision.HIGHEST))
    best = {name: 0.0 for name, _, _ in cases}
    attempts = 0
    for attempt in range(max_attempts):
        attempts += 1
        for name, dtype, prec in cases:
            a = jnp.asarray(host, dtype)

            @jax.jit
            def chain(x):
                y = x
                for _ in range(chain_len):
                    y = jnp.dot(y, x, precision=prec)
                return y

            _ = np.asarray(chain(a)[:1, :1])  # compile + one run
            for _ in range(reps):
                t0 = time.time()
                r = chain(a)
                _ = np.asarray(r[:1, :1])
                tf_s = 2.0 * n**3 * chain_len / (time.time() - t0) / 1e12
                # reject obvious clock glitches, keep the max of the rest
                if tf_s <= PEAK_CAP_TF_S:
                    best[name] = max(best[name], tf_s)
        if _peaks_ok(best):
            break
        print(f"# bench: peak sweep {attempt + 1} violates the physical "
              f"ordering ({ {k: round(v, 1) for k, v in best.items()} }); "
              f"re-measuring...", file=sys.stderr, flush=True)
    ok = _peaks_ok(best)
    out = {f"measured_peak_tf_s_{k}": round(v, 1) for k, v in best.items()}
    out["peak_unreliable"] = not ok
    out["peak_sweeps"] = attempts
    print("# bench peak method: chain of 8192^2 dots, best rep over "
          f"{attempts} sweep(s) x {reps} reps, this chip via the tunnel; "
          "f32 = default precision (one bf16 MXU pass + f32 accumulate, "
          "what f32 convs here actually run), f32_highest = multi-pass "
          "true f32. Invariant bf16 >= f32 >= f32_highest enforced; "
          f"unreliable={not ok}", file=sys.stderr, flush=True)
    return out


DENOISE3D_SHAPE = (192, 384, 384)  # BASELINE config 4 tomogram
N_REPS_3D = 2  # ~40 s per f32 rep; 2 bounds bench wall time


def bench_denoise3d(rng) -> dict:
    """denoise3d throughput (BASELINE config 4): one 192x384x384 tomogram
    through the 3D U-Net patch path at the reference defaults (-s 96
    -p 48, topaz/commands/denoise3d.py:52-53), f32; and under the
    documented fast profile (bf16 + --auto-patch). Pretrained 3D weights
    are stripped from this mirror, so the model is random-init unet-3d —
    identical compute either way."""
    from topaz_tpu.denoise import Denoise3D, auto_patch_size

    tomo = rng.normal(0, 1, DENOISE3D_SHAPE).astype(np.float32)
    voxels = float(np.prod(DENOISE3D_SHAPE))
    out = {}
    fast_patch = auto_patch_size(DENOISE3D_SHAPE, padding=48)
    for label, dtype, patch in (("f32", None, 96),
                                ("fast", "bf16", fast_patch)):
        den = Denoise3D.from_arch("unet", dims=3, dtype=dtype)
        # warmup: run the full tomogram once — the device-resident path's
        # program is keyed on the full volume shape, so only an
        # identical-shape run pre-compiles what the timed run executes
        den.denoise(tomo, patch_size=patch, padding=48, verbose=False)
        reps = []
        for _ in range(N_REPS_3D):
            t0 = time.time()
            den.denoise(tomo, patch_size=patch, padding=48, verbose=False)
            reps.append(voxels / (time.time() - t0))
        out[f"denoise3d_{label}_vox_s"] = _stats(reps)
    out["denoise3d_fast_patch"] = int(fast_patch)
    print(f"# bench denoise3d workload: {DENOISE3D_SHAPE} tomogram, 3D "
          "U-Net patch path; f32 at the reference defaults -s 96 -p 48, "
          "fast = bf16 + --auto-patch (BASELINE config 4)",
          file=sys.stderr, flush=True)
    return out


def build_pipeline(fast: bool = False, model: str = "resnet8_u32"):
    """The per-micrograph compute pipeline. ``fast=True`` builds the
    documented fast profile (CLI ``--fast``): histogram-EM normalization
    (bins=65536, all pixels) + bf16 denoise (params+activations bf16, f32
    out). Scoring/NMS stay f32 in both profiles (pick parity).
    ``model`` may be a checkpoint path (bench_fast_quality scores with
    the committed fixture-trained picker)."""
    from topaz_tpu.models.denoise_factory import apply_fn_for, load_denoiser
    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.models.picker import apply_picker
    from topaz_tpu.ops.fourier import downsample
    from topaz_tpu.ops.gmm import norm_fit, norm_fit_hist
    from topaz_tpu.ops.nms import nms_topk_2d

    spec, params, state = load_picker(model)
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


def bench_denoise_bf16(raw):
    """Denoise@4k in the documented bf16 opt-in fast mode (CLI:
    --precision bf16): micrographs/sec for the denoise stage alone,
    showing the measured headroom over the f32 parity default. Returns
    (stats, bytes_accessed) — the compiled program's own bytes-accessed
    figure feeds the HBM-utilization roofline."""
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
    reps = []
    for _ in range(N_REPS):
        t0 = time.time()
        outs = [denoise16(raw) for _ in range(N_ITERS)]
        fetch_async(*[den[:1, :1] for den in outs])
        reps.append(N_ITERS / (time.time() - t0))
    return _stats(reps), _bytes_accessed(denoise16, raw)


def bench_compute(rng, fast: bool = False):
    """Device-compute throughput: one resident 4k micrograph through
    preprocess + extract + denoise@4k (round-1 headline, kept comparable).

    ``fast=True`` measures the documented fast profile. Returns
    (stats, (extract, denoise)) — the compiled pipeline functions are
    reused by bench_extract_only and the fast-quality rel-err check."""
    raw = jnp.asarray(
        rng.normal(0, 1, (COMPUTE_SIZE, COMPUTE_SIZE)).astype(np.float32))

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
    reps = []
    for _ in range(N_REPS):
        t0 = time.time()
        outs = []
        for _ in range(N_ITERS):
            scores, coords, count = extract(raw)
            den = denoise(raw)
            outs.append((coords, den[:1, :1]))
        fetch_async(*[a for pair in outs for a in pair])
        reps.append(N_ITERS / (time.time() - t0))
    return _stats(reps), (extract, denoise)


# fast-quality fixture: the quality-parity protocol's geometry and
# difficulty (tools/quality_compare.py: 2048^2 raw, 20 particles,
# signal 0.8, crowding 1.6, defocus spread) — the operating point the
# committed checkpoint was trained at, NOT the easy signal-6 fixture
N_QUALITY_MICS = 4
QUALITY_FIXTURE = dict(size=2048, n_particles=20, signal=0.8, min_sep=1.6)


def bench_fast_quality(fns_f32, fns_fast) -> dict:
    """Fast-profile quality delta measured at a MEANINGFUL operating
    point (VERDICT r4 weak #4): picks come from the committed
    fixture-trained checkpoint (AP ~0.66 on this fixture — where a
    normalization/dtype regression would move AP), not the pretrained
    model that is near chance here. Reports planted-particle AP under
    both profiles, the Hungarian-matched fraction + displacement between
    the two pick sets (picks contract:
    /root/reference/topaz/extract.py:266-354), and the denoise relative
    error on the same realistic images (denoise fns from the headline
    pipelines)."""
    from topaz_tpu.ops.metrics import average_precision, match_coordinates
    from topaz_tpu.utils.synthetic import make_ctf_micrograph

    model = FIXTURE_CKPT if os.path.exists(FIXTURE_CKPT) else "resnet8_u32"
    print(f"# bench fast-quality picker: {model}", file=sys.stderr,
          flush=True)
    ex32, _dn32 = build_pipeline(fast=False, model=model)
    exfast, _dnfast = build_pipeline(fast=True, model=model)

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
            rng, defocus_A=float(rng.uniform(10000.0, 30000.0)),
            **QUALITY_FIXTURE)
        # planted centers at the 8x-downsampled picking scale, (x, y)
        targets = np.array([[cx / 8.0, cy / 8.0] for cy, cx in centers])
        raw_j = jnp.asarray(raw)
        picks = {}
        for label, extract in (("f32", ex32), ("fast", exfast)):
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
    print(f"# bench fast-quality fixture: {N_QUALITY_MICS} CTF-modulated "
          f"{QUALITY_FIXTURE['size']}^2 micrographs, "
          f"{QUALITY_FIXTURE['n_particles']} planted particles each, "
          f"signal {QUALITY_FIXTURE['signal']}, defocus spread "
          "(topaz_tpu/utils/synthetic.make_ctf_micrograph — the "
          "quality-parity protocol fixture)", file=sys.stderr, flush=True)
    return {
        "picker": os.path.basename(model),
        "ap_f32": round(ap["f32"], 4),
        "ap_fast": round(ap["fast"], 4),
        "picks_f32": counts["f32"],
        "picks_fast": counts["fast"],
        "matched_pick_fraction": round(n_matched / max(n_union_max, 1), 4),
        "matched_pick_disp_px": round(
            float(np.mean(disp)) if disp else 0.0, 3),
        "denoise_rel_err": round(float(np.mean(rel_err)), 5),
    }


def bench_extract_only(extract, raw) -> dict:
    """Picking-only throughput (no denoise): the workload of `topaz
    extract` on preprocessed data — downsample + GMM normalize + dense
    score + NMS per 4k micrograph, already compiled by bench_compute.

    One untimed pass first: the call right after bench_compute's drain
    measures ~4x under the sustained rate (queue/transport settling over
    the tunneled link), and at ~19 ms/micrograph that transient would
    dominate the window."""
    outs = [extract(raw) for _ in range(4)]
    fetch_async(*[coords for _scores, coords, _count in outs])
    reps = []
    for _ in range(N_REPS):
        t0 = time.time()
        outs = [extract(raw) for _ in range(N_ITERS * 4)]
        fetch_async(*[coords for _scores, coords, _count in outs])
        reps.append(N_ITERS * 4 / (time.time() - t0))
    return _stats(reps)


TRAIN_BATCH = 256
# steady-state window: at ~2 ms/step the first few dispatches are still
# filling the async queue over the tunnel; 20 iters under-reported the
# sustained rate by ~35% (measured 108k@20 vs 143k@50 crops/s)
TRAIN_ITERS = 60


def bench_train(rng) -> dict:
    """Picker-training throughput (BASELINE config 3): one jitted
    GE-binomial PU train step — on-device forward + penalty + backward +
    Adam — on resnet8_u32-shaped crops at the reference protocol's batch
    size (256). Returns crops/sec stats; the fused-sampler path (final
    71x71 crops) is what real training runs (profiles/PROFILE.md)."""
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

    reps = []
    for _ in range(N_REPS):
        t0 = time.time()
        for _ in range(TRAIN_ITERS):
            st, metrics = step(st, crops, labels)
        _ = float(np.asarray(metrics["loss"]))  # drain the async queue
        reps.append(TRAIN_ITERS * TRAIN_BATCH / (time.time() - t0))
    return _stats(reps)


# mixed-size pipeline (BASELINE config 5 as specified: the bucketing
# path is what gets timed, not 32 identical files — VERDICT r4 item 7).
# Three real camera geometries: K2 super-res-binned 4k, K3 (5760x4092),
# Falcon-ish 3838x3710. 8 files each.
PIPELINE_GEOMETRIES = [(4096, 4096), (5760, 4092), (3838, 3710)]
N_PIPELINE_FILES = 24
PIPELINE_BATCH = 8


def bench_pipeline(rng):
    """End-to-end system throughput: N distinct MIXED-SIZE MRC files on
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
        print(f"# bench: writing {N_PIPELINE_FILES} mixed-size micrographs "
              f"{PIPELINE_GEOMETRIES}...", file=sys.stderr, flush=True)
        paths = []
        w = 96  # plant each particle in a local +-4 sigma window only
        yy, xx = np.mgrid[-w:w, -w:w].astype(np.float32)
        blob = 3.0 * np.exp(-(yy**2 + xx**2) / (2 * 24.0**2))
        px_total = 0
        for i in range(N_PIPELINE_FILES):
            h, wd = PIPELINE_GEOMETRIES[i % len(PIPELINE_GEOMETRIES)]
            px_total += h * wd
            x = rng.standard_normal((h, wd), dtype=np.float32)
            # planting margin: 300 px at camera sizes, size-relative for
            # shrunk smoke drives (never below the blob half-width)
            my, mx = (min(300, max(w, d // 4)) for d in (h, wd))
            cys = rng.integers(my, h - my, size=40)
            cxs = rng.integers(mx, wd - mx, size=40)
            for cy, cx in zip(cys, cxs):
                x[cy - w : cy + w, cx - w : cx + w] -= blob
            p = os.path.join(tmpdir, f"mic{i}.mrc")
            mrc.write(p, x)
            paths.append(p)

        pipe = MicrographPipeline(
            model="resnet8_u32", denoise_model="unet", scale=8, radius=14,
            threshold=-6.0, normalize=True, host_downsample=True,
            num_workers=2,  # single host CPU here; more threads just fight the GIL
        )
        # warmup/compile on one batch containing every geometry
        t0 = time.time()
        warm = [paths[i] for i in range(len(PIPELINE_GEOMETRIES))]
        for _ in pipe.process(warm * 2, batch_size=PIPELINE_BATCH):
            pass
        print(f"# bench: pipeline warmup/compile done in "
              f"{time.time() - t0:.1f}s; programs={pipe.num_programs}",
              file=sys.stderr, flush=True)

        reps = []
        for rep in range(N_REPS):  # tunnel has large variance
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
            reps.append(n_done / elapsed)
        print(f"# bench pipeline workload: {N_PIPELINE_FILES} distinct "
              f"on-disk MRCs, {len(PIPELINE_GEOMETRIES)} camera geometries "
              f"{PIPELINE_GEOMETRIES} -> threaded load + host 8x Fourier "
              "crop -> device masked-bucket GMM+score+NMS+denoise at "
              f"picking scale -> picks+denoised fetched; batch="
              f"{PIPELINE_BATCH}", file=sys.stderr, flush=True)
        mean_px = px_total / N_PIPELINE_FILES
        return _stats(reps), pipe.num_programs, mean_px
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def main():
    _wait_for_device()
    rng = np.random.default_rng(0)

    compute, fns_f32 = bench_compute(rng)
    raw4k = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (COMPUTE_SIZE, COMPUTE_SIZE))
        .astype(np.float32))
    extract_only = bench_extract_only(fns_f32[0], raw4k)
    fast, fns_fast = bench_compute(np.random.default_rng(0), fast=True)
    print("# bench: measuring fast-profile quality on the CTF fixture...",
          file=sys.stderr, flush=True)
    fast_quality = bench_fast_quality(fns_f32, fns_fast)
    print("# bench: matmul peak micro-bench...", file=sys.stderr, flush=True)
    peaks = bench_matmul_peak()
    print("# bench: denoise3d (BASELINE config 4)...", file=sys.stderr,
          flush=True)
    denoise3d = bench_denoise3d(rng)
    pipeline, pipe_programs, pipe_mean_px = bench_pipeline(rng)
    train = bench_train(rng)
    bf16_denoise, d4k_bytes = bench_denoise_bf16(
        jnp.asarray(rng.normal(0, 1, (COMPUTE_SIZE, COMPUTE_SIZE))
                    .astype(np.float32)))
    print("# bench: HBM bandwidth micro-bench...", file=sys.stderr,
          flush=True)
    hbm = bench_hbm_peak()

    # model FLOP utilization against THIS chip's measured peak. Withheld
    # (null) rather than published when the denominator failed its
    # physical invariants or the resulting MFU is impossible (>1).
    mfu = {}
    if not peaks["peak_unreliable"]:
        mfu["mfu_denoise4k_bf16"] = round(
            DENOISE4K_FLOPS * bf16_denoise["med"]
            / (peaks["measured_peak_tf_s_bf16"] * 1e12), 4)
        mfu["mfu_train_step_f32"] = round(
            TRAIN_STEP_FLOPS * (train["med"] / TRAIN_BATCH)
            / (peaks["measured_peak_tf_s_f32"] * 1e12), 4)
        if any(v > 1.0 for v in mfu.values()):
            print(f"# bench: MFU > 1 is impossible ({mfu}); marking the "
                  "peak measurement unreliable and withholding MFU",
                  file=sys.stderr, flush=True)
            peaks["peak_unreliable"] = True
            mfu = {}
    if not mfu:
        mfu = {"mfu_denoise4k_bf16": None, "mfu_train_step_f32": None}
    # bandwidth side of the roofline: the 4k denoise is HBM-bound at its
    # top levels, so report achieved bytes/s over the measured HBM peak
    # (bytes from the TPU backend's own cost analysis of the compiled
    # program) — withheld when the denominator or numerator is missing
    # or the ratio is impossible
    mfu["hbm_util_denoise4k_bf16"] = None
    if d4k_bytes and not hbm["hbm_unreliable"]:
        util = (d4k_bytes * bf16_denoise["med"]
                / (hbm["measured_hbm_gb_s"] * 1e9))
        if util <= 1.0:
            mfu["hbm_util_denoise4k_bf16"] = round(util, 4)
        else:
            print(f"# bench: HBM util > 1 is impossible ({util:.3f}); "
                  "withholding", file=sys.stderr, flush=True)
            hbm["hbm_unreliable"] = True
    print("# bench mfu method: achieved FLOP/s over the measured matmul "
          "peak of this chip (not the v5e datasheet); workload FLOPs from "
          "XLA cost analysis (tools/count_flops.py); medians used. "
          f"denoise4k bf16 bytes accessed (TPU cost analysis): {d4k_bytes}",
          file=sys.stderr, flush=True)

    vs_baseline = None
    pipeline_vs_cpu = None
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f)
        vs_baseline = compute["med"] / base["throughput_micrographs_per_sec"]
        # same-work CPU estimate for the pipeline workload: measured
        # preprocess + scoring + NMS, denoise scaled to picking resolution
        # (1/64 of raw pixels), all scaled by the mixed-size workload's
        # mean pixel count relative to the 4k^2 the baseline was timed on
        t = base["timings_sec"]
        cpu_4k = (t["preprocess"] + t["dense_score_512"] + t["nms"]
                  + t["denoise_4k_estimated"] / 64.0)
        cpu_same_work = cpu_4k * (pipe_mean_px / float(4096 * 4096))
        pipeline_vs_cpu = pipeline["med"] * cpu_same_work

    record = {
        "metric": "4kx4k micrographs/sec/chip (preprocess+extract+denoise)",
        "value": compute["med"],
        "unit": "micrographs/sec",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
        "extra": {
            "headline_is_median_of": compute,
            "fast_profile_mic_s": fast,
            "fast_profile_quality": fast_quality,
            **peaks,
            **hbm,
            **mfu,
            **denoise3d,
            "extract_only_mic_s": extract_only,
            "pipeline_mixed_mic_s": pipeline,
            "pipeline_geometries": len(PIPELINE_GEOMETRIES),
            "pipeline_programs": pipe_programs,
            "pipeline_vs_cpu_ref_same_work_est": (
                round(pipeline_vs_cpu, 1) if pipeline_vs_cpu else None),
            "train_crops_s": train,
            "denoise4k_bf16_mic_s": bf16_denoise,
            "note": ("each stat is {med,best,reps,spread_pct}; headlines "
                     "are MEDIANS. Workload descriptions on stderr + "
                     "profiles/bench_last_local.json"),
        },
    }
    # full record for the repo (the driver keeps only the stdout tail)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "profiles", "bench_last_local.json"),
                  "w") as f:
            json.dump(record, f, indent=1)
    except OSError:
        pass

    print(compact_line(record))


def compact_line(record: dict, limit: int = 1900) -> str:
    """The driver records only the last ~2000 chars of output (BENCH_r04's
    line outgrew that window and failed to parse) — degrade gracefully:
    drop per-rep arrays, then the note, before the line exceeds the
    window."""
    line = json.dumps(record)
    if len(line) > limit:
        for v in record["extra"].values():
            if isinstance(v, dict) and "reps" in v:
                v.pop("reps")
        line = json.dumps(record)
    if len(line) > limit:
        record["extra"].pop("note", None)
        line = json.dumps(record)
    return line


if __name__ == "__main__":
    main()
