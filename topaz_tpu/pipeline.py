"""Batched full pipeline over a device mesh (BASELINE config 5):
mixed-size micrograph sets -> preprocess + dense scoring + NMS + denoise,
with micrographs batched and sharded over the mesh's data axis.

The reference has no batched pipeline at all — each micrograph flows
through Python one at a time with process pools for NMS/normalization
(SURVEY 2.8). Here micrographs are grouped into *rounded* shape buckets:
each image is zero-padded up to the next ``bucket_step`` multiple, so
near-miss camera geometries share one compiled program and batch together.
Padding is masked out everywhere it could change results:

  * GMM normalization fits only valid pixels (weighted sufficient
    statistics + masked quantile init, ops/gmm.py; reference anchor
    topaz/stats.py:36-83 — stats never see padding);
  * the normalized image is re-zeroed outside the valid region, so dense
    scoring sees exactly the zero padding the picker's SAME-conv would
    apply at a true image edge — valid-region scores are bit-equal to the
    per-image program;
  * NMS candidates outside the valid region are masked to -inf
    (topaz/algorithms.py:25-63 only ever sees real pixels).

Fourier-crop downsampling cannot run on padded images (the FFT is global),
so when ``scale > 1`` a tiny per-geometry prep program downsamples and
embeds into the bucket on device; the heavy score+NMS+denoise program
compiles once per bucket. A host-side prefetch thread keeps the device fed.
"""

from __future__ import annotations

import warnings
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class MicrographPipeline:
    """preprocess (downsample + GMM normalize) -> score -> NMS [-> denoise]
    for batches of micrographs, sharded over a mesh when given."""

    def __init__(
        self,
        model: str = "resnet8_u32",
        denoise_model: Optional[str] = None,
        scale: int = 8,
        radius: int = 14,
        threshold: float = -6.0,
        max_peaks: Optional[int] = None,
        normalize: bool = True,
        mesh=None,
        precision=None,
        bucket_step: int = 64,
        host_downsample: bool = False,
        num_workers: int = 4,
        bins: int = 0,
        dtype=None,
        skip_errors: bool = False,
    ):
        from topaz_tpu.models.factory import load_picker

        self.scale = scale
        self.normalize = normalize
        self.radius = radius
        self.threshold = threshold
        self.max_peaks = max_peaks
        self.mesh = mesh
        self.precision = precision
        self.bucket_step = max(1, int(bucket_step))
        # host_downsample: run the Fourier crop in the prefetch threads
        # (numpy pocketfft, GIL-free) so only scale^2-fewer pixels cross the
        # host->device link — the right call when that link, not the chip,
        # is the bottleneck
        self.host_downsample = host_downsample
        self.num_workers = max(1, int(num_workers))
        # bins > 0: histogram-EM normalization over valid pixels (~5x
        # faster than the exact fit at 4k; value-quantized to the bin width)
        self.bins = int(bins)
        # skip_errors: warn and continue past unreadable/corrupt files
        # instead of aborting the whole batch run (production robustness
        # extension; the reference crashes on the first bad file). Default
        # off = reference-faithful fail-fast.
        self.skip_errors = bool(skip_errors)
        # transient device failures (dropped transport, briefly-held device
        # grant) are retried with backoff before surfacing; program errors
        # and OOM are never retried (utils/retry.py)
        self.retries = 1
        self.spec, self.params, self.state = load_picker(model)
        self.denoiser = None
        # dtype='bf16': the fast profile's denoise arm (params +
        # activations bf16, f32 out; scoring and NMS stay f32 so picks
        # keep reference parity) — same contract as Denoise(dtype=...)
        self.dtype = dtype
        if denoise_model is not None:
            from topaz_tpu.models.denoise_factory import (apply_fn_for,
                                                          load_denoiser)

            self.dmeta, self.dparams = load_denoiser(denoise_model)
            if self.dmeta.get("dims", 2) != 2:
                raise ValueError(
                    f"denoise_model {denoise_model!r} is a 3D denoiser; "
                    f"the micrograph pipeline is 2D (use denoise3d for "
                    f"tomograms)")
            base = apply_fn_for(self.dmeta)
            if dtype in ("bf16", "bfloat16"):
                import jax
                import jax.numpy as jnp

                self.dparams = jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, jnp.bfloat16), self.dparams)
                self.denoiser = (
                    lambda p, x, dims=2, precision=None:
                    base(p, x.astype(jnp.bfloat16), dims=dims,
                         precision=precision).astype(jnp.float32))
            else:
                self.denoiser = base
        self._fns: Dict = {}       # (bucket, batch) -> main program
        self._prep_fns: Dict = {}  # (raw shape, bucket) -> downsample+embed

    @property
    def num_programs(self) -> Dict[str, int]:
        """Compiled-program census: 'main' = heavy score+NMS programs (one
        per bucket), 'prep' = tiny per-geometry downsample FFTs."""
        return {"main": len(self._fns), "prep": len(self._prep_fns)}

    # -- shape bucketing ----------------------------------------------------

    def _ds_shape(self, raw_shape: Tuple[int, int]) -> Tuple[int, int]:
        """Shape after Fourier-crop downsampling (ops/fourier.py:34-47)."""
        if self.scale > 1:
            return (int(raw_shape[0] / self.scale),
                    int(raw_shape[1] / self.scale))
        return raw_shape

    def _bucket_for(self, ds_shape: Tuple[int, int]) -> Tuple[int, int]:
        from topaz_tpu.utils.batching import round_bucket

        return round_bucket(ds_shape, self.bucket_step)

    # -- compiled per-bucket programs ---------------------------------------

    def _build(self, bucket: Tuple[int, int]):
        import jax
        import jax.numpy as jnp

        from topaz_tpu.models.picker import apply_picker
        from topaz_tpu.ops.gmm import norm_fit, norm_fit_hist
        from topaz_tpu.ops.nms import NEG, nms_topk_batched

        spec, params, state = self.spec, self.params, self.state
        precision = self.precision
        r, t = self.radius, self.threshold
        # top-k bound: peaks are pairwise > r apart, so a packing bound on
        # the bucket-shaped score map never truncates
        bh, bw = bucket
        if self.max_peaks is not None:
            # lax.top_k requires k <= number of candidates
            k = min(self.max_peaks, bh * bw)
        else:
            k = min(bh * bw,
                    int((bh + r) * (bw + r) / max(np.pi * (r / 2.0) ** 2, 1)) + 16)
        denoiser = self.denoiser
        dparams = getattr(self, "dparams", None)
        normalize = self.normalize
        bins = self.bins

        from topaz_tpu.utils.batching import valid_mask

        # hybrid data x space sharding: when the mesh carries a non-trivial
        # 'space' axis (more devices than micrographs per batch), the image
        # H axis is sharded too — GSPMD inserts the conv halo exchanges for
        # scoring/denoising, the masked-statistic psums, and one
        # all-gather of the (small) score map before the sequential NMS
        # rounds, which run replicated
        n_space = (self.mesh.shape.get("space", 1)
                   if self.mesh is not None else 1)
        spatial = n_space > 1 and bucket[0] % n_space == 0

        def _gather_space(x):
            if not spatial:
                return x
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            return _jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P("data")))

        def fn(padded, valid):  # (B, bh, bw) post-downsample, valid (B, 2)
            B = padded.shape[0]
            mask = valid_mask((bh, bw), valid)
            maskf = mask.astype(padded.dtype)
            # dead-frame guard (documented divergence: the reference's
            # unguarded std division NaNs the whole frame,
            # topaz/stats.py:36-83 / topaz/denoise.py:274-296; in a shared
            # batch that would silently poison results with no trace).
            # Here a constant frame yields 0 picks + passthrough denoise,
            # and the flag is surfaced so the host can warn per path.
            nv = jnp.sum(maskf, axis=(1, 2), keepdims=True)
            m2 = jnp.sum(padded * maskf, axis=(1, 2), keepdims=True) / nv
            v2 = jnp.sum(maskf * (padded - m2) ** 2, axis=(1, 2),
                         keepdims=True) / nv
            degen = (v2 <= 0.0)[:, 0, 0]
            if normalize:
                if bins > 0:
                    fit_one = lambda xf, wf: norm_fit_hist(xf, bins=bins,
                                                           w=wf)
                else:
                    fit_one = lambda xf, wf: norm_fit(xf, w=wf)
                mu, std, *_ = jax.vmap(fit_one)(
                    padded.reshape(B, -1), maskf.reshape(B, -1))
                # re-zero the padding so the picker's SAME-conv sees exactly
                # a true image edge
                norms = (padded - mu[:, None, None]) / std[:, None, None] \
                    * maskf
            else:
                # extract-style inputs are already normalized; padding is
                # already zero
                norms = padded
            scores, _ = apply_picker(spec, params, norms, state=state,
                                     dense=True, precision=precision)
            scores = _gather_space(scores)
            scores = jnp.where(mask, scores, NEG)
            scores = jnp.where(degen[:, None, None], NEG, scores)
            vals, coords, counts = nms_topk_batched(scores, r, t, k)
            out = (vals, coords, counts, degen)
            if denoiser is not None:
                # per-image masked statistics either way (reference
                # _denoise semantics, topaz/denoise.py:274-296); s2 is
                # guarded so a dead frame passes through unchanged
                s2 = jnp.where(degen[:, None, None], 1.0, jnp.sqrt(v2))
                norm_in = ((padded - m2) / s2) * maskf
                # small buckets run the U-Net truly batched (activation
                # footprint B * bh*bw * 64ch stays well under HBM at the
                # picking scale); large micrographs serialize via lax.map
                # to avoid multiplying multi-GB decoder temps by B
                if B * bh * bw <= 8 * 1024 * 1024:
                    y = denoiser(dparams, norm_in[..., None], dims=2,
                                 precision=precision)[..., 0]
                else:
                    y = jax.lax.map(
                        lambda xi: denoiser(dparams, xi[None, ..., None],
                                            dims=2,
                                            precision=precision)[0, ..., 0],
                        norm_in)
                den = y * s2 + m2
                den = jnp.where(degen[:, None, None], padded, den)
                out = out + (den,)
            return out

        from topaz_tpu.parallel.mesh import jit_sharded_args

        return jit_sharded_args(
            fn, self.mesh,
            ("data_space" if spatial else "data", "data"))

    def _fn_for(self, bucket: Tuple[int, int]):
        # keyed by bucket only: the jitted program retraces per batch size
        # by itself, and _build closes over nothing batch-dependent
        if bucket not in self._fns:
            self._fns[bucket] = self._build(bucket)
        return self._fns[bucket]

    def _prep_for(self, raw_shape: Tuple[int, int], bucket: Tuple[int, int]):
        """Tiny per-geometry program: Fourier-crop downsample + embed into
        the zero-filled bucket. The FFT must see the unpadded image."""
        key = (raw_shape, bucket)
        if key not in self._prep_fns:
            import jax
            import jax.numpy as jnp

            from topaz_tpu.ops.fourier import downsample

            scale = self.scale
            ds = self._ds_shape(raw_shape)

            @jax.jit
            def prep(raw):
                small = downsample(raw, scale, shape=ds)
                return jnp.zeros(bucket, jnp.float32).at[
                    : ds[0], : ds[1]].set(small)

            self._prep_fns[key] = prep
        return self._prep_fns[key]

    # -- host-side driver ---------------------------------------------------

    def _load_one(self, path: str, bucket: Tuple[int, int]):
        """Read one micrograph; returns either the raw array (device prep
        will downsample+embed) or the bucket-embedded [downsampled] image
        when no device-side FFT is needed. Runs in loader worker threads."""
        from topaz_tpu.io.image import load_image

        raw = np.asarray(load_image(path), dtype=np.float32)
        if raw.ndim != 2:
            # .mrcs stacks, 3D volumes, RGB images: the shape probe reads
            # only (ny, nx), so the embed/mask math would silently corrupt
            raise ValueError(
                f"{path}: the batched micrograph pipeline handles single "
                f"2D images (got shape {raw.shape}); denoise --stack "
                f"handles movie stacks and denoise3d/extract --dims 3 "
                f"handle volumes")
        if self.scale > 1 and not self.host_downsample:
            return raw
        if self.scale > 1:
            from topaz_tpu.ops.fourier import downsample_numpy

            small = downsample_numpy(raw, self.scale,
                                     shape=self._ds_shape(raw.shape))
        else:
            small = raw
        out = np.zeros(bucket, np.float32)
        out[: small.shape[0], : small.shape[1]] = small
        return out

    def process(self, paths: Sequence[str], batch_size: Optional[int] = None,
                prefetch: int = 2):
        """Process micrograph files; yields
        (path, pick scores, pick coords at the downsampled scale
        [, denoised image cropped to its true size]). Groups by rounded
        shape bucket; pads the final partial batch per bucket by
        repetition (its results are discarded). ``num_workers`` loader
        threads overlap disk reads (and host FFTs) with device compute."""
        import jax.numpy as jnp

        if batch_size is None:
            batch_size = self.mesh.shape["data"] if self.mesh is not None else 1

        # bucket by rounded post-downsample shape, preserving order within
        buckets: Dict[Tuple[int, int], List[Tuple[str, Tuple[int, int]]]] = \
            defaultdict(list)
        for p in paths:
            try:
                raw_shape = _image_shape(p)
            except Exception:
                if not self.skip_errors:
                    raise
                warnings.warn(f"{p}: unreadable header — skipped "
                              f"(--skip-errors)")
                continue
            buckets[self._bucket_for(self._ds_shape(raw_shape))].append(
                (p, raw_shape))

        # background loader keeps the device fed; the queue/sentinel
        # protocol lives in utils.batching.iterate_prefetched
        class _LoadFailure:
            def __init__(self, exc):
                self.exc = exc

        def load_one(it, bucket):
            if not self.skip_errors:
                return self._load_one(it[0], bucket)
            try:
                return self._load_one(it[0], bucket)
            except Exception as e:  # noqa: BLE001 - skipped with warning
                return _LoadFailure(e)

        def load_batches():
            from topaz_tpu.utils.batching import window_batches

            for bucket, items in buckets.items():
                for chunk, n_real, loaded in window_batches(
                        items,
                        lambda it, b=bucket: load_one(it, b),
                        batch_size, batch_size * (prefetch + 1),
                        num_workers=self.num_workers):
                    bad = [(c, l) for c, l in zip(chunk, loaded)
                           if isinstance(l, _LoadFailure)]
                    for (path, _), failure in bad:
                        warnings.warn(f"{path}: {failure.exc} — skipped "
                                      f"(--skip-errors)")
                    if bad:
                        kept = [(c, l) for c, l in zip(chunk, loaded)
                                if not isinstance(l, _LoadFailure)]
                        if not kept:
                            continue
                        chunk = [c for c, _ in kept]
                        n_real = len(chunk)
                        loaded = [l for _, l in kept]
                        loaded = loaded + [loaded[-1]] * (batch_size
                                                          - len(loaded))
                    valid = np.array(
                        [self._ds_shape(rs) for _, rs in chunk]
                        + [self._ds_shape(chunk[-1][1])]
                        * (batch_size - n_real),
                        dtype=np.int32)
                    if self.scale > 1 and not self.host_downsample:
                        payload = loaded  # raws; device prep next
                    else:
                        payload = np.stack(loaded)
                    yield (bucket, chunk, n_real, payload, valid)

        from topaz_tpu.utils.batching import iterate_prefetched
        from topaz_tpu.utils.profiling import stage, sync_for_timing

        for item in iterate_prefetched(load_batches,
                                       maxsize=max(1, prefetch)):
            bucket, chunk, n_real, payload, valid = item
            fn = self._fn_for(bucket)

            def dispatch_and_fetch():
                with stage(f"pipeline/batch{bucket}"):
                    if isinstance(payload, list):  # raws; device downsample
                        smalls = [
                            self._prep_for(r.shape, bucket)(jnp.asarray(r))
                            for r in payload
                        ]
                        arr = jnp.stack(smalls)
                    else:
                        arr = jnp.asarray(payload)
                    out = fn(arr, jnp.asarray(valid))
                    # timing policy: dispatch is async, so the stage block
                    # alone measures only Python dispatch; when timings or
                    # a profile are requested, block on the outputs here so
                    # the per-batch number includes device compute
                    sync_for_timing(out)
                # fetch inside the retried scope: a dropped transport can
                # surface at the copy-out, not the dispatch; overlap the
                # copies (one RTT total, not one per output tensor)
                from topaz_tpu.utils.batching import fetch_async

                return fetch_async(out[0], out[1], out[2], out[3],
                                   out[4] if len(out) > 4 else None)

            from topaz_tpu.utils.retry import retry_transient

            scores, coords, counts, degen, dens = retry_transient(
                dispatch_and_fetch, retries=self.retries,
                what=f"pipeline batch {bucket}")
            for i, (path, _raw_shape) in enumerate(chunk):
                if degen[i]:
                    warnings.warn(
                        f"{path}: constant image (std=0) — no picks "
                        f"emitted and denoising passes it through "
                        f"unchanged (the reference NaNs such frames)")
                n = int(counts[i])
                result = (path, scores[i, :n], coords[i, :n])
                if dens is not None:
                    vh, vw = valid[i]
                    result = result + (dens[i, :vh, :vw],)
                yield result


def _image_shape(path: str) -> Tuple[int, int]:
    """Cheap (H, W) probe per format — header-only for MRC, metadata-only
    for PIL formats, mmap for npy."""
    import os

    ext = os.path.splitext(path)[1].lower()
    if ext in (".mrc", ".mrcs"):
        from topaz_tpu.io.mrc import parse_header

        with open(path, "rb") as f:
            h = parse_header(f.read(1024))
        return (int(h.ny), int(h.nx))
    if ext in (".tiff", ".tif", ".png", ".jpg", ".jpeg"):
        from PIL import Image

        with Image.open(path) as im:
            return (im.height, im.width)
    if ext == ".npy":
        arr = np.load(path, mmap_mode="r")
        return (arr.shape[-2], arr.shape[-1])
    raise ValueError(f"unsupported micrograph format for batching: {path}")
