"""Batched full pipeline over a device mesh (BASELINE config 5):
mixed-size micrograph sets -> preprocess + dense scoring + NMS + denoise,
with same-shape micrographs batched and sharded over the mesh's data axis.

The reference has no batched pipeline at all — each micrograph flows
through Python one at a time with process pools for NMS/normalization
(SURVEY 2.8). Here micrographs are grouped into shape buckets (cryo-EM
collections typically contain a handful of distinct camera geometries);
each bucket is processed as sharded batches under one jit program per
shape, with a host-side prefetch thread keeping the device fed.
"""

from __future__ import annotations

import queue
import threading
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
    ):
        import jax

        from topaz_tpu.models.factory import load_picker

        self.scale = scale
        self.normalize = normalize
        self.radius = radius
        self.threshold = threshold
        self.max_peaks = max_peaks
        self.mesh = mesh
        self.precision = precision
        self.spec, self.params, self.state = load_picker(model)
        self.denoiser = None
        if denoise_model is not None:
            from topaz_tpu.models.denoise_factory import (apply_fn_for,
                                                          load_denoiser)

            self.dmeta, self.dparams = load_denoiser(denoise_model)
            self.denoiser = apply_fn_for(self.dmeta)
        self._fns: Dict = {}

    # -- compiled per-shape programs ---------------------------------------

    def _build(self, shape: Tuple[int, int], batch: int):
        import jax
        import jax.numpy as jnp

        from topaz_tpu.models.picker import apply_picker
        from topaz_tpu.ops.fourier import downsample
        from topaz_tpu.ops.gmm import norm_fit
        from topaz_tpu.ops.nms import nms_topk_batched

        spec, params, state = self.spec, self.params, self.state
        precision = self.precision
        r, t = self.radius, self.threshold
        # top-k bound: peaks are pairwise > r apart, so a packing bound on
        # the (downsampled) score map size never truncates
        H, W = shape
        sh, sw = (H // self.scale, W // self.scale) if self.scale > 1 else (H, W)
        if self.max_peaks is not None:
            k = self.max_peaks
        else:
            k = min(sh * sw,
                    int((sh + r) * (sw + r) / max(np.pi * (r / 2.0) ** 2, 1)) + 16)
        scale = self.scale
        denoiser = self.denoiser
        dparams = getattr(self, "dparams", None)

        normalize = self.normalize

        def fn(raws):  # (B, H, W) — batch-native throughout
            smalls = downsample(raws, scale) if scale > 1 else raws
            if normalize:
                B = smalls.shape[0]
                mu, std, *_ = jax.vmap(norm_fit)(smalls.reshape(B, -1))
                norms = (smalls - mu[:, None, None]) / std[:, None, None]
            else:
                # extract-style inputs are already normalized
                norms = smalls
            scores, _ = apply_picker(spec, params, norms, state=state,
                                     dense=True, precision=precision)
            vals, coords, counts = nms_topk_batched(scores, r, t, k)
            out = (vals, coords, counts)
            if denoiser is not None:
                # serialize the U-Net over the batch (lax.map) — a batched
                # whole-image pass would multiply its activation footprint
                # past HBM for large micrographs
                def _den_one(raw):
                    m2, s2 = jnp.mean(raw), jnp.std(raw)
                    xin = ((raw - m2) / s2)[None, ..., None]
                    y = denoiser(dparams, xin, dims=2,
                                 precision=precision)[0, ..., 0]
                    return y * s2 + m2

                den = jax.lax.map(_den_one, raws)
                out = out + (den,)
            return out
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("data"))
            jitted = jax.jit(fn, in_shardings=(sharding,))

            def run(batch_arr):
                return jitted(jax.device_put(batch_arr, sharding))

            return run
        return jax.jit(fn)

    def _fn_for(self, shape: Tuple[int, int], batch: int):
        key = (shape, batch)
        if key not in self._fns:
            self._fns[key] = self._build(shape, batch)
        return self._fns[key]

    # -- host-side driver ---------------------------------------------------

    def process(self, paths: Sequence[str], batch_size: Optional[int] = None,
                prefetch: int = 2):
        """Process micrograph files; yields
        (path, pick scores, pick coords at the downsampled scale
        [, denoised image]). Groups by exact shape; pads the final partial
        batch by repetition."""
        import jax.numpy as jnp

        from topaz_tpu.io.image import load_image

        if batch_size is None:
            batch_size = self.mesh.shape["data"] if self.mesh is not None else 1

        # shape buckets, preserving order within a bucket
        buckets: Dict[Tuple[int, int], List[str]] = defaultdict(list)
        for p in paths:
            buckets[_image_shape(p)].append(p)

        # background loader keeps the device fed; errors propagate to the
        # consumer instead of hanging it
        def load_batches(out_q):
            try:
                for shape, bucket in buckets.items():
                    for start in range(0, len(bucket), batch_size):
                        chunk = bucket[start : start + batch_size]
                        imgs = [np.asarray(load_image(p), dtype=np.float32)
                                for p in chunk]
                        n_real = len(imgs)
                        while len(imgs) < batch_size:
                            imgs.append(imgs[-1])  # pad partial batch
                        out_q.put((shape, chunk, n_real, np.stack(imgs)))
                out_q.put(None)
            except BaseException as e:  # noqa: BLE001
                out_q.put(e)

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        thread = threading.Thread(target=load_batches, args=(q,), daemon=True)
        thread.start()

        from topaz_tpu.utils.profiling import stage

        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            shape, chunk, n_real, arr = item
            fn = self._fn_for(shape, len(arr))
            with stage(f"pipeline/batch{shape}"):
                out = fn(jnp.asarray(arr))
            scores = np.asarray(out[0])
            coords = np.asarray(out[1])
            counts = np.asarray(out[2])
            dens = np.asarray(out[3]) if len(out) > 3 else None
            for i in range(n_real):
                n = int(counts[i])
                result = (chunk[i], scores[i, :n], coords[i, :n])
                if dens is not None:
                    result = result + (dens[i],)
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
