"""Denoising workflows: 2D micrographs and 3D tomograms.

Workflow layer with the contract of topaz/denoise.py and the denoise /
denoise3d commands: the Denoise/Denoise3D facades, the classical filter
pipeline (lowpass -> normalize/outlier cutoff -> gaussian / inv-gaussian /
whitening deconvolution -> model average -> rescale), patch-tiled inference
with per-patch statistics, noise2noise training, and MRC stream drivers.

Known reference bugs fixed here (SURVEY 7.4):
  * topaz/denoise.py:388 shadows the lowpass function with its numeric
    argument, so --lowpass > 1 crashes upstream; here it filters.
  * topaz/commands/denoise.py:100-107 loads args.arch and ignores the
    model names given with -m; here each named model is loaded, so
    multi-model averaging works.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional

import numpy as np

from topaz_tpu.io import mrc
from topaz_tpu.io.image import load_image, save_image
from topaz_tpu.models.denoise_factory import (
    apply_fn_for,
    load_denoiser,
    new_denoiser,
    save_denoiser,
)
from topaz_tpu.ops.filters import (
    apply_kernel,
    correct_spatial_covariance,
    gaussian_denoise_kernel,
    inv_gaussian_kernel,
)
from topaz_tpu.ops.fourier import lowpass as lowpass_filter


def _check_min_extent(meta, extents, what: str, flag: str):
    """Clear error when an input is smaller than the arch's pooling
    pyramid allows (models.min_input_size) instead of an opaque
    empty-axis failure deep inside jit tracing."""
    from topaz_tpu.models.denoise import min_input_size

    min_in = min_input_size(meta["arch"])
    if any(int(s) < min_in for s in extents):
        raise ValueError(
            f"{what} of size {tuple(int(s) for s in extents)} are smaller "
            f"than the {meta['arch']!r} denoiser's minimum input of "
            f"{min_in} per dimension (its pooling levels would collapse "
            f"an axis); raise {flag}")


def _is_hbm_oom(e: Exception) -> bool:
    """True when an XLA error is a device out-of-memory (compile- or
    run-time). Matched on message text because the failure surfaces as a
    generic ``XlaRuntimeError``/``JaxRuntimeError`` whose type carries no
    OOM discriminator (observed compile-time form: ``INTERNAL: ... Ran out
    of memory in memory space hbm. Used 16.88G of 15.75G hbm``)."""
    msg = str(e)
    return ("Ran out of memory" in msg or "RESOURCE_EXHAUSTED" in msg
            or "Out of memory" in msg)


class Denoise:
    """2D micrograph denoiser facade (topaz/denoise.py:245-332).

    ``devices`` (from the ``-d`` flag, parallel/devices.py) with more than
    one entry turns on halo-sharded whole-image denoising over a 'space'
    mesh — the TPU replacement for the reference's multi-GPU DataParallel
    (topaz/commands/denoise3d.py:103,118).
    """

    dims = 2

    def __init__(self, model: str = "unet", precision=None, devices=None,
                 *, meta=None, params=None, dtype=None):
        if meta is not None:
            self.meta, self.params = meta, params
        else:
            self.meta, self.params = load_denoiser(model)
        self.apply_fn = apply_fn_for(self.meta)
        self.precision = precision
        self.devices = devices
        self._jit_cache: Dict = {}
        self.dtype = dtype
        if dtype not in ("bf16", "bfloat16"):
            # place the weights on device ONCE: the cached jitted programs
            # take params as an argument, and numpy-tree arguments would be
            # re-uploaded host->device on every call
            import jax

            self.params = jax.device_put(self.params)
        if dtype in ("bf16", "bfloat16"):
            # opt-in fast mode: params + activations in bfloat16, output
            # cast back to f32. Measured on v5e at 4096^2: 305 -> 230 ms
            # (-25%) at ~1% relative error — halves HBM traffic, doubles
            # MXU rate, and un-OOMs the fused input-dilated decoder at 4k
            # (models/denoise._fused_area_cap). Default stays f32 for
            # bit-level parity with the torch reference.
            import jax
            import jax.numpy as jnp

            self.params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.bfloat16), self.params)
            base = self.apply_fn
            self.apply_fn = (
                lambda p, x, dims=2, precision=None:
                base(p, x.astype(jnp.bfloat16), dims=dims,
                     precision=precision).astype(jnp.float32))

    @classmethod
    def from_arch(cls, arch: str, precision=None, devices=None, dtype=None,
                  **arch_kw):
        """Construct an untrained denoiser from an architecture name
        (replaces the reference's fresh-model branch,
        topaz/commands/denoise.py:88-98)."""
        meta, params = new_denoiser(arch, **arch_kw)
        return cls(meta=meta, params=params, precision=precision,
                   devices=devices, dtype=dtype)

    # a shard block (plus its aprons) must survive the deepest U-Net's
    # five 2x pooling levels, so never shard below this many leading rows
    _MIN_HALO_BLOCK = 32

    def _apply_halo(self, x: np.ndarray):
        """Whole-image denoising with rows (or z-slabs for 3D) sharded over
        a 'space' mesh; ppermute halo exchange + global-stat psum
        (parallel/mesh.py:122-181). Shrinks the shard count for small
        images; returns None (caller falls back to one device) when even
        two adequate shards don't fit."""
        import jax.numpy as jnp

        from topaz_tpu.parallel.mesh import make_halo_denoiser, make_mesh

        if self.devices is None or len(self.devices) < 2:
            return None
        n = min(len(self.devices), max(1, x.shape[0] // self._MIN_HALO_BLOCK))
        if n < 2:
            return None
        pad = (-x.shape[0]) % n
        if pad:
            width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
            xp = np.pad(x, width, mode="edge")
        else:
            xp = x
        halo = max(1, min(256, xp.shape[0] // n))
        key = ("halo", xp.shape, halo, n)
        if key not in self._jit_cache:
            mesh = make_mesh(n_data=1, n_space=n, devices=self.devices[:n])
            self._jit_cache[key] = make_halo_denoiser(
                self.meta, self.params, mesh, halo=halo,
                precision=self.precision, dtype=self.dtype)
        y = np.asarray(self._jit_cache[key](jnp.asarray(xp)))
        return y[: x.shape[0]]

    # smallest whole-image pixel count that has run out of device memory
    # this process; larger images route straight to the patch fallback
    # instead of provoking the same compile-time OOM again
    _oom_area = None

    def _apply(self, x: np.ndarray) -> np.ndarray:
        """Normalize by the input's own statistics, denoise, un-normalize
        (topaz/denoise.py:274-296).

        Whole-image denoising of very large micrographs can exceed one
        chip's HBM (measured: a K3-sized 5760x4092 f32 image OOMs 16 GB —
        the full-resolution 64-channel decoder activations alone are
        ~6 GB). Rather than surface an opaque XLA allocation error, the
        OOM is caught and the image falls back to reference-semantics
        patch denoising (per-patch statistics, reference defaults
        -s 1024 -p 500; topaz/commands/denoise.py:52-53) with a warning —
        ``--precision bf16`` halves the activation bytes and keeps K3
        frames whole-image on 16 GB parts."""
        import jax
        import jax.numpy as jnp

        if x.ndim == self.dims:
            y = self._apply_halo(x)
            if y is not None:
                return y
            if (self._oom_area is not None and self.dims == 2
                    and x.size >= self._oom_area):
                return self._patch_fallback(x)

        key = x.shape
        if key not in self._jit_cache:
            dims = self.dims

            @jax.jit
            def fn(params, x):
                mu = jnp.mean(x)
                std = jnp.std(x)
                xin = ((x - mu) / std)[None, ..., None]
                y = self.apply_fn(params, xin, dims=dims,
                                  precision=self.precision)[0, ..., 0]
                return y * std + mu

            self._jit_cache[key] = fn
        try:
            return np.asarray(self._jit_cache[key](self.params,
                                                   jnp.asarray(x)))
        except Exception as e:  # noqa: BLE001 — filtered to OOM below
            if self.dims != 2 or x.ndim != self.dims or not _is_hbm_oom(e):
                raise
            self._jit_cache.pop(key, None)
            self._oom_area = (x.size if self._oom_area is None
                              else min(self._oom_area, x.size))
            return self._patch_fallback(x, err=e)

    def _patch_fallback(self, x: np.ndarray, err=None) -> np.ndarray:
        """Patch-denoise an image too large for whole-image HBM."""
        patch, padding = 1024, 500
        # shrink until a padded patch is comfortably under the failed area:
        # every nested _apply then sees < _oom_area pixels and cannot
        # re-enter this fallback at the same size (finite recursion)
        while (self._oom_area is not None
               and (patch + 2 * padding) ** 2 > self._oom_area // 2
               and patch > 64):
            patch //= 2
            padding = min(padding, patch // 2)
        if (self._oom_area is not None
                and (patch + 2 * padding) ** 2 > self._oom_area // 2):
            if err is not None:
                raise err
            raise RuntimeError(
                f"denoising {x.shape} ran out of device memory and even "
                f"{patch}px patches exceed the failing footprint; use a "
                f"device with more memory or --precision bf16")
        print(f"# WARNING: whole-image denoising of {x.shape} exceeds "
              f"device memory; falling back to -s {patch} -p {padding} "
              f"patches (per-patch statistics). --precision bf16 halves "
              f"activation memory and keeps images this size whole-image "
              f"on 16 GB chips.", file=sys.stderr)
        return self.denoise_patches(x, patch, padding=padding)

    # largest image kept resident on one device alongside its output and
    # one padded patch's activations (see Denoise3D._DEVICE_RESIDENT_CAP)
    _DEVICE_RESIDENT_CAP = 512 * 1024 * 1024

    def denoise_patches(self, x: np.ndarray, patch_size: int,
                        padding: int = 128) -> np.ndarray:
        """Patch-tiled denoising with per-patch statistics
        (topaz/denoise.py:299-324). Routes through the device-resident
        hybrid when it applies; numerically identical either way."""
        out = self._denoise_patches_resident(x, patch_size, padding)
        if out is not None:
            return out
        return self._denoise_patches_stream(x, patch_size, padding)

    def _denoise_patches_stream(self, x: np.ndarray, patch_size: int,
                                padding: int = 128) -> np.ndarray:
        """Host patch loop — one device round trip per (possibly
        border-truncated) patch."""
        y = np.zeros_like(x)
        for i in range(0, x.shape[0], patch_size):
            for j in range(0, x.shape[1], patch_size):
                si, ei = max(0, i - padding), min(x.shape[0], i + patch_size + padding)
                sj, ej = max(0, j - padding), min(x.shape[1], j + patch_size + padding)
                yij = self._apply(x[si:ei, sj:ej])
                oi, oj = i - si, j - sj
                y[i : i + patch_size, j : j + patch_size] = \
                    yij[oi : oi + patch_size, oj : oj + patch_size]
        return y

    def _denoise_patches_resident(self, x: np.ndarray, patch_size: int,
                                  padding: int):
        """The 2D default CLI path (-s 1024 -p 500) as (mostly) one device
        program: the micrograph is uploaded once; every INTERIOR patch —
        whose padded window lies fully inside the image, so it is exactly
        a dynamic_slice — is denoised in a lax.scan that writes its center
        back with dynamic_update_slice; the output ships back once.
        Border patches are truncated by the image edge in the reference
        semantics (topaz/denoise.py:299-324), so their shapes differ —
        they are grouped by shape and each group runs as ONE batched
        program with per-patch statistics (identical math to per-patch
        calls; conv/stat ops are per-sample). Bit-for-bit equal to the
        host loop while shipping each interior byte once instead of
        ~(1+2p/s)^2 times. Returns None (caller streams) on a multi-device
        mesh, over the residency cap, without interior patches, or on
        device OOM."""
        from topaz_tpu.parallel.devices import data_mesh_for

        if self.dims != 2 or x.ndim != 2:
            return None
        if data_mesh_for(self.devices) is not None:
            return None
        if x.nbytes > self._DEVICE_RESIDENT_CAP:
            return None

        import jax
        import jax.numpy as jnp
        from jax import lax

        H, W = x.shape
        s, p = int(patch_size), int(padding)
        d = s + 2 * p
        interior, border = [], []
        for i in range(0, H, s):
            for j in range(0, W, s):
                if i - p >= 0 and i + s + p <= H and \
                        j - p >= 0 and j + s + p <= W:
                    interior.append((i - p, j - p))
                else:
                    border.append((i, j))
        if not interior:
            return None  # all-border grids gain nothing from residency

        key = ("img_resident", x.shape, s, p)
        if key not in self._jit_cache:
            apply_fn, precision, dims = self.apply_fn, self.precision, \
                self.dims

            def run(params, img, orig):
                def body(out, o):
                    xi = lax.dynamic_slice(img, (o[0], o[1]), (d, d))
                    mu, std = jnp.mean(xi), jnp.std(xi)
                    y = apply_fn(params, ((xi - mu) / std)[None, ..., None],
                                 dims=dims, precision=precision)[0, ..., 0]
                    y = lax.dynamic_slice(y * std + mu, (p, p), (s, s))
                    return lax.dynamic_update_slice(
                        out, y, (o[0] + p, o[1] + p)), None

                out, _ = lax.scan(body, jnp.zeros_like(img), orig)
                return out

            self._jit_cache[key] = jax.jit(run)

        try:
            # np.array (copy): the border writeback below mutates y, and
            # np.asarray of a device array is a read-only view. Cast back
            # to the input dtype so this route matches the stream path's
            # np.zeros_like(x) contract (a float64 caller must not see the
            # dtype flip with image size / OOM routing).
            y = np.array(self._jit_cache[key](
                self.params, jnp.asarray(x),
                jnp.asarray(np.array(interior, np.int32)))).astype(
                    x.dtype, copy=False)
        except Exception as e:  # noqa: BLE001 — filtered to OOM below
            if _is_hbm_oom(e):
                self._jit_cache.pop(key, None)
                return None
            raise

        # border patches, grouped by truncated shape -> one batched
        # program per distinct shape (per-patch statistics inside)
        groups: Dict[tuple, list] = {}
        for i, j in border:
            si, ei = max(0, i - p), min(H, i + s + p)
            sj, ej = max(0, j - p), min(W, j + s + p)
            groups.setdefault((ei - si, ej - sj), []).append((si, sj, i, j))
        for (gh, gw), tiles in groups.items():
            batch = np.stack([x[si : si + gh, sj : sj + gw]
                              for si, sj, _, _ in tiles])
            yb = self.denoise_batch(batch)
            for (si, sj, i, j), yi in zip(tiles, yb):
                y[i : i + s, j : j + s] = \
                    yi[i - si : i - si + s, j - sj : j - sj + s]
        return y

    def denoise(self, x: np.ndarray, patch_size: int = -1,
                padding: int = 128) -> np.ndarray:
        s = patch_size + padding
        use_patch = patch_size > 0 and (s < x.shape[0] or s < x.shape[1])
        # mirror the 3D path's guard (denoise:569): clear error instead of
        # an empty-axis jit-tracing failure when the input (or the padded
        # patch) is below the arch's pooling minimum
        if use_patch:
            _check_min_extent(self.meta, (patch_size + 2 * padding,) * 2,
                              "inference patches", "-s/--patch-size")
        else:
            _check_min_extent(
                self.meta, x.shape[-self.dims:], "images",
                "the input size or pick a shallower arch (unet-small)")
        return (self.denoise_patches(x, patch_size, padding=padding)
                if use_patch else self._apply(x))

    def denoise_batch(self, frames: np.ndarray,
                      as_numpy: bool = True) -> np.ndarray:
        """Denoise a (B, H, W) batch of same-shape frames in one program
        with per-frame statistics — TPU-build extension used by the stack
        driver to amortize dispatch over movie frames.

        ``as_numpy=False`` returns the device array without blocking so a
        caller can overlap the device→host copy of this chunk with the
        next chunk's compute (denoise_stack's pipelined loop)."""
        _check_min_extent(self.meta, frames.shape[1 : 1 + self.dims],
                          "frames", "the frame size or pick a shallower "
                          "arch (unet-small)")
        import jax
        import jax.numpy as jnp

        key = ("fbatch",) + frames.shape
        if key not in self._jit_cache:
            dims = self.dims

            def fn(params, xb):
                axes = tuple(range(1, 1 + dims))
                mu = jnp.mean(xb, axis=axes, keepdims=True)
                std = jnp.std(xb, axis=axes, keepdims=True)
                y = self.apply_fn(params, ((xb - mu) / std)[..., None],
                                  dims=dims,
                                  precision=self.precision)[..., 0]
                return y * std + mu

            # frame batches shard over the mesh's data axis when -d -2
            # selected several devices (same idiom as the 3D patch path)
            from topaz_tpu.parallel.devices import data_mesh_for
            from topaz_tpu.parallel.mesh import jit_sharded_args

            mesh = data_mesh_for(self.devices, frames.shape[0])
            self._jit_cache[key] = jit_sharded_args(fn, mesh,
                                                    ("rep", "data"))
        try:
            y = self._jit_cache[key](self.params, jnp.asarray(frames))
            if as_numpy:
                return np.asarray(y)
            # force execution errors (OOM) to surface inside this try so
            # the fallback below still engages; the device→host copy
            # itself stays async for the caller to overlap
            jax.block_until_ready(y)
            return y
        except Exception as e:  # noqa: BLE001 — filtered to OOM below
            if not _is_hbm_oom(e):
                raise
            # a whole frame batch that exceeds HBM degrades to per-frame
            # whole-image denoising (which itself falls back to patches if
            # even one frame is too large — see _apply)
            self._jit_cache.pop(key, None)
            print(f"# WARNING: batched denoising of {frames.shape} exceeds "
                  f"device memory; denoising frames one at a time",
                  file=sys.stderr)
            return np.stack([self._apply(f) for f in np.asarray(frames)])

    def train(self, train_sampler, val_sampler, **kw):
        self.params = train_denoiser(self.meta, self.params, train_sampler,
                                     val_sampler, dims=self.dims,
                                     devices=self.devices, **kw)
        self._jit_cache.clear()  # compiled programs captured the old params


def auto_patch_size(shape, padding: int = 48, max_extent: int = 256,
                    align: int = 32) -> int:
    """Pick the 3D inference patch size minimizing total processed voxels.

    The reference defaults (-s 96 -p 48) process (96+2*48)^3 voxels per
    96^3 of output — an 8x overlap tax — and a patch that does not divide
    the tomogram dims adds ceil-grid overshoot (measured on v5e: patch 160
    on a 192x384x384 tomogram is 1.7x SLOWER than patch 96; see
    profiles/PROFILE.md). This scans patch sizes whose padded extent is
    MXU-aligned (d % align == 0) and <= max_extent (HBM-safe for the
    nf=48 3D U-Net on 16 GB), scoring cost = n_patches * d^3; ties prefer
    the larger patch (fewer dispatches)."""
    best = None
    s0 = (-2 * padding) % align
    while s0 < align:  # patches below one MXU tile are pure overlap tax
        s0 += align
    for s in range(s0, max_extent - 2 * padding + 1, align):
        d = s + 2 * padding
        n_patches = 1
        for n in shape:
            n_patches *= -(-int(n) // s)
        cost = n_patches * d**3
        if best is None or cost < best[0] or (cost == best[0] and s > best[1]):
            best = (cost, s)
    if best is None:
        # padding so large that EVERY patch's padded extent exceeds the
        # HBM-safe cap (2*padding >= max_extent): any fallback would
        # process >= max_extent^3 voxels per patch at an enormous overlap
        # tax and OOM mid-run — fail fast with actionable guidance instead
        raise ValueError(
            f"--auto-patch cannot satisfy padding {padding}: the padded "
            f"patch extent would exceed the HBM-safe limit {max_extent} "
            f"(largest supported padding is {(max_extent - align) // 2}); "
            f"lower -p or pass an explicit patch size with -s")
    return best[1]


class Denoise3D(Denoise):
    """Tomogram denoiser facade (topaz/denoise.py:336-377)."""

    dims = 3

    # largest volume kept resident on one device alongside its output and
    # the U-Net activations of a single padded patch (16 GB HBM)
    _DEVICE_RESIDENT_CAP = 512 * 1024 * 1024

    def _denoise_device_resident(self, tomo: np.ndarray, patch_size: int,
                                 padding: int, verbose: bool = True):
        """Whole-tomogram patch denoising as ONE device program — the
        TPU-first replacement for the host patch loop: upload the volume
        once, cut each padded patch with lax.dynamic_slice and write its
        center back with lax.dynamic_update_slice inside a lax.scan over
        the patch grid, fetch the denoised volume once. Numerically
        equivalent to the host patch path (same zero-fill, volume stats,
        per-patch stats; tests/test_denoise.py) while moving (d/patch)^3
        times fewer bytes across the host link — 8x at the reference
        defaults -s 96 -p 48 (topaz/commands/denoise3d.py:52-53), where
        every output voxel is shipped 8 times by a per-patch loop.

        Returns None when this path does not apply (multi-device mesh,
        volume over the HBM-residency cap, or device OOM — the caller
        falls back to the streaming patch loop)."""
        from topaz_tpu.parallel.devices import data_mesh_for

        if data_mesh_for(self.devices) is not None:
            return None  # mesh path shards patch batches across devices
        if tomo.nbytes > self._DEVICE_RESIDENT_CAP:
            return None

        import jax
        import jax.numpy as jnp
        from jax import lax

        d = patch_size + 2 * padding
        shape = tuple(int(n) for n in tomo.shape)
        grid = [-(-n // patch_size) for n in shape]
        ext = tuple(g * patch_size for g in grid)
        origins = np.array([(i * patch_size, j * patch_size, k * patch_size)
                            for i in range(grid[0])
                            for j in range(grid[1])
                            for k in range(grid[2])], np.int32)
        # volume statistics on host, identical to the streaming path
        mu, std = float(tomo.mean()), float(tomo.std())

        key = ("vol_resident", shape, patch_size, padding)
        if key not in self._jit_cache:
            apply_fn, precision, dims = self.apply_fn, self.precision, self.dims
            pad_width = tuple((padding, padding + e - n)
                              for e, n in zip(ext, shape))

            def run(params, vol, orig, mu, std):
                volp = jnp.pad(vol, pad_width)  # zero fill == extract_patch
                out0 = jnp.zeros(ext, vol.dtype)

                def body(out, o):
                    x = lax.dynamic_slice(volp, (o[0], o[1], o[2]),
                                          (d, d, d))
                    xn = (x - mu) / std
                    m2, s2 = jnp.mean(xn), jnp.std(xn)
                    y = apply_fn(params, ((xn - m2) / s2)[None, ..., None],
                                 dims=dims, precision=precision)[0, ..., 0]
                    y = (y * s2 + m2) * std + mu
                    y = lax.dynamic_slice(y, (padding,) * 3,
                                          (patch_size,) * 3)
                    return lax.dynamic_update_slice(out, y,
                                                    (o[0], o[1], o[2])), None

                out, _ = lax.scan(body, out0, orig)
                return out[: shape[0], : shape[1], : shape[2]]

            self._jit_cache[key] = jax.jit(run)

        if verbose:
            print(f"# device-resident: {len(origins)} patches of "
                  f"{d}^3 in one program", file=sys.stderr)
        try:
            y = self._jit_cache[key](self.params, jnp.asarray(tomo),
                                     jnp.asarray(origins),
                                     np.float32(mu), np.float32(std))
            return np.asarray(y)
        except Exception as e:  # OOM -> streaming fallback
            if _is_hbm_oom(e):
                self._jit_cache.pop(key, None)
                if verbose:
                    print("# device-resident volume OOM; falling back to "
                          "the streaming patch path", file=sys.stderr)
                return None
            raise

    def denoise(self, tomo: np.ndarray, patch_size: int = 96,
                padding: int = 48, batch_size: int = 1, volume_num: int = 1,
                total_volumes: int = 1, verbose: bool = True,
                device_resident=None) -> np.ndarray:
        if patch_size == -2:  # auto: cost-optimal for this tomogram's dims
            patch_size = auto_patch_size(tomo.shape, padding=padding)
            if verbose:
                print(f"# auto patch size {patch_size} for volume "
                      f"{tuple(tomo.shape)} (padding {padding})",
                      file=sys.stderr)
        if patch_size < 1:
            return self._apply(tomo)
        _check_min_extent(self.meta, (patch_size + 2 * padding,) * 3,
                          "inference patches", "-s/--patch-size")

        if device_resident is not False:  # None = auto-route
            out = self._denoise_device_resident(tomo, patch_size, padding,
                                                verbose=verbose)
            if out is not None:
                return out
            if device_resident:
                raise ValueError(
                    "device_resident=True requested but the volume cannot "
                    "stay resident (multi-device mesh or over the HBM cap)")

        import jax
        import jax.numpy as jnp

        from topaz_tpu.parallel.devices import data_mesh_for

        # patch batches sharded over the mesh's data axis: the exact TPU
        # analog of the reference's nn.DataParallel patch scatter/gather
        # (topaz/commands/denoise3d.py:103,118) — per-patch statistics make
        # the result identical to the single-device patch path
        mesh = data_mesh_for(self.devices)
        if mesh is not None:
            n_data = mesh.shape["data"]
            batch_size = max(batch_size, n_data)
            batch_size += (-batch_size) % n_data

        mu, std = tomo.mean(), tomo.std()
        denoised = np.zeros_like(tomo)
        d = patch_size + 2 * padding
        grid = [int(np.ceil(n / patch_size)) for n in tomo.shape]
        total = int(np.prod(grid))
        count = 0

        dims = self.dims
        key = ("vol", d, batch_size)
        if key not in self._jit_cache:
            def fn(params, x):  # (B, d, d, d)
                # volume-level statistics applied outside; per-patch stats
                # like the reference (denoise.py:354-356 + _denoise)
                m2 = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
                s2 = jnp.std(x, axis=(1, 2, 3), keepdims=True)
                xin = ((x - m2) / s2)[..., None]
                y = self.apply_fn(params, xin, dims=dims,
                                  precision=self.precision)[..., 0]
                return y * s2 + m2

            from topaz_tpu.parallel.mesh import jit_sharded_args

            self._jit_cache[key] = jit_sharded_args(fn, mesh,
                                                    ("rep", "data"))
        fn = self._jit_cache[key]

        def extract_patch(i, j, k):
            x = np.zeros((d, d, d), dtype=np.float32)
            si, ei = max(0, i - padding), min(tomo.shape[0], i + patch_size + padding)
            sj, ej = max(0, j - padding), min(tomo.shape[1], j + patch_size + padding)
            sk, ek = max(0, k - padding), min(tomo.shape[2], k + patch_size + padding)
            x[padding - i + si : padding - i + si + (ei - si),
              padding - j + sj : padding - j + sj + (ej - sj),
              padding - k + sk : padding - k + sk + (ek - sk)] = \
                tomo[si:ei, sj:ej, sk:ek]
            return x

        origins = [(pi * patch_size, pj * patch_size, pk * patch_size)
                   for pi in range(grid[0])
                   for pj in range(grid[1])
                   for pk in range(grid[2])]
        for start in range(0, len(origins), batch_size):
            chunk = origins[start : start + batch_size]
            xs = [extract_patch(*o) for o in chunk]
            n_real = len(xs)
            while len(xs) < batch_size:
                xs.append(xs[-1])
            xn = (np.stack(xs) - mu) / std
            ys = np.asarray(fn(self.params, jnp.asarray(xn))) * std + mu
            for (i, j, k), y in zip(chunk, ys[:n_real]):
                patch = denoised[i : i + patch_size, j : j + patch_size,
                                 k : k + patch_size]
                pz, py, px = patch.shape
                denoised[i : i + patch_size, j : j + patch_size,
                         k : k + patch_size] = \
                    y[padding : padding + pz, padding : padding + py,
                      padding : padding + px]
                count += 1
                if verbose:
                    print(f"# [{volume_num}/{total_volumes}] "
                          f"{round(count * 100 / total)}%",
                          file=sys.stderr, end="\r")
        if verbose:
            print(" " * 100, file=sys.stderr, end="\r")
        return denoised


# ---------------------------------------------------------------------------
# noise2noise training (topaz/denoising/models.py:636-758)
# ---------------------------------------------------------------------------

def train_denoiser(meta, params, train_sampler, val_sampler, loss_fn: str = "L2",
                   optim: str = "adagrad", lr: float = 0.001,
                   weight_decay: float = 0, batch_size: int = 10,
                   num_epochs: int = 500, num_workers: int = 1,
                   verbose: bool = True, save_best: bool = False,
                   save_interval: Optional[int] = None,
                   save_prefix: Optional[str] = None, dims: int = 2,
                   precision=None, devices=None):
    """noise2noise training loop (topaz/denoising/models.py:636-758):
    L0(annealed)/L1/L2 losses, adagrad/adam/rmsprop/sgd, save-best on
    validation; batches shard over the mesh when ``devices`` > 1."""
    import time
    import datetime

    import jax
    import jax.numpy as jnp
    import optax

    from topaz_tpu.parallel.devices import data_mesh_for
    from topaz_tpu.train.trainer import make_optimizer

    # noise2noise training batches sharded over the mesh's data axis —
    # the reference wraps the model in DataParallel BEFORE training
    # (topaz/commands/denoise3d.py:103); gradients psum over devices
    mesh = data_mesh_for(devices, batch_size, warn=True)

    output, log = sys.stdout, sys.stderr
    digits = int(np.ceil(np.log10(max(num_epochs, 2))))
    if save_prefix is not None:
        save_dir = os.path.dirname(save_prefix)
        if save_dir and not os.path.exists(save_dir):
            print("# creating save directory:", save_dir, file=log)
            os.makedirs(save_dir)

    start_time = time.time()
    now = datetime.datetime.now()
    print(f"# starting time: {now.month:02d}/{now.day:02d}/{now.year:04d} "
          f"{now.hour:02d}h:{now.minute:02d}m:{now.second:02d}s", file=log)

    gamma_annealed = loss_fn == "L0"

    def criteria(pred, target, gamma):
        if loss_fn == "L0":
            return jnp.mean((jnp.abs(pred - target) + 1e-8) ** gamma)
        if loss_fn == "L1":
            return jnp.mean(jnp.abs(pred - target))
        if loss_fn == "L2":
            return jnp.mean((pred - target) ** 2)
        raise ValueError(f"Loss function: {loss_fn} not one of [L0, L1, L2].")

    if optim == "sgd":
        optimizer = optax.sgd(lr, momentum=0.9, nesterov=True)
    else:
        optimizer = make_optimizer(lr, optim)
    if weight_decay > 0:
        optimizer = optax.chain(optax.add_decayed_weights(weight_decay), optimizer)

    apply_fn = apply_fn_for(meta)

    def loss_of(params, src, tgt, gamma):
        pred = apply_fn(params, src[..., None], dims=dims, precision=precision)
        return criteria(pred[..., 0], tgt, gamma)

    @jax.jit
    def train_step(params, opt_state, src, tgt, gamma):
        loss, grads = jax.value_and_grad(loss_of)(params, src, tgt, gamma)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    eval_loss = jax.jit(loss_of)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        print(f"# training sharded over {mesh.shape['data']} devices",
              file=log)
        _dshard = NamedSharding(mesh, P("data"))
        _n_data = mesh.shape["data"]

        def _put(a):
            a = jnp.asarray(a)
            return jax.device_put(a, _dshard) if a.shape[0] % _n_data == 0 \
                else a  # ragged tail batch compiles its own program
    else:
        _put = jnp.asarray

    params = jax.tree_util.tree_map(jnp.asarray, params)
    opt_state = optimizer.init(params)

    print("# training model...", file=log)
    if verbose:
        print("\t".join(["Epoch", "Train Loss", "Val Loss", "Best Val Loss"]),
              file=output)

    def _save(epoch):
        path = save_prefix + f"_epoch{epoch:0{digits}}.npz"
        save_denoiser(path, meta, params)

    best_val = np.inf
    for epoch in range(num_epochs):
        gamma = 2 - (epoch - 1) * 2 / num_epochs if gamma_annealed else 2.0

        # losses stay on device until epoch end (one packed fetch): a
        # per-step float() would cost a host round-trip per step, which
        # dominates the ~ms step on a high-latency link
        losses, weights = [], []
        for src, tgt in train_sampler.batches(batch_size, shuffle=True):
            if epoch == 0 and not weights:
                _check_min_extent(meta, src.shape[1 : 1 + dims],
                                  "training tiles", "--crop/-c")
            params, opt_state, loss = train_step(
                params, opt_state, _put(src), _put(tgt), gamma)
            losses.append(loss)
            weights.append(src.shape[0])

        if epoch == 0 and not weights:
            raise ValueError(
                "the training sampler produced no batches — check that the "
                "paired training data is non-empty and larger than the "
                "crop/tile size")

        def _weighted_mean(losses, weights):
            if not losses:
                return 0.0
            vals = np.asarray(jnp.stack(losses), dtype=np.float64)
            w = np.asarray(weights, dtype=np.float64)
            return float((vals * w).sum() / w.sum())

        train_loss = _weighted_mean(losses, weights)

        losses, weights = [], []
        for src, tgt in val_sampler.batches(batch_size, shuffle=False):
            losses.append(eval_loss(params, _put(src), _put(tgt), gamma))
            weights.append(src.shape[0])
        val_loss = _weighted_mean(losses, weights)

        if val_loss < best_val:
            best_val = val_loss
            if save_best and save_prefix is not None:
                _save(epoch + 1)

        if verbose:
            vals = (train_loss, val_loss, best_val)
            print("\t".join([f"# [{epoch}/{num_epochs}]"]
                            + [str(round(v, 5)) for v in vals]),
                  file=output, end="\r")
        if save_prefix is not None and save_interval is not None \
                and (epoch + 1) % save_interval == 0:
            _save(epoch + 1)

    print("# training completed!", file=log)
    end_time = time.time()
    print("# total time:",
          time.strftime("%Hh:%Mm:%Ss", time.gmtime(end_time - start_time)),
          file=log)
    return params


# ---------------------------------------------------------------------------
# 2D pipeline drivers (topaz/denoise.py:382-490)
# ---------------------------------------------------------------------------

def denoise_image(mic: np.ndarray, models: List[Denoise], lowpass: float = 1,
                  cutoff: float = 0, gaus: Optional[float] = None,
                  inv_gaus: Optional[float] = None, deconvolve: bool = False,
                  deconv_patch: int = 1, patch_size: int = -1,
                  padding: int = 0, normalize: bool = False,
                  downsample: int = 1) -> np.ndarray:
    """Full single-micrograph pipeline (topaz/denoise.py:382-416).

    ``downsample > 1`` Fourier-crops the micrograph first and denoises at
    the reduced (picking) scale — scale^2 less U-Net work; the output is
    downsampled. TPU-build extension (the reference denoises only at full
    resolution; its tutorials downsample in a separate preprocess pass)."""
    mic = np.asarray(mic, dtype=np.float32)
    if downsample > 1:
        from topaz_tpu.ops.fourier import downsample_numpy

        mic = downsample_numpy(mic, downsample)
    if lowpass > 1:
        mic = np.asarray(lowpass_filter(mic, lowpass))

    mu, std = mic.mean(), mic.std()
    x = (mic - mu) / std
    if cutoff > 0:
        x[(x < -cutoff) | (x > cutoff)] = 0

    if gaus is not None:
        x = np.asarray(apply_kernel(x, gaussian_denoise_kernel(gaus)))
    elif inv_gaus is not None:
        x = np.asarray(apply_kernel(x, inv_gaussian_kernel(inv_gaus)))
    elif deconvolve:
        x = np.asarray(correct_spatial_covariance(x, patch=deconv_patch))

    out = sum(model.denoise(x, patch_size=patch_size, padding=padding)
              for model in models) / len(models)

    if normalize:
        out = (out - out.mean()) / out.std()
    else:
        out = std * out + mu
    return out


def denoise_stream(micrographs: List[str], output_path: str, format: str = "mrc",
                   suffix: str = "", models: Optional[List[Denoise]] = None,
                   lowpass: float = 1, pixel_cutoff: float = 0,
                   gaus=None, inv_gaus=None, deconvolve: bool = False,
                   deconv_patch: int = 1, patch_size: int = 1024,
                   padding: int = 500, normalize: bool = False,
                   downsample: int = 1):
    """Per-micrograph denoise + save (topaz/denoise.py:450-490).

    The reference loop is strictly serial. Here the next micrograph loads
    in a prefetch thread and the previous one saves in a writer thread, so
    host I/O overlaps device compute (the device is busy ~300 ms per 4k
    frame — exactly the window a 64 MB MRC read or write needs on a slow
    host). Save errors surface on the next iteration (or at return)."""
    import concurrent.futures as cf

    from topaz_tpu.utils.batching import iterate_prefetched

    total, count = len(micrographs), 0
    denoised = []
    if output_path:
        os.makedirs(output_path, exist_ok=True)

    def produce():
        for path in micrographs:
            name = os.path.splitext(os.path.basename(path))[0]
            image, header, ext_header = load_image(path, return_header=True)
            yield path, name, image, header, ext_header

    writer = cf.ThreadPoolExecutor(max_workers=1)
    pending: List = []

    def surface_save_errors(block: bool = False):
        for f in list(pending):
            if block or f.done():
                f.result()  # re-raises a failed save
                pending.remove(f)

    try:
        for path, name, image, header, ext_header in iterate_prefetched(
                produce, maxsize=2):
            out = denoise_image(image, models, lowpass=lowpass,
                                cutoff=pixel_cutoff, gaus=gaus,
                                inv_gaus=inv_gaus, deconvolve=deconvolve,
                                deconv_patch=deconv_patch,
                                patch_size=patch_size, padding=padding,
                                normalize=normalize, downsample=downsample)
            denoised.append(out)
            if not output_path:
                sfx = suffix or ".denoised"
                outpath = os.path.splitext(path)[0] + sfx + "." + format
            else:
                outpath = os.path.join(output_path,
                                       name + suffix + "." + format)
            surface_save_errors()
            pending.append(writer.submit(save_image, out, outpath,
                                         header=header,
                                         extended_header=ext_header))
            count += 1
            print(f"# {count} of {total} completed.", file=sys.stderr,
                  end="\r")
        surface_save_errors(block=True)
    finally:
        writer.shutdown(wait=True)
    print("", file=sys.stderr)
    return denoised


def denoise_stack(path: str, output_path: str, models: List[Denoise],
                  lowpass: float = 1, pixel_cutoff: float = 0, gaus=None,
                  inv_gaus=None, deconvolve: bool = False, deconv_patch: int = 1,
                  patch_size: int = 1024, padding: int = 500,
                  normalize: bool = False, downsample: int = 1):
    """Denoise every frame of one MRC stack (topaz/denoise.py:419-447).
    When the per-frame pipeline is just normalize->model->denormalize
    (no filters, no patching), frames are batched through one program."""
    stack, header, ext_header = mrc.read(path)
    print("# denoising stack with shape:", stack.shape, file=sys.stderr)

    H, W = stack.shape[-2:]
    s = patch_size + padding
    use_patch = patch_size > 0 and (s < H or s < W)
    trivial_filters = (lowpass <= 1 and pixel_cutoff <= 0 and gaus is None
                       and inv_gaus is None and not deconvolve
                       and downsample == 1)
    if trivial_filters and not use_patch and len(models) == 1 \
            and len(stack) > 1:
        model = models[0]
        denoised = np.zeros_like(stack, dtype=np.float32)
        B = 8

        def land(start, n_real, out_dev):
            out = np.asarray(out_dev)
            if normalize:
                m2 = out.mean(axis=(1, 2), keepdims=True)
                s2 = out.std(axis=(1, 2), keepdims=True)
                out = (out - m2) / s2
            denoised[start : start + n_real] = out[:n_real]
            print(f"# {min(start + n_real, len(stack))} of {len(stack)} "
                  f"completed.", file=sys.stderr, end="\r")

        pending = None  # previous chunk, device→host copy in flight
        for start in range(0, len(stack), B):
            chunk = np.asarray(stack[start : start + B], dtype=np.float32)
            n_real = len(chunk)
            if n_real < B and start > 0:  # reuse the compiled full batch
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], B - n_real, axis=0)])
            # denoise_batch standardizes and restores per-frame statistics
            # on device; feeding raw frames avoids a redundant host-side
            # full-frame stats pass (standardizing the output below is
            # invariant under the per-frame affine restore). The previous
            # chunk's copy-out overlaps this chunk's compute: its async
            # copy was issued before this dispatch, and it lands after.
            out_dev = model.denoise_batch(chunk, as_numpy=False)
            if hasattr(out_dev, "copy_to_host_async"):
                out_dev.copy_to_host_async()
            if pending is not None:
                land(*pending)
            pending = (start, n_real, out_dev)
        if pending is not None:
            land(*pending)
        print("", file=sys.stderr)
        print("# writing to", output_path, file=sys.stderr)
        mrc.write(output_path, denoised, header=header,
                  extended_header=ext_header)
        return denoised

    denoised = np.zeros_like(stack, dtype=np.float32)
    for i in range(len(stack)):
        out_i = denoise_image(
            stack[i], models, lowpass=lowpass, cutoff=pixel_cutoff, gaus=gaus,
            inv_gaus=inv_gaus, deconvolve=deconvolve, deconv_patch=deconv_patch,
            patch_size=patch_size, padding=padding, normalize=normalize,
            downsample=downsample)
        if denoised.shape[1:] != out_i.shape:
            denoised = np.zeros((len(stack),) + out_i.shape, dtype=np.float32)
        denoised[i] = out_i
        print(f"# {i + 1} of {len(stack)} completed.", file=sys.stderr, end="\r")
    print("", file=sys.stderr)
    print("# writing to", output_path, file=sys.stderr)
    mrc.write(output_path, denoised, header=header, extended_header=ext_header)
    return denoised


# ---------------------------------------------------------------------------
# 3D drivers (topaz/denoise.py:495-557)
# ---------------------------------------------------------------------------

def denoise_tomogram(path: str, model: Denoise3D, outdir: Optional[str] = None,
                     suffix: str = "", patch_size: int = 96, padding: int = 48,
                     volume_num: int = 1, total_volumes: int = 1,
                     gaus: Optional[float] = None, verbose: bool = True):
    """Denoise one tomogram file + MRC header fixups (topaz/denoise.py:495-530)."""
    name = os.path.basename(path)
    tomo, header, ext_header = mrc.read(path)
    tomo = tomo.astype(np.float32)
    denoised = model.denoise(tomo, patch_size=patch_size, padding=padding,
                             volume_num=volume_num,
                             total_volumes=total_volumes, verbose=verbose)
    if gaus is not None:
        denoised = np.asarray(
            apply_kernel(denoised, gaussian_denoise_kernel(gaus, dims=3), dims=3)
        )

    if not outdir:
        sfx = suffix or ".denoised"
        no_ext, ext = os.path.splitext(path)
        outpath = no_ext + sfx + ext
    else:
        no_ext, ext = os.path.splitext(name)
        outpath = os.path.join(outdir, no_ext + suffix + ext)

    header = header.replace(mode=2, amin=denoised.min(), amax=denoised.max(),
                            amean=denoised.mean())
    mrc.write(outpath, denoised, header=header, extended_header=ext_header)
    return denoised


def denoise_tomogram_stream(volumes: List[str], model: Denoise3D,
                            output_path: str, suffix: str = "",
                            gaus: Optional[float] = None, patch_size: int = 96,
                            padding: int = 48, verbose: bool = True):
    """Denoise a list of tomogram files (topaz/denoise.py:533-557)."""
    total, count = len(volumes), 0
    out = []
    if output_path:
        os.makedirs(output_path, exist_ok=True)
    g = gaus if (gaus or 0) > 0 else None
    for idx, path in enumerate(volumes):
        out.append(denoise_tomogram(path, model, outdir=output_path,
                                    suffix=suffix, patch_size=patch_size,
                                    padding=padding, volume_num=idx + 1,
                                    total_volumes=total, gaus=g,
                                    verbose=verbose))
        count += 1
        print(f"# {count} of {total} tomograms denoised.", file=sys.stderr,
              end="\r")
    print("", file=sys.stderr)
    return out


# ---------------------------------------------------------------------------
# CLI glue
# ---------------------------------------------------------------------------

def denoise_main(args):
    """topaz denoise (topaz/commands/denoise.py:75-130)."""
    from topaz_tpu.parallel.devices import resolve_devices

    devices = resolve_devices(args.device)
    patch_size = args.patch_size
    if len(devices) > 1:
        # multi-device: denoise each micrograph whole, spatially sharded
        # over the mesh, instead of the serial patch loop
        print(f"# denoising sharded over {len(devices)} devices",
              file=sys.stderr)
        patch_size = -1

    do_train = (args.dir_a is not None and args.dir_b is not None) or \
               (args.hdf is not None)
    if do_train:
        from topaz_tpu.train.denoise_data import (make_hdf5_samplers,
                                                  make_paired_images_samplers)

        try:
            denoiser = Denoise(args.arch, devices=devices)
        except FileNotFoundError:
            denoiser = Denoise.from_arch(args.arch, devices=devices)

        if args.hdf is None:
            train_s, val_s = make_paired_images_samplers(
                args.dir_a, args.dir_b, crop=args.crop, holdout=args.holdout,
                cutoff=args.pixel_cutoff)
        else:
            train_s, val_s = make_hdf5_samplers(
                args.hdf, holdout=args.holdout, cutoff=args.pixel_cutoff)
        denoiser.train(train_s, val_s, loss_fn=args.criteria, optim=args.optim,
                       lr=args.lr, batch_size=args.batch_size,
                       num_epochs=args.num_epochs, save_best=True,
                       save_interval=args.save_interval,
                       save_prefix=args.save_prefix)
        models = [denoiser]
    else:
        models = []
        for name in args.model:
            if name == "none":
                print("# Warning: no denoising model will be used",
                      file=sys.stderr)
                continue
            print("# Loading model:", name, file=sys.stderr)
            models.append(Denoise(name, devices=devices,
                                  dtype=getattr(args, "precision", None)))
        if not models:
            return

    normalize = True if args.format_ in ("png", "jpg") else args.normalize
    gaus = args.gaussian if args.gaussian > 0 else None
    inv_gaus = args.inv_gaussian if args.inv_gaussian > 0 else None

    if len(args.micrographs) < 1:
        return
    if args.stack:
        return denoise_stack(args.micrographs[0], args.output, models,
                             lowpass=args.lowpass,
                             pixel_cutoff=args.pixel_cutoff, gaus=gaus,
                             inv_gaus=inv_gaus, deconvolve=args.deconvolve,
                             deconv_patch=args.deconv_patch,
                             patch_size=patch_size,
                             padding=args.patch_padding, normalize=normalize,
                             downsample=args.downsample)
    return denoise_stream(args.micrographs, args.output, args.format_,
                          args.suffix, models, lowpass=args.lowpass,
                          pixel_cutoff=args.pixel_cutoff, gaus=gaus,
                          inv_gaus=inv_gaus, deconvolve=args.deconvolve,
                          deconv_patch=args.deconv_patch,
                          patch_size=patch_size,
                          padding=args.patch_padding, normalize=normalize,
                          downsample=args.downsample)


def denoise3d_main(args):
    """topaz denoise3d (topaz/commands/denoise3d.py:88-130). The default
    ``-d -2`` maps the reference's all-GPU DataParallel onto the device
    mesh: denoising patch batches are sharded over the data axis."""
    from topaz_tpu.parallel.devices import resolve_devices

    devices = resolve_devices(args.device)
    if len(devices) > 1:
        print(f"# denoising on {len(devices)} devices", file=sys.stderr)

    do_train = (args.even_train_path is not None) or \
               (args.odd_train_path is not None)
    if do_train:
        from topaz_tpu.train.denoise_data import PairedTiles3D

        try:
            denoiser = Denoise3D(args.model, devices=devices)
        except FileNotFoundError:
            denoiser = Denoise3D.from_arch(
                "unet", base_width=args.base_kernel_width, dims=3,
                devices=devices)

        data = PairedTiles3D(args.even_train_path, args.odd_train_path,
                             args.crop, args.N_train, args.N_test)

        class _Wrapper:
            def __init__(self, mode):
                self.mode = mode

            def batches(self, batch_size, shuffle=True, mode=None):
                return data.batches(batch_size, mode=self.mode, shuffle=shuffle)

        denoiser.train(_Wrapper("train"), _Wrapper("test"),
                       loss_fn=args.criteria, optim=args.optim, lr=args.lr,
                       weight_decay=args.weight_decay,
                       batch_size=args.batch_size, num_epochs=args.num_epochs,
                       save_best=True, save_interval=args.save_interval,
                       save_prefix=args.save_prefix)
    else:
        if args.model == "none":
            print("# Warning: no denoising model will be used", file=sys.stderr)
            return
        print("# Loading model:", args.model, file=sys.stderr)
        try:
            denoiser = Denoise3D(args.model, devices=devices,
                                 dtype=getattr(args, "precision", None))
        except FileNotFoundError as e:
            # this mirror ships no 3D pretrained weights
            # (.MISSING_LARGE_BLOBS: unet-3d-10a/20a) — a raw traceback
            # here helps nobody; point at the training path instead
            print(f"Error: {e}", file=sys.stderr)
            print("Hint: the 3D pretrained weights are not bundled in "
                  "this installation; train a model with -a/--even-train-"
                  "path and -b/--odd-train-path, then pass it with -m.",
                  file=sys.stderr)
            sys.exit(1)

    if len(args.volumes) < 1:
        return
    shown = "auto" if args.patch_size == -2 else args.patch_size
    print(f"# denoising {len(args.volumes)} tomograms with patch size="
          f"{shown} and padding={args.patch_padding}",
          file=sys.stderr)
    return denoise_tomogram_stream(args.volumes, denoiser, args.output,
                                   suffix=args.suffix, gaus=args.gaussian,
                                   patch_size=args.patch_size,
                                   padding=args.patch_padding)
