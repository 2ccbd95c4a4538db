import os
import sys
import types

import numpy as np
import pytest

from reference_oracle import ref_module, reference_available


def _torch_to_ours(model):
    from topaz_tpu.models.denoise import denoiser_params_from_state_dict

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return denoiser_params_from_state_dict(sd)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("alias", ["unet-small", "fcnn", "affine",
                                   "unet-v0.2.1"])
def test_pretrained_denoiser_parity(rng, alias):
    """Converted pretrained weights reproduce the torch forward pass."""
    import torch

    ref_models = ref_module("topaz.denoising.models")
    from topaz_tpu.models.denoise_factory import (PRETRAINED_DENOISERS,
                                                  apply_fn_for, load_denoiser)

    # construct the reference model + state dict directly (its packaged
    # loader assumes an installed package layout)
    stem = PRETRAINED_DENOISERS[alias]
    sav = f"/root/reference/topaz/pretrained/denoise/{stem}.sav"
    builders = {
        "unet_L2_v0.2.2": lambda: ref_models.UDenoiseNet(base_width=11, top_width=5),
        "unet_L2_v0.2.1": lambda: ref_models.UDenoiseNet(base_width=7, top_width=3),
        "unet_small_L1_v0.2.2": lambda: ref_models.UDenoiseNetSmall(width=11, top_width=5),
        "fcnn_L1_v0.2.2": lambda: ref_models.DenoiseNet2(64, width=11),
        "affine_L1_v0.2.2": lambda: ref_module("topaz.filters").AffineDenoise(max_size=31),
    }
    ref = builders[stem]()
    ref.load_state_dict(torch.load(sav, map_location="cpu", weights_only=False))
    ref.eval()
    x = rng.normal(size=(92, 108)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)[None, None]).numpy()[0, 0]

    meta, params = load_denoiser(alias)
    import jax.numpy as jnp

    ours = np.asarray(
        apply_fn_for(meta)(params, jnp.asarray(x)[None, :, :, None],
                           dims=2, precision="highest")
    )[0, :, :, 0]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_denoise_stream_overlapped_io(rng, tmp_path):
    """The prefetch+writer-thread stream writes every file and returns the
    denoised images in order; a failing save surfaces as an exception."""
    from topaz_tpu.denoise import Denoise, denoise_stream
    from topaz_tpu.io import mrc

    paths = []
    for i in range(3):
        p = tmp_path / f"m{i}.mrc"
        mrc.write(str(p), rng.normal(size=(48, 40)).astype(np.float32) + i)
        paths.append(str(p))

    dn = Denoise("affine")
    outdir = tmp_path / "out"
    outs = denoise_stream(paths, str(outdir), models=[dn], patch_size=-1)
    assert len(outs) == 3
    for i, p in enumerate(paths):
        expect = dn.denoise(
            (lambda x: (x - x.mean()) / x.std())(mrc.read(p)[0]))
        got = mrc.read(str(outdir / f"m{i}.mrc"))[0]
        ref = mrc.read(p)[0]
        np.testing.assert_allclose(
            got, ref.std() * expect + ref.mean(), rtol=1e-4, atol=1e-4)

    with pytest.raises(Exception):
        denoise_stream(paths, str(tmp_path / "bad"), format="bogus",
                       models=[dn], patch_size=-1)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("arch", ["unet2", "unet3"])
def test_unet_variant_parity(rng, arch):
    """unet2/unet3 (no pretrained weights) checked against torch with
    randomly initialized converted weights."""
    import torch

    ref_models = ref_module("topaz.denoising.models")
    from topaz_tpu.models.denoise import APPLY_FNS

    torch.manual_seed(0)
    ref = ref_models.UDenoiseNet2(nf=8) if arch == "unet2" \
        else ref_models.UDenoiseNet3()
    ref.eval()
    x = rng.normal(size=(64, 80)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)[None, None]).numpy()[0, 0]

    import jax.numpy as jnp

    params = _torch_to_ours(ref)
    ours = np.asarray(
        APPLY_FNS[arch](params, jnp.asarray(x)[None, :, :, None],
                        dims=2, precision="highest")
    )[0, :, :, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_unet3d_parity(rng):
    import torch

    ref_models = ref_module("topaz.denoising.models")
    from topaz_tpu.models.denoise import apply_unet

    torch.manual_seed(1)
    ref = ref_models.UDenoiseNet3D(nf=4, base_width=7)
    ref.eval()
    x = rng.normal(size=(36, 40, 44)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)[None, None]).numpy()[0, 0]

    import jax.numpy as jnp

    params = _torch_to_ours(ref)
    ours = np.asarray(
        apply_unet(params, jnp.asarray(x)[None, :, :, :, None], dims=3,
                   precision="highest")
    )[0, :, :, :, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_denoise_patches_matches_reference(rng):
    """Patch-tiled inference reproduces the reference patch semantics."""
    import torch

    ref_models = ref_module("topaz.denoising.models")
    from topaz_tpu.denoise import Denoise

    x = rng.normal(size=(100, 120)).astype(np.float32)

    d = Denoise("unet-small", precision="highest")
    ours = d.denoise(x, patch_size=48, padding=16)

    ref = ref_models.load_model("unet-small")
    ref.eval()

    # reference patch loop (topaz/denoise.py:299-324) with its _denoise
    y = np.zeros_like(x)
    with torch.no_grad():
        for i in range(0, x.shape[0], 48):
            for j in range(0, x.shape[1], 48):
                si, ei = max(0, i - 16), min(x.shape[0], i + 48 + 16)
                sj, ej = max(0, j - 16), min(x.shape[1], j + 48 + 16)
                xij = torch.from_numpy(x[si:ei, sj:ej])
                mu, std = xij.mean(), xij.std()
                pred = ref(((xij - mu) / std)[None, None]).squeeze() * std + mu
                oi, oj = i - si, j - sj
                y[i:i + 48, j:j + 48] = pred.numpy()[oi:oi + 48, oj:oj + 48]
    np.testing.assert_allclose(ours, y, rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_spatial_covariance_and_unblur(rng):
    ref_denoise = ref_module("topaz.denoise")
    import torch

    from topaz_tpu.ops.filters import estimate_unblur_filter, spatial_covariance

    import jax.numpy as jnp

    x = rng.normal(size=(80, 90)).astype(np.float32)
    ours_cov = np.asarray(spatial_covariance(jnp.asarray(x), n=11))
    theirs_cov = ref_denoise.spatial_covariance(torch.from_numpy(x), n=11).numpy()
    np.testing.assert_allclose(ours_cov, theirs_cov, rtol=1e-4, atol=1e-6)

    w, _ = estimate_unblur_filter(x, width=11)
    ref_filter, _ = ref_denoise.estimate_unblur_filter(torch.from_numpy(x), width=11)
    theirs_w = ref_filter.filter.weight.data.numpy()[0, 0]
    np.testing.assert_allclose(w, theirs_w, rtol=1e-4, atol=1e-6)


def test_denoise_image_pipeline_runs(rng):
    from topaz_tpu.denoise import Denoise, denoise_image

    x = rng.normal(size=(96, 96)).astype(np.float32)
    model = Denoise("fcnn")
    out = denoise_image(x, [model], lowpass=2, cutoff=4, deconvolve=False)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    # gaussian pre-filter branch
    out2 = denoise_image(x, [model], gaus=1.5)
    assert np.isfinite(out2).all()


def test_denoise_training_runs(tmp_path, rng):
    """Tiny noise2noise training: loss finite and decreasing-ish; best
    checkpoint saved and reloadable."""
    from topaz_tpu.io import mrc
    from topaz_tpu.denoise import Denoise3D, denoise3d_main

    # synthetic even/odd volume pair (tiles must survive 5 pooling levels)
    base = rng.normal(size=(96, 96, 96)).astype(np.float32)
    even = base + rng.normal(0, 0.5, base.shape).astype(np.float32)
    odd = base + rng.normal(0, 0.5, base.shape).astype(np.float32)
    mrc.write(str(tmp_path / "even.mrc"), even)
    mrc.write(str(tmp_path / "odd.mrc"), odd)

    args = types.SimpleNamespace(
        volumes=[], output="", suffix="", model="unet-3d",
        even_train_path=str(tmp_path / "even.mrc"),
        odd_train_path=str(tmp_path / "odd.mrc"),
        N_train=8, N_test=4, crop=32, base_kernel_width=7,
        optim="adagrad", lr=0.01, criteria="L2", momentum=0.8,
        batch_size=4, num_epochs=2, weight_decay=0,
        save_interval=10, save_prefix=str(tmp_path / "models" / "d3"),
        num_workers=1, num_threads=0,
        gaussian=0, patch_size=32, padding=8, device=-2,
    )
    denoise3d_main(args)
    # best-val checkpoint written
    files = os.listdir(tmp_path / "models")
    assert any(f.startswith("d3_epoch") for f in files)

    from topaz_tpu.models.denoise_factory import load_denoiser

    meta, params = load_denoiser(str(tmp_path / "models" / sorted(files)[-1]))
    assert meta["dims"] == 3


def test_denoise3d_batched_patches_match(tmp_path, rng):
    """Batched 3D patch inference equals batch_size=1 (same stitching)."""
    from topaz_tpu.denoise import Denoise3D

    den = Denoise3D.from_arch("unet", nf=4, base_width=7, dims=3, seed=1)

    vol = rng.normal(size=(64, 72, 80)).astype(np.float32)
    out1 = den.denoise(vol, patch_size=32, padding=8, batch_size=1,
                       verbose=False, device_resident=False)
    out4 = den.denoise(vol, patch_size=32, padding=8, batch_size=4,
                       verbose=False, device_resident=False)
    np.testing.assert_allclose(out1, out4, rtol=1e-5, atol=1e-5)


def test_denoise3d_device_resident_matches_streaming(rng):
    """The one-program device-resident volume path (upload once,
    dynamic_slice patches + dynamic_update_slice writeback in a scan)
    equals the streaming host patch loop on every voxel — including the
    ceil-grid overshoot rows and the zero-filled borders."""
    from topaz_tpu.denoise import Denoise3D

    den = Denoise3D.from_arch("unet", nf=4, base_width=7, dims=3, seed=2)
    vol = rng.normal(size=(40, 56, 50)).astype(np.float32)  # non-dividing
    res = den.denoise(vol, patch_size=16, padding=8, verbose=False,
                      device_resident=True)
    stream = den.denoise(vol, patch_size=16, padding=8, verbose=False,
                         device_resident=False)
    assert res.shape == stream.shape == vol.shape
    np.testing.assert_allclose(res, stream, rtol=2e-5, atol=2e-5)


def test_denoise2d_patches_device_resident_matches_stream(rng):
    """The hybrid device-resident 2D patch path (interior patches as one
    scan program over the resident image, border patches batched by
    truncated shape) equals the host patch loop everywhere — including
    the truncated right/bottom tiles."""
    from topaz_tpu.denoise import Denoise

    den = Denoise.from_arch("unet-small", nf=8, base_width=7, seed=3)
    x = rng.normal(size=(160, 150)).astype(np.float32)  # truncated tiles
    res = den._denoise_patches_resident(x, 48, 16)
    assert res is not None  # interior patches exist at this geometry
    stream = den._denoise_patches_stream(x, 48, padding=16)
    np.testing.assert_allclose(res, stream, rtol=2e-5, atol=2e-5)
    # public entry routes through the resident path on this geometry
    np.testing.assert_allclose(den.denoise(x, patch_size=48, padding=16),
                               res, rtol=2e-5, atol=2e-5)


def test_denoise2d_patches_resident_routing(rng):
    """No interior patches, an over-cap image, or a multi-frame input
    -> the resident path declines and the stream loop runs."""
    from topaz_tpu.denoise import Denoise

    den = Denoise.from_arch("unet-small", nf=8, base_width=7, seed=3)
    x = rng.normal(size=(100, 120)).astype(np.float32)
    assert den._denoise_patches_resident(x, 48, 16) is None  # all border
    den._DEVICE_RESIDENT_CAP = 0
    big = rng.normal(size=(160, 150)).astype(np.float32)
    assert den._denoise_patches_resident(big, 48, 16) is None
    out = den.denoise(big, patch_size=48, padding=16)
    assert out.shape == big.shape


def test_denoise3d_training_guards(tmp_path, rng):
    """Tiny inputs fail with clear errors instead of empty-axis crashes
    deep inside jit tracing: crop >= volume samples no tiles; crop below
    the arch's pooling-pyramid minimum is named with the flag to raise;
    too-small inference patches likewise."""
    import pytest

    from topaz_tpu.denoise import Denoise3D
    from topaz_tpu.io import mrc
    from topaz_tpu.train.denoise_data import PairedTiles3D

    even, odd = tmp_path / "even", tmp_path / "odd"
    even.mkdir(), odd.mkdir()
    vol = rng.normal(size=(32, 32, 32)).astype(np.float32)
    mrc.write(str(even / "t.mrc"), vol)
    mrc.write(str(odd / "t.mrc"), vol + 1)

    with pytest.raises(ValueError, match="strictly larger than the crop"):
        PairedTiles3D(str(even), str(odd), 32, 8, 4)

    data = PairedTiles3D(str(even), str(odd), 16, 8, 4)

    class _W:
        def __init__(self, mode):
            self.mode = mode

        def batches(self, batch_size, shuffle=True):
            return data.batches(batch_size, mode=self.mode, shuffle=shuffle)

    den = Denoise3D.from_arch("unet", nf=4, base_width=7, dims=3)
    with pytest.raises(ValueError, match="minimum input"):
        den.train(_W("train"), _W("test"), batch_size=2, num_epochs=1)

    with pytest.raises(ValueError, match="minimum input"):
        den.denoise(rng.normal(size=(40, 40, 40)).astype(np.float32),
                    patch_size=8, padding=4, verbose=False)


def test_denoise3d_device_resident_routing(rng):
    """Auto-routing falls back to streaming over the residency cap, and
    device_resident=True on an over-cap volume is a clear error."""
    import pytest

    from topaz_tpu.denoise import Denoise3D

    den = Denoise3D.from_arch("unet", nf=4, base_width=7, dims=3, seed=2)
    vol = rng.normal(size=(32, 32, 32)).astype(np.float32)
    assert den._denoise_device_resident(vol, 16, 8,
                                        verbose=False) is not None
    den._DEVICE_RESIDENT_CAP = 0
    assert den._denoise_device_resident(vol, 16, 8, verbose=False) is None
    out = den.denoise(vol, patch_size=16, padding=8, verbose=False)
    assert out.shape == vol.shape  # auto mode degraded gracefully
    with pytest.raises(ValueError):
        den.denoise(vol, patch_size=16, padding=8, verbose=False,
                    device_resident=True)


def test_denoise_cli_downsample(tmp_path, rng):
    """topaz denoise --downsample k denoises at picking scale: output is
    the Fourier-cropped size and equals denoising the pre-downsampled
    image."""
    import sys

    from topaz_tpu.cli import main as cli_main
    from topaz_tpu.io import mrc
    from topaz_tpu.ops.fourier import downsample_numpy

    img = rng.normal(0, 1, (128, 128)).astype(np.float32)
    mrc.write(str(tmp_path / "m.mrc"), img)
    small = downsample_numpy(img, 4)
    mrc.write(str(tmp_path / "pre.mrc"), small)

    for argv in (["denoise", "-m", "fcnn", "--downsample", "4", "-s", "-1",
                  "-o", str(tmp_path / "out_ds"), str(tmp_path / "m.mrc")],
                 ["denoise", "-m", "fcnn", "-s", "-1",
                  "-o", str(tmp_path / "out_pre"), str(tmp_path / "pre.mrc")]):
        old = sys.argv
        sys.argv = ["topaz"] + argv
        try:
            cli_main.main()
        finally:
            sys.argv = old

    a, _, _ = mrc.read(str(tmp_path / "out_ds" / "m.mrc"))
    b, _, _ = mrc.read(str(tmp_path / "out_pre" / "pre.mrc"))
    assert a.shape == (32, 32)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_unblur_filter_gaussian_parity(rng):
    """estimate_unblur_filter_gaussian matches the reference's torch/scipy
    fit (topaz/denoise.py:77-127, dead code upstream)."""
    import torch

    ref_denoise = ref_module("topaz.denoise")
    from topaz_tpu.ops.filters import estimate_unblur_filter_gaussian

    x = rng.normal(size=(80, 90)).astype(np.float32)
    # correlate the noise a bit so the fitted sigma is non-degenerate
    x = x + 0.5 * np.roll(x, 1, axis=0) + 0.5 * np.roll(x, 1, axis=1)

    w_inv, sigma, alpha, cov = estimate_unblur_filter_gaussian(x, width=11)
    ref_filter, ref_sigma, ref_alpha, ref_cov = \
        ref_denoise.estimate_unblur_filter_gaussian(torch.from_numpy(x),
                                                    width=11)
    np.testing.assert_allclose(cov, ref_cov.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(sigma, float(ref_sigma), rtol=1e-2)
    np.testing.assert_allclose(alpha, float(ref_alpha), rtol=1e-2)
    theirs_w = ref_filter.filter.weight.data.numpy()[0, 0]
    np.testing.assert_allclose(w_inv, theirs_w, rtol=1e-2, atol=1e-4)


def test_denoise_stack_batched_matches_per_frame(tmp_path, rng):
    """Batched stack fast path equals the per-frame pipeline."""
    from topaz_tpu.denoise import Denoise, denoise_image, denoise_stack
    from topaz_tpu.io import mrc

    stack = rng.normal(0, 2, (6, 96, 96)).astype(np.float32)
    src = tmp_path / "stack.mrcs"
    mrc.write(str(src), stack)

    model = Denoise("fcnn")
    out = denoise_stack(str(src), str(tmp_path / "den.mrcs"), [model],
                        patch_size=-1)
    assert out.shape == stack.shape
    for i in range(len(stack)):
        ref = denoise_image(stack[i], [model], patch_size=-1)
        np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)
    # written file round-trips
    written, _, _ = mrc.read(str(tmp_path / "den.mrcs"))
    np.testing.assert_allclose(written, out, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("arch", ["unet", "unet-small", "unet2", "unet3"])
def test_fused_upsample_decoder_parity(rng, arch, monkeypatch):
    """The input-dilated fused upsample+conv decoder (models/denoise.py
    _conv_up_cat) is numerically identical to the materialized
    nearest-upsample + concat + conv form, on exact-2x sizes (fused path)
    and odd sizes (fallback routing), 2D and 3D."""
    import jax
    import jax.numpy as jnp

    from topaz_tpu.models import denoise as D

    key = jax.random.PRNGKey(0)
    params = D.init_denoiser(arch, key, nf=8, base_width=7, top_width=3)
    for shape in ((2, 64, 96, 1), (1, 67, 91, 1)):
        x = jax.random.normal(jax.random.PRNGKey(1), shape)
        monkeypatch.setenv("TOPAZ_FUSED_UP", "0")
        y0 = D.APPLY_FNS[arch](params, x)
        monkeypatch.setenv("TOPAZ_FUSED_UP", "1")
        y1 = D.APPLY_FNS[arch](params, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-4, atol=1e-5)
    if arch == "unet":
        params = D.init_denoiser("unet", key, nf=4, base_width=5,
                                 top_width=3, dims=3)
        # 5-level 3D U-Net: every spatial dim must survive 5 2x pools
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 32, 1))
        monkeypatch.setenv("TOPAZ_FUSED_UP", "0")
        y0 = D.apply_unet(params, x, dims=3)
        monkeypatch.setenv("TOPAZ_FUSED_UP", "1")
        y1 = D.apply_unet(params, x, dims=3)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-4, atol=1e-5)


def test_fused_decoder_bf16_gate(monkeypatch):
    """The fused-decoder area gate is byte-based: bfloat16 activations
    double the safe area (the 4k f32 OOM is an HBM-bytes phenomenon;
    v5e measured the bf16 fused U-Net 11% faster at 4096^2). Above the
    f32 cap a bf16 decoder level must take the fused path AND stay
    numerically equal to the materialized concat form."""
    import jax
    import jax.numpy as jnp

    from topaz_tpu.models import denoise as D

    assert D._fused_area_cap(jnp.float32) == D._FUSED_UP_MAX_AREA
    assert D._fused_area_cap(jnp.bfloat16) == 4096 * 4096  # measured safe

    # one decoder level sized between the f32 and bf16 caps (2304^2 out)
    k = jax.random.PRNGKey(0)
    h = jax.random.normal(k, (1, 1152, 1152, 2), jnp.bfloat16)
    skip = jax.random.normal(jax.random.PRNGKey(1), (1, 2304, 2304, 1),
                             jnp.bfloat16)
    p = {"w": 0.1 * jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 2),
                                      jnp.bfloat16),
         "b": jnp.zeros((2,), jnp.bfloat16)}
    y_fused = D._up_block(h, skip, p)  # area > f32 cap -> fused via bf16
    y_concat = D._conv_cat(D._up_nearest(h, (2304, 2304)), skip, p)
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_concat, np.float32),
        rtol=5e-2, atol=5e-2)  # bf16 summation-order tolerance
    # f32 at the same size keeps the materialized form (routing check:
    # identical values either way, so assert the gate decision directly)
    assert 2304 * 2304 > D._fused_area_cap(jnp.float32)
    assert 2304 * 2304 <= D._fused_area_cap(jnp.bfloat16)


def test_auto_patch_size_economics():
    """auto_patch_size minimizes n_patches * (s+2p)^3 with MXU-aligned
    padded extents, reproducing the measured patch-economics ranking
    (profiles/PROFILE.md: on 192x384x384, patch 160 processes MORE voxels
    than 96; a divisor patch avoids grid overshoot)."""
    from topaz_tpu.denoise import auto_patch_size

    def cost(shape, s, p=48):
        n = 1
        for d in shape:
            n *= -(-d // s)
        return n * (s + 2 * p) ** 3

    shape = (192, 384, 384)
    s = auto_patch_size(shape, padding=48)
    assert (s + 96) % 32 == 0 and s + 96 <= 256
    for cand in (32, 64, 96, 128, 160):
        assert cost(shape, s) <= cost(shape, cand)
    # a cube divisible by 96 picks a divisor-friendly size
    s2 = auto_patch_size((96, 96, 96), padding=48)
    assert cost((96, 96, 96), s2) <= cost((96, 96, 96), 96)


def test_denoise3d_auto_patch_matches_explicit(tmp_path, rng):
    """Denoise3D.denoise(patch_size=-2) equals the explicitly chosen size."""
    from topaz_tpu.denoise import Denoise3D, auto_patch_size

    model = Denoise3D.from_arch("unet", nf=4, base_width=5, dims=3)
    vol = rng.normal(0, 1, (64, 64, 64)).astype(np.float32)
    s = auto_patch_size(vol.shape, padding=16)
    auto = model.denoise(vol, patch_size=-2, padding=16, verbose=False)
    explicit = model.denoise(vol, patch_size=s, padding=16, verbose=False)
    np.testing.assert_allclose(auto, explicit, rtol=1e-5, atol=1e-6)


def test_denoise_bf16_fast_mode(rng):
    """dtype='bf16' opt-in: runs end-to-end, output close to the f32 path
    (documented ~0.4% relative error fast mode)."""
    from topaz_tpu.denoise import Denoise

    x = rng.normal(0, 2, (96, 96)).astype(np.float32)
    f32 = Denoise("unet-small")
    b16 = Denoise("unet-small", dtype="bf16")
    y32 = f32.denoise(x, patch_size=-1)
    y16 = b16.denoise(x, patch_size=-1)
    assert y16.dtype == np.float32
    scale = np.abs(y32).mean() + 1e-6
    assert np.mean(np.abs(y32 - y16)) / scale < 0.05
    # without a multi-device mesh the halo path declines (devices=None)
    assert b16._apply_halo(x) is None


def test_paired_tiles_3d_odd_tilesize(tmp_path, rng):
    """Odd tilesizes produce exactly tilesize-cubed tiles (regression: the
    symmetric c±t//2 slice silently yielded (t-1)-tiles)."""
    from topaz_tpu.io import mrc
    from topaz_tpu.train.denoise_data import PairedTiles3D

    vol = rng.normal(size=(48, 48, 48)).astype(np.float32)
    even, odd = str(tmp_path / "even.mrc"), str(tmp_path / "odd.mrc")
    mrc.write(even, vol)
    mrc.write(odd, vol + 1)
    tiles = PairedTiles3D(even, odd, tilesize=11, n_train=6, n_test=2,
                          seed=0)
    for x, y in tiles.batches(2, mode="train", shuffle=False):
        assert x.shape[1:] == (11, 11, 11)
        assert y.shape[1:] == (11, 11, 11)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_convert_unet3_sav_detects_residual_arch(tmp_path, rng):
    """A whole-module UDenoiseNet3 .sav converts as 'unet3' (regression:
    shape-identical to UDenoiseNet, it was misdetected as 'unet' and
    silently returned the NOISE estimate instead of the denoised image)."""
    import torch

    ref_models = ref_module("topaz.denoising.models")
    from topaz_tpu.models.denoise import APPLY_FNS
    from topaz_tpu.models.denoise_factory import load_denoiser

    torch.manual_seed(0)
    ref = ref_models.UDenoiseNet3()
    ref.eval()
    sav = str(tmp_path / "n3.sav")
    torch.save(ref, sav)

    meta, params = load_denoiser(sav)
    assert meta["arch"] == "unet3"
    x = rng.normal(size=(64, 64)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)[None, None]).numpy()[0, 0]
    import jax.numpy as jnp

    ours = np.asarray(APPLY_FNS["unet3"](
        params, jnp.asarray(x)[None, :, :, None], dims=2,
        precision="highest"))[0, :, :, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_denoiser_sav_export_roundtrip(tmp_path, rng):
    """Denoiser checkpoints export as state-dict .sav (torch-free) and
    torch.load + the reference module read them with forward parity."""
    import sys

    import torch

    from reference_oracle import ref_module, reference_available
    from topaz_tpu.models.convert import export_denoiser_sav
    from topaz_tpu.models.denoise_factory import load_denoiser

    if not reference_available():
        import pytest

        pytest.skip("reference not mounted")

    sav = str(tmp_path / "fcnn.sav")
    export_denoiser_sav(sav, "fcnn")
    sd = torch.load(sav, map_location="cpu", weights_only=True)

    ref_models = ref_module("topaz.denoising.models")
    module = ref_models.DenoiseNet2(64, width=11)
    module.load_state_dict(sd)
    module.eval()

    meta, params = load_denoiser("fcnn")
    from topaz_tpu.models.denoise_factory import apply_fn_for
    import jax.numpy as jnp

    x = rng.normal(0, 1, (64, 64)).astype(np.float32)
    with torch.no_grad():
        theirs = module(torch.from_numpy(x)[None, None]).numpy()[0, 0]
    ours = np.asarray(apply_fn_for(meta)(
        params, jnp.asarray(x)[None, :, :, None], dims=2,
        precision="highest"))[0, :, :, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_picker_whole_module_export_dropin(tmp_path, rng):
    """--whole-module picker export produces a pickled nn.Module the
    reference factory's user path loads directly (torch.load returning a
    usable model, topaz/model/factory.py:54-56), with forward parity."""
    import pytest
    import torch

    from reference_oracle import ref_module, reference_available
    from topaz_tpu.models.convert import export_picker_sav
    from topaz_tpu.models.factory import load_picker, new_picker, save_picker
    from topaz_tpu.models.picker import apply_picker

    if not reference_available():
        pytest.skip("reference not mounted")

    ref_factory = ref_module("topaz.model.factory")  # puts topaz on sys.path

    spec, params, state = new_picker("resnet8", units=4, seed=7)
    ckpt = str(tmp_path / "mine.npz")
    save_picker(ckpt, spec, params, state)
    sav = str(tmp_path / "mine_module.sav")
    export_picker_sav(sav, ckpt, whole_module=True)
    model = ref_factory.load_model(sav)  # the user path: whole module
    model.eval()
    assert model.width == spec.width

    x = rng.normal(size=(2, spec.width, spec.width)).astype(np.float32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(x)[:, None]).numpy().ravel()
    ours, _ = apply_picker(spec, params, x, state=state, dense=False,
                           precision="highest")
    np.testing.assert_allclose(np.asarray(ours).ravel(), theirs,
                               rtol=1e-4, atol=1e-5)


def test_denoiser_whole_module_export_dropin(tmp_path, rng):
    """--whole-module denoiser export produces a pickled nn.Module the
    reference denoise CLI's user path loads directly (bare torch.load,
    topaz/denoising/models.py:608-610), with forward parity — covering a
    freshly trained unet-small, not just pretrained aliases."""
    import pytest
    import torch

    from reference_oracle import ref_module, reference_available
    from topaz_tpu.models.convert import export_denoiser_sav
    from topaz_tpu.models.denoise_factory import (apply_fn_for, new_denoiser,
                                                  save_denoiser)

    if not reference_available():
        pytest.skip("reference not mounted")

    ref_models = ref_module("topaz.denoising.models")  # puts topaz on sys.path

    meta, params = new_denoiser("unet-small", nf=8, base_width=7,
                                top_width=3, seed=3)
    ckpt = str(tmp_path / "mine.npz")
    save_denoiser(ckpt, meta, params)
    sav = str(tmp_path / "mine_module.sav")
    export_denoiser_sav(sav, ckpt, whole_module=True)

    module = torch.load(sav, map_location="cpu", weights_only=False)
    assert type(module).__name__ == "UDenoiseNetSmall"
    module.eval()

    import jax.numpy as jnp

    x = rng.normal(0, 1, (64, 64)).astype(np.float32)
    with torch.no_grad():
        theirs = module(torch.from_numpy(x)[None, None]).numpy()[0, 0]
    ours = np.asarray(apply_fn_for(meta)(
        params, jnp.asarray(x)[None, :, :, None], dims=2,
        precision="highest"))[0, :, :, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_conv31_whole_module_export_dropin(tmp_path, rng):
    """conv archs export with the reference basic.py raw-Sequential slot
    layout (conv, act, ... — not the resnet .conv nesting), so both the
    state-dict and the whole-module .sav load on the reference side with
    forward parity."""
    import pytest
    import torch

    from reference_oracle import ref_module, reference_available
    from topaz_tpu.models.convert import export_picker_sav
    from topaz_tpu.models.factory import new_picker, save_picker
    from topaz_tpu.models.picker import apply_picker

    if not reference_available():
        pytest.skip("reference not mounted")

    ref_factory = ref_module("topaz.model.factory")  # puts topaz on sys.path

    spec, params, state = new_picker("conv31", units=4, seed=11)
    ckpt = str(tmp_path / "c31.npz")
    save_picker(ckpt, spec, params, state)
    sav = str(tmp_path / "c31_module.sav")
    export_picker_sav(sav, ckpt, whole_module=True)
    model = torch.load(sav, map_location="cpu", weights_only=False)
    model.eval()
    assert model.width == spec.width

    x = rng.normal(size=(2, spec.width, spec.width)).astype(np.float32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(x)[:, None]).numpy().ravel()
    ours, _ = apply_picker(spec, params, x, state=state, dense=False,
                           precision="highest")
    np.testing.assert_allclose(np.asarray(ours).ravel(), theirs,
                               rtol=1e-4, atol=1e-5)


def test_whole_image_oom_falls_back_to_patches(rng, capsys):
    """A device OOM on whole-image denoising (measured: K3-sized
    5760x4092 f32 frames exceed 16 GB HBM) degrades to reference-semantics
    patch denoising with a warning instead of surfacing the XLA error,
    and later same-or-larger images route straight to patches."""
    from topaz_tpu.denoise import Denoise

    x = rng.normal(0, 2, (200, 200)).astype(np.float32)
    dn = Denoise("affine")

    calls = {"n": 0}

    def boom(params, arr):
        calls["n"] += 1
        raise RuntimeError(
            "INTERNAL: XLA:TPU compile permanent error. Ran out of memory "
            "in memory space hbm. Used 16.88G of 15.75G hbm.")

    dn._jit_cache[x.shape] = boom
    y = dn._apply(x)
    assert calls["n"] == 1
    assert dn._oom_area == x.size
    assert "falling back" in capsys.readouterr().err
    # the fallback result matches explicit patch denoising at the chosen
    # (shrunken) patch size on a fresh instance
    ref = Denoise("affine").denoise_patches(x, 64, padding=32)
    assert np.allclose(y, ref)
    # second call: direct patch route, the poisoned program is gone and
    # never re-tried
    dn._jit_cache[x.shape] = boom
    y2 = dn._apply(x)
    assert calls["n"] == 1
    assert np.allclose(y2, ref)


def test_non_oom_errors_still_raise(rng):
    """Only memory errors trigger the patch fallback."""
    from topaz_tpu.denoise import Denoise

    x = rng.normal(0, 2, (64, 64)).astype(np.float32)
    dn = Denoise("affine")

    def boom(params, arr):
        raise RuntimeError("INVALID_ARGUMENT: something else entirely")

    dn._jit_cache[x.shape] = boom
    import pytest

    with pytest.raises(RuntimeError, match="something else"):
        dn._apply(x)


def test_batch_oom_falls_back_to_per_frame(rng, capsys):
    """An OOM on the batched movie-frame program degrades to per-frame
    whole-image denoising."""
    from topaz_tpu.denoise import Denoise

    frames = rng.normal(0, 2, (3, 64, 64)).astype(np.float32)
    dn = Denoise("affine")

    def boom(params, arr):
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory allocating")

    dn._jit_cache[("fbatch",) + frames.shape] = boom
    y = dn.denoise_batch(frames)
    assert "one at a time" in capsys.readouterr().err
    ref = np.stack([Denoise("affine")._apply(f) for f in frames])
    assert np.allclose(y, ref)


def test_denoise2d_min_extent_guards(rng):
    """2D inputs (or padded patches) below the arch's pooling minimum fail
    with the clear named-flag error, mirroring the 3D guard (ADVICE r4):
    whole images, the patch route, and the batch API."""
    import pytest

    from topaz_tpu.denoise import Denoise

    den = Denoise.from_arch("unet", nf=4, base_width=7, seed=0)
    tiny = rng.normal(size=(16, 64)).astype(np.float32)
    with pytest.raises(ValueError, match="minimum input"):
        den.denoise(tiny)
    big = rng.normal(size=(128, 128)).astype(np.float32)
    with pytest.raises(ValueError, match="minimum input"):
        den.denoise(big, patch_size=8, padding=4)
    with pytest.raises(ValueError, match="minimum input"):
        den.denoise_batch(tiny[None])
    # at/above the minimum both routes still run
    ok = rng.normal(size=(32, 40)).astype(np.float32)
    assert den.denoise(ok).shape == ok.shape


def test_denoise_patches_resident_preserves_dtype(rng):
    """The device-resident patch route returns the caller's dtype, same as
    the streaming route's np.zeros_like contract (ADVICE r4): a float64
    image must not come back float32 depending on routing."""
    from topaz_tpu.denoise import Denoise

    den = Denoise.from_arch("unet-small", nf=8, base_width=7, seed=3)
    x64 = rng.normal(size=(160, 150)).astype(np.float64)
    y_res = den._denoise_patches_resident(x64, 48, 16)
    assert y_res is not None and y_res.dtype == np.float64
    y_str = den._denoise_patches_stream(x64, 48, 16)
    assert y_str.dtype == np.float64
    assert np.allclose(y_res, y_str, atol=1e-5)
