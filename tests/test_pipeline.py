"""Batched mixed-size pipeline over the 8-device CPU mesh (config 5)."""

import numpy as np
import pytest


def _write_micrograph(path, rng, shape, peaks):
    from topaz_tpu.io import mrc

    x = rng.normal(0, 1, shape).astype(np.float32)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    for cy, cx in peaks:
        x -= 3.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0**2)).astype(np.float32)
    mrc.write(str(path), x)


def test_mixed_size_pipeline_sharded(tmp_path, rng):
    from topaz_tpu.parallel.mesh import make_mesh
    from topaz_tpu.pipeline import MicrographPipeline

    # two shape buckets, several micrographs each
    paths = []
    for i in range(4):
        p = tmp_path / f"a{i}.mrc"
        _write_micrograph(p, rng, (128, 128), [(40, 40), (90, 80)])
        paths.append(str(p))
    for i in range(3):
        p = tmp_path / f"b{i}.mrc"
        _write_micrograph(p, rng, (160, 96), [(60, 50)])
        paths.append(str(p))

    mesh = make_mesh(n_data=4, n_space=1)
    pipe = MicrographPipeline(model="resnet8_u32", scale=1, radius=6,
                              threshold=1.0, max_peaks=64, mesh=mesh)
    results = {path: (s, c) for path, s, c in pipe.process(paths)}
    assert set(results) == set(paths)
    for path, (scores, coords) in results.items():
        assert len(scores) >= 1
        assert np.all(np.diff(scores) <= 0)

    # batched+sharded result equals the single-image extract path
    from topaz_tpu.extract import score_images
    from topaz_tpu.ops.gmm import norm_fit
    from topaz_tpu.ops.nms import non_maximum_suppression
    from topaz_tpu.io.image import load_image
    import jax.numpy as jnp
    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.models.picker import apply_picker

    spec, params, state = load_picker("resnet8_u32")
    path = paths[0]
    img = np.asarray(load_image(path), dtype=np.float32)
    mu, std, *_ = norm_fit(jnp.asarray(img.ravel()))
    norm = (img - float(mu)) / float(std)
    score, _ = apply_picker(spec, params, norm[None], state=state, dense=True)
    s_ref, c_ref = non_maximum_suppression(np.asarray(score)[0], 6, threshold=1.0)
    s_batch, c_batch = results[path]
    assert len(s_ref) == len(s_batch)
    np.testing.assert_allclose(s_batch, s_ref, rtol=1e-4, atol=1e-5)


def test_pipeline_with_denoise(tmp_path, rng):
    from topaz_tpu.pipeline import MicrographPipeline

    p = tmp_path / "m.mrc"
    _write_micrograph(p, rng, (96, 96), [(48, 48)])
    pipe = MicrographPipeline(model="resnet8_u32", denoise_model="fcnn",
                              scale=1, radius=6, threshold=1.0, max_peaks=32)
    (path, scores, coords, den), = list(pipe.process([str(p)]))
    assert den.shape == (96, 96)
    assert np.isfinite(den).all()


def _exact_per_image_picks(path, radius, threshold, scale=1):
    """Per-image exact reference flow: [downsample ->] GMM normalize ->
    dense score -> exact NMS on the unpadded image."""
    import jax.numpy as jnp

    from topaz_tpu.io.image import load_image
    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.models.picker import apply_picker
    from topaz_tpu.ops.fourier import downsample
    from topaz_tpu.ops.gmm import norm_fit
    from topaz_tpu.ops.nms import non_maximum_suppression

    spec, params, state = load_picker("resnet8_u32")
    img = np.asarray(load_image(path), dtype=np.float32)
    if scale > 1:
        img = np.asarray(downsample(img, scale))
    mu, std, *_ = norm_fit(jnp.asarray(img.ravel()))
    norm = (img - float(mu)) / float(std)
    score, _ = apply_picker(spec, params, norm[None], state=state, dense=True)
    return non_maximum_suppression(np.asarray(score)[0], radius,
                                   threshold=threshold)


def test_masked_bucketing_five_shapes_two_programs(tmp_path, rng):
    """Five distinct camera geometries fall into <=2 compiled main programs
    (rounded shape buckets), and the masked-padding pipeline yields picks
    identical to per-image exact runs (GMM stats and NMS ignore padding)."""
    from topaz_tpu.pipeline import MicrographPipeline

    shapes = [(120, 128), (128, 122), (126, 128), (96, 120), (160, 128)]
    paths = []
    for i, shape in enumerate(shapes):
        p = tmp_path / f"g{i}.mrc"
        peaks = [(shape[0] // 3, shape[1] // 3),
                 (2 * shape[0] // 3, 2 * shape[1] // 3)]
        _write_micrograph(p, rng, shape, peaks)
        paths.append(str(p))

    pipe = MicrographPipeline(model="resnet8_u32", scale=1, radius=6,
                              threshold=1.0, normalize=True, bucket_step=64)
    results = {path: (s, c) for path, s, c in pipe.process(paths,
                                                           batch_size=4)}
    assert pipe.num_programs["main"] <= 2, pipe.num_programs
    assert pipe.num_programs["prep"] == 0  # no downsampling at scale=1

    assert set(results) == set(paths)
    for path in paths:
        s_ref, c_ref = _exact_per_image_picks(path, 6, 1.0)
        s_got, c_got = results[path]
        assert len(s_ref) == len(s_got), path
        np.testing.assert_array_equal(np.sort(c_got, axis=0),
                                      np.sort(c_ref, axis=0))
        np.testing.assert_allclose(s_got, s_ref, rtol=1e-3, atol=1e-4)


def test_masked_bucketing_with_downsample(tmp_path, rng):
    """scale>1: per-geometry prep programs downsample BEFORE padding (the
    FFT must not see padding); near-miss geometries merge into one main
    program and picks match per-image exact runs."""
    from topaz_tpu.pipeline import MicrographPipeline

    shapes = [(96, 96), (100, 96)]
    paths = []
    for i, shape in enumerate(shapes):
        p = tmp_path / f"d{i}.mrc"
        _write_micrograph(p, rng, shape, [(shape[0] // 2, shape[1] // 2)])
        paths.append(str(p))

    pipe = MicrographPipeline(model="resnet8_u32", scale=2, radius=3,
                              threshold=1.0, normalize=True, bucket_step=32)
    results = {path: (s, c) for path, s, c in pipe.process(paths,
                                                           batch_size=2)}
    assert pipe.num_programs["main"] == 1, pipe.num_programs
    assert pipe.num_programs["prep"] == 2  # one tiny FFT per geometry

    for path in paths:
        s_ref, c_ref = _exact_per_image_picks(path, 3, 1.0, scale=2)
        s_got, c_got = results[path]
        assert len(s_ref) == len(s_got), path
        np.testing.assert_array_equal(np.sort(c_got, axis=0),
                                      np.sort(c_ref, axis=0))
        np.testing.assert_allclose(s_got, s_ref, rtol=1e-3, atol=1e-4)


def test_host_downsample_matches_device_prep(tmp_path, rng):
    """host_downsample=True (prefetch-thread numpy FFT, only small images
    cross the host->device link) picks the same particles as the device
    prep path."""
    from topaz_tpu.pipeline import MicrographPipeline

    paths = []
    for i, shape in enumerate([(96, 96), (100, 96), (96, 96)]):
        p = tmp_path / f"h{i}.mrc"
        _write_micrograph(p, rng, shape, [(shape[0] // 2, shape[1] // 2)])
        paths.append(str(p))

    kw = dict(model="resnet8_u32", scale=2, radius=3, threshold=1.0,
              normalize=True, bucket_step=32)
    dev = MicrographPipeline(**kw)
    host = MicrographPipeline(host_downsample=True, num_workers=2, **kw)
    res_dev = {p: (s, c) for p, s, c in dev.process(paths, batch_size=2)}
    res_host = {p: (s, c) for p, s, c in host.process(paths, batch_size=2)}
    assert host.num_programs["prep"] == 0  # no device-side FFT programs

    for p in paths:
        s_d, c_d = res_dev[p]
        s_h, c_h = res_host[p]
        assert len(s_d) == len(s_h)
        np.testing.assert_array_equal(np.sort(c_h, axis=0),
                                      np.sort(c_d, axis=0))
        np.testing.assert_allclose(s_h, s_d, rtol=1e-3, atol=1e-4)


def test_pipeline_bins_close_to_exact(tmp_path, rng):
    """Histogram-EM normalization in the pipeline picks the same particles
    as the exact fit (bin quantization only)."""
    from topaz_tpu.pipeline import MicrographPipeline

    paths = []
    for i in range(2):
        p = tmp_path / f"b{i}.mrc"
        _write_micrograph(p, rng, (128, 128), [(40, 40), (90, 80)])
        paths.append(str(p))

    kw = dict(model="resnet8_u32", scale=1, radius=6, threshold=1.0,
              normalize=True, bucket_step=64)
    exact = {p: (s, c) for p, s, c in
             MicrographPipeline(**kw).process(paths, batch_size=2)}
    hist = {p: (s, c) for p, s, c in
            MicrographPipeline(bins=65536, **kw).process(paths, batch_size=2)}
    for p in paths:
        s_e, c_e = exact[p]
        s_h, c_h = hist[p]
        assert len(s_e) == len(s_h)
        np.testing.assert_array_equal(np.sort(c_h, axis=0),
                                      np.sort(c_e, axis=0))
        np.testing.assert_allclose(s_h, s_e, rtol=1e-2, atol=1e-3)


def test_dead_frame_in_shared_batch(tmp_path, rng):
    """A constant (std=0) frame in a shared batch must not poison it:
    the dead frame yields 0 picks, passthrough denoise, and a warning,
    while its batchmates' picks are identical to a solo run (documented
    divergence: the reference NaNs such frames, topaz/stats.py:36-83)."""
    import warnings as _warnings

    from topaz_tpu.io import mrc
    from topaz_tpu.pipeline import MicrographPipeline

    good = tmp_path / "good.mrc"
    _write_micrograph(good, rng, (96, 96), [(30, 30), (66, 60)])
    dead = tmp_path / "dead.mrc"
    mrc.write(str(dead), np.full((96, 96), 7.5, np.float32))

    kw = dict(model="resnet8_u32", denoise_model="fcnn", scale=1,
              radius=6, threshold=1.0, max_peaks=32, bucket_step=64)
    pipe = MicrographPipeline(**kw)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        results = {p: (s, c, d) for p, s, c, d in
                   pipe.process([str(good), str(dead)], batch_size=2)}
    assert any("constant image" in str(w.message) and "dead.mrc"
               in str(w.message) for w in rec)

    s_dead, c_dead, d_dead = results[str(dead)]
    assert len(s_dead) == 0
    np.testing.assert_array_equal(d_dead, np.full((96, 96), 7.5, np.float32))

    # batchmate unaffected: equals a solo run
    solo = MicrographPipeline(**kw)
    (_, s_solo, c_solo, d_solo), = list(solo.process([str(good)],
                                                     batch_size=1))
    s_good, c_good, d_good = results[str(good)]
    assert len(s_good) == len(s_solo)
    np.testing.assert_array_equal(c_good, c_solo)
    np.testing.assert_allclose(s_good, s_solo, rtol=1e-4, atol=1e-5)
    assert np.isfinite(d_good).all()


def test_dead_frame_normalize_paths(tmp_path, rng):
    """ops.gmm.normalize and the batched normalize workflow zero a dead
    frame with a warning instead of NaN (exact, histogram, and affine)."""
    import warnings as _warnings

    from topaz_tpu.ops.gmm import normalize

    x = np.full((32, 32), 3.0, np.float32)
    for kw in (dict(), dict(bins=4096), dict(method="affine")):
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            out, md = normalize(x, **kw)
        assert any("constant image" in str(w.message) for w in rec), kw
        np.testing.assert_array_equal(out, np.zeros_like(x))

    # batched workflow: one dead + one live micrograph, metadata intact
    from topaz_tpu.io import mrc
    from topaz_tpu.io.image import load_image
    from topaz_tpu.preprocess import normalize_images_batched

    live = tmp_path / "live.mrc"
    _write_micrograph(live, rng, (64, 64), [(32, 32)])
    dead = tmp_path / "dead.mrc"
    mrc.write(str(dead), np.full((64, 64), -2.0, np.float32))
    dest = tmp_path / "out"
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        normalize_images_batched([str(live), str(dead)], str(dest),
                                 metadata=True, batch_size=2)
    assert any("constant image" in str(w.message) and "dead.mrc"
               in str(w.message) for w in rec)
    out_dead = np.asarray(load_image(str(dest / "dead.mrc")))
    np.testing.assert_array_equal(out_dead, np.zeros((64, 64), np.float32))
    out_live = np.asarray(load_image(str(dest / "live.mrc")))
    assert np.isfinite(out_live).all() and out_live.std() > 0


def test_iterate_prefetched_propagates_and_orders():
    """The shared producer-thread protocol: order-preserving, bounded, and
    producer exceptions re-raise in the consumer (instead of hanging)."""
    import pytest

    from topaz_tpu.utils.batching import iterate_prefetched

    assert list(iterate_prefetched(iter(range(7)), maxsize=2)) == \
        list(range(7))
    # None is a legal item (the old ad-hoc protocol used it as sentinel)
    assert list(iterate_prefetched([None, 1, None])) == [None, 1, None]

    def boom():
        yield 1
        raise RuntimeError("producer died")

    it = iterate_prefetched(boom, maxsize=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        list(it)


def test_timings_include_device_compute(tmp_path, rng, monkeypatch):
    """TOPAZ_TIMINGS policy: with timings on, the stage block syncs on the
    device outputs (sync_for_timing), so per-batch numbers include compute;
    with timings off it is a no-op preserving async dispatch."""
    from topaz_tpu.utils import profiling

    monkeypatch.delenv("TOPAZ_TIMINGS", raising=False)
    monkeypatch.delenv("TOPAZ_PROFILE", raising=False)
    assert not profiling.timing_enabled()
    profiling.sync_for_timing((np.zeros(3),))  # no-op, no crash

    monkeypatch.setenv("TOPAZ_TIMINGS", "1")
    assert profiling.timing_enabled()

    from topaz_tpu.pipeline import MicrographPipeline

    p = tmp_path / "t.mrc"
    _write_micrograph(p, rng, (64, 64), [(32, 32)])
    profiling.reset()
    pipe = MicrographPipeline(model="resnet8_u32", scale=1, radius=4,
                              threshold=1.0, max_peaks=16)
    list(pipe.process([str(p)], batch_size=1))
    t = profiling.timings()
    key, = [k for k in t if k.startswith("pipeline/batch")]
    assert t[key]["count"] == 1 and t[key]["mean_ms"] > 0
    profiling.reset()


def test_pipeline_guards_and_prefetch_zero(tmp_path, rng):
    """Late-round regressions: prefetch=0 must not mean 'unbounded queue';
    user max_peaks clamps to the bucket size instead of crashing top_k;
    stacks/volumes and 3D denoisers are rejected with clear errors."""
    import pytest

    from topaz_tpu.io import mrc
    from topaz_tpu.pipeline import MicrographPipeline

    img = rng.normal(0, 1, (48, 48)).astype(np.float32)
    p = tmp_path / "m.mrc"
    mrc.write(str(p), img)

    pipe = MicrographPipeline(model="resnet8_u32", scale=1, radius=4,
                              threshold=999.0, normalize=True,
                              bucket_step=64, max_peaks=10**6)
    out = list(pipe.process([str(p)], batch_size=1, prefetch=0))
    assert len(out) == 1  # clamped top_k compiled and ran; no picks

    stack = rng.normal(0, 1, (3, 32, 32)).astype(np.float32)
    ps = tmp_path / "s.mrcs"
    mrc.write(str(ps), stack)
    with pytest.raises(ValueError, match="single 2D images"):
        list(pipe.process([str(ps)], batch_size=1))

    from topaz_tpu.models.denoise_factory import new_denoiser, save_denoiser

    meta, params = new_denoiser("unet-3d", nf=4, base_width=3, dims=3)
    d3 = str(tmp_path / "d3.npz")
    save_denoiser(d3, meta, params)
    with pytest.raises(ValueError, match="3D denoiser"):
        MicrographPipeline(model="resnet8_u32", denoise_model=d3, scale=1,
                           radius=4, threshold=0.0)


def test_skip_errors_continues_past_bad_files(tmp_path, rng):
    """skip_errors=True: unreadable/corrupt files warn and are skipped,
    good batchmates still produce identical picks; default stays
    fail-fast (reference-faithful)."""
    import warnings as _warnings

    import pytest

    from topaz_tpu.io import mrc
    from topaz_tpu.pipeline import MicrographPipeline

    good1 = tmp_path / "good1.mrc"
    _write_micrograph(good1, rng, (96, 96), [(30, 30)])
    good2 = tmp_path / "good2.mrc"
    _write_micrograph(good2, rng, (96, 96), [(60, 60)])
    truncated = tmp_path / "trunc.mrc"
    truncated.write_bytes(good1.read_bytes()[:700])  # mid-header cut
    garbage = tmp_path / "garbage.mrc"
    _write_micrograph(garbage, rng, (96, 96), [(48, 48)])
    data = bytearray(garbage.read_bytes())
    data[0:8] = (2**31 - 1).to_bytes(4, "little") * 2  # absurd nx/ny
    garbage.write_bytes(bytes(data))

    kw = dict(model="resnet8_u32", scale=1, radius=6, threshold=1.0,
              max_peaks=32, bucket_step=64)
    paths = [str(good1), str(truncated), str(good2), str(garbage)]

    # default: fail-fast
    with pytest.raises(Exception):
        list(MicrographPipeline(**kw).process(paths, batch_size=2))

    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        results = {p: (s, c) for p, s, c in
                   MicrographPipeline(skip_errors=True, **kw).process(
                       paths, batch_size=2)}
    assert set(results) == {str(good1), str(good2)}
    skipped = [str(w.message) for w in rec if "skipped" in str(w.message)]
    assert any("trunc.mrc" in m for m in skipped)
    assert any("garbage.mrc" in m for m in skipped)

    solo = {p: (s, c) for p, s, c in
            MicrographPipeline(**kw).process([str(good1), str(good2)],
                                             batch_size=2)}
    for p in solo:
        np.testing.assert_array_equal(results[p][1], solo[p][1])
        np.testing.assert_allclose(results[p][0], solo[p][0],
                                   rtol=1e-4, atol=1e-5)


def test_hybrid_data_space_mesh_matches_single(tmp_path, rng):
    """Hybrid (data x space) meshes: batch over 'data', image H axis over
    'space' (GSPMD conv halo exchange + masked-stat psums + score
    all-gather before NMS). 2x4 and pure-spatial 1x8 must match the
    single-device pipeline exactly, denoise arm included."""
    from topaz_tpu.parallel.mesh import make_mesh
    from topaz_tpu.pipeline import MicrographPipeline

    paths = []
    for i, shape in enumerate([(128, 128), (120, 128), (128, 96),
                               (64, 64)]):
        p = tmp_path / f"hy{i}.mrc"
        _write_micrograph(p, rng, shape,
                          [(shape[0] // 2, shape[1] // 2), (20, 30)])
        paths.append(str(p))

    kw = dict(model="resnet8_u32", denoise_model="fcnn", scale=1,
              radius=4, threshold=1.0, max_peaks=32, bucket_step=64)
    single = MicrographPipeline(**kw)
    ref = {p: (s, c, d) for p, s, c, d in single.process(paths)}

    for n_data, n_space, bs in [(2, 4, 2), (1, 8, 1)]:
        mesh = make_mesh(n_data=n_data, n_space=n_space)
        pipe = MicrographPipeline(mesh=mesh, **kw)
        got = {p: (s, c, d) for p, s, c, d in
               pipe.process(paths, batch_size=bs)}
        assert set(got) == set(ref)
        for p in paths:
            s_m, c_m, d_m = got[p]
            s_1, c_1, d_1 = ref[p]
            assert len(s_m) == len(s_1) > 0
            np.testing.assert_array_equal(c_m, c_1)
            np.testing.assert_allclose(s_m, s_1, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(d_m, d_1, rtol=1e-3, atol=1e-4)


def test_hybrid_mesh_factory():
    """hybrid_mesh_for factors leftover devices into the space axis."""
    import jax

    from topaz_tpu.parallel.devices import hybrid_mesh_for

    devs = jax.devices()
    assert len(devs) >= 8
    m = hybrid_mesh_for(devs[:8], batch_size=2)
    assert (m.shape["data"], m.shape["space"]) == (2, 4)
    m = hybrid_mesh_for(devs[:8], batch_size=1)
    assert (m.shape["data"], m.shape["space"]) == (1, 8)
    m = hybrid_mesh_for(devs[:8], batch_size=8)
    assert (m.shape["data"], m.shape["space"]) == (8, 1)
    m = hybrid_mesh_for(devs[:8], batch_size=3)  # 3x2 of 8, warns
    assert (m.shape["data"], m.shape["space"]) == (3, 2)
    assert hybrid_mesh_for(devs[:1], batch_size=1) is None
