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
