import numpy as np
import pytest

from topaz_tpu.models.factory import load_picker, new_picker, save_picker
from topaz_tpu.models.picker import apply_picker, make_picker_spec

from reference_oracle import ref_module, reference_available


def test_receptive_fields():
    # published receptive fields (README.md:466-470): resnet8=71,
    # conv31/63/127 = their names; resnet16 = 91 (verified against the
    # reference's insize_from_outsize in test_dense_scoring_parity)
    assert make_picker_spec("resnet8", units=32).width == 71
    assert make_picker_spec("resnet16", units=32).width == 91
    assert make_picker_spec("conv31", units=32).width == 31
    assert make_picker_spec("conv63", units=32).width == 63
    assert make_picker_spec("conv127", units=32).width == 127


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("alias", ["resnet8_u32", "resnet16_u32"])
def test_dense_scoring_parity(rng, alias):
    """Dense (filled) score maps match the torch reference bit-closely."""
    import torch

    ref_factory = ref_module("topaz.model.factory")
    ref = ref_factory.load_model(alias)
    ref.eval()
    ref.fill()
    x = rng.normal(size=(96, 96)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)[None, None]).numpy()[0, 0]

    spec, params, state = load_picker(alias)
    assert spec.width == ref.width
    ours, _ = apply_picker(spec, params, x[None], state=state, dense=True,
                           precision="highest")
    ours = np.asarray(ours)[0]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_strided_crop_scoring_parity(rng):
    """Strided (training) form on width-sized crops matches the torch
    unfilled classifier."""
    import torch

    ref_factory = ref_module("topaz.model.factory")
    ref = ref_factory.load_model("resnet8_u32")
    ref.eval()
    w = ref.width
    x = rng.normal(size=(4, w, w)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)[:, None]).numpy()[:, 0, 0, 0]

    spec, params, state = load_picker("resnet8_u32")
    ours, _ = apply_picker(spec, params, x, state=state, dense=False,
                           precision="highest")
    ours = np.asarray(ours).reshape(-1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_strided_dense_consistency(rng):
    """The dense map sampled at stride-aligned points equals the strided
    output (one architecture, both forms, same weights)."""
    spec, params, state = new_picker("resnet8", units=8, seed=1)
    x = rng.normal(size=(1, 95, 95)).astype(np.float32)
    dense, _ = apply_picker(spec, params, x, state=state, dense=True,
                            pad=False, precision="highest")
    strided, _ = apply_picker(spec, params, x, state=state, dense=False,
                              precision="highest")
    dense = np.asarray(dense)[0]
    strided = np.asarray(strided)[0]
    s = spec.stride
    np.testing.assert_allclose(dense[::s, ::s], strided, rtol=1e-4, atol=1e-5)


def test_bn_architecture_runs(rng):
    """Default training config (--bn on) forward works in both modes."""
    spec, params, state = new_picker("resnet8", units=8, bn=True, seed=0)
    x = rng.normal(size=(2, 71, 71)).astype(np.float32)
    y, new_state = apply_picker(spec, params, x, state=state, dense=False,
                                train=True)
    assert y.shape == (2, 1, 1)
    # running stats updated
    assert not np.allclose(
        np.asarray(new_state["features"]["0"]["bn"]["mean"]), 0
    )


def test_checkpoint_roundtrip(tmp_path, rng):
    spec, params, state = new_picker("resnet16", units=8, seed=3)
    path = str(tmp_path / "model.npz")
    save_picker(path, spec, params, state)
    spec2, params2, state2 = load_picker(path)
    assert spec2.width == spec.width
    x = rng.normal(size=(1, spec.width, spec.width)).astype(np.float32)
    y1, _ = apply_picker(spec, params, x, state=state, dense=False)
    y2, _ = apply_picker(spec2, params2, x, state=state2, dense=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_checkpoint_roundtrip_nondefault_activation(tmp_path, rng):
    """A picker saved with a non-default activation reloads with that
    activation (regression: _spec_from_meta dropped meta['activation'],
    silently rebuilding with the arch default)."""
    import jax

    from topaz_tpu.models.picker import init_picker, make_picker_spec

    spec = make_picker_spec("resnet8", units=8, activation="prelu")
    params, state = init_picker(spec, jax.random.PRNGKey(0))
    path = str(tmp_path / "prelu.npz")
    save_picker(path, spec, params, state)
    spec2, params2, state2 = load_picker(path)
    assert spec2 == spec
    x = rng.normal(size=(1, spec.width, spec.width)).astype(np.float32)
    y1, _ = apply_picker(spec, params, x, state=state, dense=False)
    y2, _ = apply_picker(spec2, params2, x, state=state2, dense=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_tiled_scoring_reuses_compiled_program(rng):
    """Tiled scoring caches one jitted program per (spec, precision) so
    scoring N images does not re-trace N times (regression: fresh jit
    closure per call)."""
    import jax

    from topaz_tpu.models.factory import new_picker
    from topaz_tpu.models.picker import init_picker
    from topaz_tpu.models.tiling import _score_tiles_fn, predict_in_patches

    _score_tiles_fn.cache_clear()
    spec, params, state = new_picker("resnet8", units=4, seed=0)
    a = rng.normal(size=(96, 96)).astype(np.float32)
    b = rng.normal(size=(96, 96)).astype(np.float32)
    ya = predict_in_patches(spec, params, state, a, 48, batch_size=2)
    yb = predict_in_patches(spec, params, state, b, 48, batch_size=2)
    info = _score_tiles_fn.cache_info()
    assert info.misses == 1 and info.hits >= 1
    assert ya.shape == a.shape and yb.shape == b.shape
    # padded ragged batches leave results identical to whole-image scoring
    whole, _ = apply_picker(spec, params, a[None], state=state, dense=True)
    np.testing.assert_allclose(ya, np.asarray(whole[0]), rtol=1e-4,
                               atol=1e-4)


def test_pooling_geometry_and_kinds():
    """convN pooling keeps the named receptive field via padded pools
    (basic.py:55), avg and max genuinely differ, and resnet rejects 'avg'
    with the contract (the reference crashes opaquely)."""
    import jax
    import numpy as np
    import pytest

    from topaz_tpu.models.picker import (apply_picker, init_picker,
                                         make_picker_spec)

    spec_max = make_picker_spec("conv31", units=4, pooling="max")
    spec_avg = make_picker_spec("conv31", units=4, pooling="avg")
    assert spec_max.width == 31 and spec_avg.width == 31

    params, state = init_picker(spec_max, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).normal(
        size=(1, 31, 31)).astype(np.float32)
    y_max, _ = apply_picker(spec_max, params, x, state=state, dense=False)
    y_avg, _ = apply_picker(spec_avg, params, x, state=state, dense=False)
    assert not np.allclose(np.asarray(y_max), np.asarray(y_avg))

    with pytest.raises(ValueError, match="pooling='max' only"):
        make_picker_spec("resnet8", units=4, pooling="avg")


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_convert_pooled_resnet_sav(tmp_path, rng):
    """A reference picker trained with --pooling max converts with the
    right architecture, pooling flag, and numerics (regression: pooled
    resnet8 was misdetected as resnet16 and the params misaligned)."""
    import torch

    ref_classifier = ref_module("topaz.model.classifier")
    ref_factory = ref_module("topaz.model.factory")

    torch.manual_seed(0)
    feat = ref_factory.get_feature_extractor("resnet8", units=8, bn="off",
                                             pooling="max")
    model = ref_classifier.LinearClassifier(feat)
    model.eval()
    sav = str(tmp_path / "pooled.sav")
    torch.save(model, sav)

    spec, params, state = load_picker(sav)
    assert spec.arch == "resnet8"
    assert any(getattr(s, "kind", None) == "max" for s in spec.features)
    assert spec.width == model.width

    x = rng.normal(size=(1, spec.width, spec.width)).astype(np.float32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(x)[:, None]).numpy().ravel()
    ours, _ = apply_picker(spec, params, x, state=state, dense=False,
                           precision="highest")
    np.testing.assert_allclose(np.asarray(ours).ravel(), theirs,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_convert_conv_arch_sav_clear_error(tmp_path):
    """BasicConv (conv31/63/127) .sav conversion is not supported — the
    converter says so clearly instead of a KeyError deep inside."""
    import pytest as _pytest
    import torch

    ref_basic = ref_module("topaz.model.features.basic")
    ref_classifier = ref_module("topaz.model.classifier")

    torch.manual_seed(0)
    feat = ref_basic.BasicConv([7, 5, 5], 8, bn=False)
    model = ref_classifier.LinearClassifier(feat)
    sav = str(tmp_path / "conv31.sav")
    torch.save(model, sav)
    with _pytest.raises(ValueError, match="conv31/63/127"):
        load_picker(sav)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_torchfree_sav_reader(tmp_path, rng, monkeypatch):
    """.sav checkpoints load WITHOUT torch (SURVEY section 7.1): the
    restricted unpickler + storage decoder reads bundled legacy
    state-dict savs and whole-module pickles in both zip and legacy
    formats, byte-identical to torch.load (reference load sites:
    topaz/model/factory.py:54-56, topaz/denoising/models.py:608-610)."""
    import sys

    import torch

    from topaz_tpu.models.convert import (_load_torch, _state_dict_of,
                                          load_sav)

    ref_factory = ref_module("topaz.model.factory")
    model = ref_factory.load_model("resnet8_u32")
    model.eval()
    whole_zip = str(tmp_path / "whole_zip.sav")
    whole_legacy = str(tmp_path / "whole_legacy.sav")
    torch.save(model, whole_zip)
    torch.save(model, whole_legacy, _use_new_zipfile_serialization=False)
    state_zip = str(tmp_path / "state_zip.sav")
    torch.save(model.state_dict(), state_zip)
    bundled = ("/root/reference/topaz/pretrained/detector/"
               "resnet8_u32.sav")
    expected = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    # now make `import torch` fail: the reader must not need it
    for mod in [m for m in sys.modules if m == "torch"
                or m.startswith("torch.")]:
        monkeypatch.setitem(sys.modules, mod, None)

    import warnings as _warnings

    for path in (bundled, state_zip, whole_zip, whole_legacy):
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # the torch fallback warns
            sd = _state_dict_of(load_sav(path))
        assert set(sd) == set(expected), path
        for k in expected:
            np.testing.assert_array_equal(np.asarray(sd[k]), expected[k])

    # full conversion path (arch sniffing via stub module names) and
    # numerical parity of the loaded picker, all torch-free
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        spec, params, state = load_picker(whole_legacy)
    assert spec.arch == "resnet8"
    x = rng.normal(size=(1, spec.width, spec.width)).astype(np.float32)
    ours, _ = apply_picker(spec, params, x, state=state, dense=False,
                           precision="highest")
    spec2, params2, state2 = load_picker("resnet8_u32")
    ref_out, _ = apply_picker(spec2, params2, x, state=state2, dense=False,
                              precision="highest")
    np.testing.assert_allclose(np.asarray(ours).ravel(),
                               np.asarray(ref_out).ravel(),
                               rtol=1e-5, atol=1e-6)


def test_3d_dense_crop_scoring_parity(rng):
    """3D dense scoring is voxel-exact vs per-crop classification — the
    invariant that rules out a 3D score bias (round-3 investigation of
    the 'extract --dims 3 finds no picks at t=-6 on noise' observation;
    see ROADMAP 'extract --dims 3 anomaly: resolved'). The distribution
    difference vs 2D is a calibration property of the larger 3D receptive
    field, not a dense-scoring defect."""
    spec, params, state = new_picker("conv31", units=4, dims=3, seed=0)
    vol = rng.normal(0, 1, (40, 40, 40)).astype(np.float32)
    dense, _ = apply_picker(spec, params, vol[None], state=state,
                            dense=True, precision="highest")
    dense = np.asarray(dense)[0]
    assert dense.shape == vol.shape
    half = spec.width // 2
    for (z, y, x) in [(15, 20, 22), (18, 18, 18), (20, 24, 16)]:
        crop = vol[z - half : z + half + 1, y - half : y + half + 1,
                   x - half : x + half + 1]
        s, _ = apply_picker(spec, params, crop[None], state=state,
                            dense=False, precision="highest")
        np.testing.assert_allclose(
            float(np.asarray(s).reshape(-1)[0]), dense[z, y, x],
            rtol=1e-5, atol=1e-6)


def test_sav_reader_rejects_malicious_preamble(tmp_path, monkeypatch):
    """A crafted non-zip .sav whose legacy preamble pickle carries a
    GLOBAL+REDUCE payload must be refused by the restricted unpickler —
    never executed. (The legacy preamble pickles go through the same
    restricted unpickler as the main pickle; a plain pickle.load there
    would run the payload before the magic check.)"""
    import pickle
    import sys

    import pytest as _pytest

    from topaz_tpu.models.convert import load_sav

    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, (f"touch {marker}",))

    evil = tmp_path / "evil.sav"
    evil.write_bytes(pickle.dumps(Evil()) + b"\x00" * 64)

    # block torch so the trusted torch.load fallback (which mirrors the
    # reference's weights_only=False trust model) cannot run either
    for mod in [m for m in sys.modules if m == "torch"
                or m.startswith("torch.")]:
        monkeypatch.setitem(sys.modules, mod, None)

    with _pytest.raises(Exception):
        load_sav(str(evil))
    assert not marker.exists(), "malicious .sav preamble was EXECUTED"


def test_sav_export_roundtrip_torchfree(tmp_path, rng, monkeypatch):
    """Reverse interop: our picker checkpoints export as torch zip-format
    state-dict .sav WITHOUT torch (models/convert.write_sav), the export
    round-trips through our own torch-free reader, and when torch is
    present torch.load + the reference model read it with exact values
    and forward parity."""
    import sys

    from topaz_tpu.models.convert import (_state_dict_of, export_picker_sav,
                                          load_sav, picker_state_dict)

    spec, params, state = new_picker("resnet8", units=4, seed=3)
    ckpt = str(tmp_path / "fresh.npz")
    save_picker(ckpt, spec, params, state)
    expected = picker_state_dict(spec, params, state)

    # export with torch blocked
    sav = str(tmp_path / "export.sav")
    for mod in [m for m in sys.modules if m == "torch"
                or m.startswith("torch.")]:
        monkeypatch.setitem(sys.modules, mod, None)
    monkeypatch.setitem(sys.modules, "torch", None)
    export_picker_sav(sav, ckpt)
    back = _state_dict_of(load_sav(sav))
    assert set(back) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(expected[k]))
    monkeypatch.undo()

    # real torch reads the torch-free-written archive byte-exactly
    import torch

    sd = torch.load(sav, map_location="cpu", weights_only=True)
    assert set(sd) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(sd[k].numpy(), np.asarray(expected[k]))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sav_export_loads_into_reference_model(tmp_path, rng):
    """An exported pretrained picker .sav loads into the reference torch
    LinearClassifier via load_state_dict with forward parity."""
    import torch

    from topaz_tpu.models.convert import export_picker_sav

    sav = str(tmp_path / "resnet8_u32.sav")
    export_picker_sav(sav, "resnet8_u32")

    ref_factory = ref_module("topaz.model.factory")
    model = ref_factory.load_model("resnet8_u32")
    sd = torch.load(sav, map_location="cpu", weights_only=True)
    model.load_state_dict(sd)
    model.eval()

    spec, params, state = load_picker("resnet8_u32")
    x = rng.normal(size=(2, spec.width, spec.width)).astype(np.float32)
    with torch.no_grad():
        theirs = model(torch.from_numpy(x)[:, None]).numpy().ravel()
    ours, _ = apply_picker(spec, params, x, state=state, dense=False,
                           precision="highest")
    np.testing.assert_allclose(np.asarray(ours).ravel(), theirs,
                               rtol=1e-4, atol=1e-4)
