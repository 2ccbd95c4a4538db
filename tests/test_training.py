import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

from reference_oracle import ref_module, reference_available


def _scores_labels(rng, n=64, n_pos=8):
    scores = rng.normal(0, 2, n).astype(np.float32)
    # our convention: first n_pos are positive
    labels = np.zeros(n, dtype=np.float32)
    labels[:n_pos] = 1
    return scores, labels


class _FixedModel:
    """Callable standing in for a torch module that emits fixed scores."""

    def __init__(self, scores):
        import torch

        self.scores = torch.tensor(scores, requires_grad=True)

    def __call__(self, X):
        return self.scores


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("method,pi", [("PN", 0.02), ("GE-binomial", 0.01),
                                       ("GE-KL", 0.01), ("PU", 0.02)])
def test_loss_parity_with_reference(rng, method, pi):
    """Our pure loss functions reproduce the reference trainer losses for
    identical scores."""
    import torch

    ref_methods = ref_module("topaz.methods")
    from topaz_tpu.train.methods import make_loss_fn, init_method_state

    scores, labels = _scores_labels(rng)
    n_pos = int(labels.sum())

    model = _FixedModel(scores)
    optim = torch.optim.SGD([model.scores], lr=0.0)
    criteria = torch.nn.BCEWithLogitsLoss()
    X = torch.zeros(len(scores))
    Y = torch.tensor(labels)

    if method == "PN":
        trainer = ref_methods.PN(model, optim, criteria, pi=pi)
        ref_out = trainer.step(X, Y)
        ref_loss, ref_prec, ref_tpr, ref_fpr = ref_out
        ref_metrics = {"loss": ref_loss, "precision": ref_prec,
                       "tpr": ref_tpr, "fpr": ref_fpr}
    elif method == "GE-binomial":
        trainer = ref_methods.GE_binomial(model, optim, criteria, pi, slack=1.0)
        loss, ge, prec, tpr, fpr = trainer.step(X, Y)
        ref_metrics = {"loss": loss, "ge_penalty": ge, "precision": prec,
                       "tpr": tpr, "fpr": fpr}
    elif method == "GE-KL":
        trainer = ref_methods.GE_KL(model, optim, criteria, pi, slack=10.0)
        loss, ge, prec, tpr, fpr = trainer.step(X, Y)
        ref_metrics = {"loss": loss, "ge_penalty": ge, "precision": prec,
                       "tpr": tpr, "fpr": fpr}
    else:
        trainer = ref_methods.PU(model, optim, criteria, pi)
        loss, prec, tpr, fpr = trainer.step(X, Y)
        ref_metrics = {"loss": loss, "precision": prec, "tpr": tpr, "fpr": fpr}

    import jax.numpy as jnp

    loss_fn, header, split = make_loss_fn(method, pi)
    _, _, metrics = loss_fn(jnp.asarray(scores), n_pos, init_method_state(pi))
    for k, v in ref_metrics.items():
        assert np.isclose(float(metrics[k]), v, rtol=2e-4, atol=2e-5), (
            k, float(metrics[k]), v)

    # the same batch with positives SHUFFLED through it and labels passed
    # as a vector (the reference's Y semantics, and what training now
    # feeds per Bernoulli-composed batch) gives the identical loss
    perm = rng.permutation(len(scores))
    _, _, m_shuf = loss_fn(jnp.asarray(scores[perm]),
                           jnp.asarray(labels[perm]), init_method_state(pi))
    for k, v in ref_metrics.items():
        assert np.isclose(float(m_shuf[k]), v, rtol=2e-4, atol=2e-5), (
            "shuffled-labels", k, float(m_shuf[k]), v)


def test_adjust_method_fallback():
    from topaz_tpu.training import adjust_method

    # pi <= p_observed -> PN fallback with pi = p_observed
    m, pi = adjust_method("GE-binomial", 0.01, 0.02)
    assert m == "PN" and pi == 0.02
    # GE methods subtract p_observed
    m, pi = adjust_method("GE-binomial", 0.05, 0.02)
    assert m == "GE-binomial" and np.isclose(pi, 0.03)
    # PN/PU untouched
    m, pi = adjust_method("PU", 0.05, 0.02)
    assert m == "PU" and pi == 0.05


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_pixels_given_radius_reference_exact():
    """pi/p_observed bookkeeping must be reference-EXACT, including the
    reference's 2D over-count (topaz/stats.py:17-25 sums the disk mask
    over a 3D meshgrid even for dims=2, giving (2r+1)x the disk area —
    r=3: 203, not 29). The factor feeds pi, the GE prior, and the PN
    fallback weighting; the true-area count trains with a 7x smaller
    positive weight and measurably lower AP (PARITY.md round-4 table)."""
    from topaz_tpu.preprocess import calculate_pi, pixels_given_radius

    ref_stats = ref_module("topaz.stats")
    for r in (1, 2, 3, 5, 7, 14):
        for d in (2, 3):
            assert pixels_given_radius(r, d) == ref_stats.pixels_given_radius(r, d)
            assert np.isclose(
                calculate_pi(20.0, r, 2**19, d),
                ref_stats.calculate_pi(20.0, r, 2**19, d))
    assert pixels_given_radius(3, 2) == 203  # not the true disk area (29)


def _make_synthetic_dataset(tmp_path, rng, n_images=2, size=160, n_particles=6):
    from topaz_tpu.io import mrc

    img_dir = tmp_path / "micrographs"
    img_dir.mkdir()
    rows = []
    for i in range(n_images):
        x = rng.normal(0, 1, (size, size)).astype(np.float32)
        for _ in range(n_particles):
            cy, cx = rng.integers(20, size - 20), rng.integers(20, size - 20)
            yy, xx = np.mgrid[0:size, 0:size]
            x -= 2.5 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 4.0**2)).astype(np.float32)
            rows.append({"image_name": f"img{i}", "x_coord": cx, "y_coord": cy})
        mrc.write(str(img_dir / f"img{i}.mrc"), x)
    targets = tmp_path / "particles.txt"
    pd.DataFrame(rows).to_csv(targets, sep="\t", index=False)
    return str(img_dir), str(targets)


def test_crop_sampler(tmp_path, rng):
    from topaz_tpu.train.data import CropSampler
    import glob

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng)
    targets = pd.read_csv(targets_path, sep="\t")
    paths = sorted(glob.glob(os.path.join(img_dir, "*.mrc")))
    sampler = CropSampler(paths, targets, crop_size=71, radius=3, split="pn")
    assert sampler.mask_size == 29  # pixels within radius 3
    crops, labels = sampler.sample_batch(16, 4)
    # 2D path returns final augmented crops (fused rotate+flip+crop)
    assert crops.shape == (16, 71, 71)
    assert labels[:4].sum() == 4 and labels[4:].sum() == 0
    assert np.isfinite(crops).all()

    # rotation preserves the center pixel: positives' centers must equal the
    # image value at their sampled coordinate
    sampler2 = CropSampler(paths, targets, crop_size=71, radius=0, split="pn",
                           seed=3)
    crops2, _ = sampler2.sample_batch(8, 8)
    from topaz_tpu.io import mrc

    imgs = {i: mrc.read(p)[0] for i, p in enumerate(paths)}
    centers = crops2[:, 35, 35]
    all_pixels = np.concatenate([im.ravel() for im in imgs.values()])
    for v in centers:
        assert np.isclose(all_pixels, v).any()

    # non-augmented (rotate=False) path returns raw windows
    sampler3 = CropSampler(paths, targets, crop_size=71, radius=3,
                           split="pn", rotate=False)
    crops3, _ = sampler3.sample_batch(4, 1)
    assert crops3.shape == (4, 71, 71)


def test_end_to_end_training(tmp_path, rng, capsys):
    """Tiny GE-binomial training run: TSV contract, finite losses,
    checkpoint loadable, eval runs."""
    from topaz_tpu.training import train_from_args

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng)

    args = types.SimpleNamespace(
        describe=False, device=0, num_workers=0, num_threads=0,
        train_images=img_dir, train_targets=targets_path,
        test_images=img_dir, test_targets=targets_path,
        format_="auto", image_ext="",
        k_fold=0, fold=0, cross_validation_seed=42,
        num_particles=20, pi=None, radius=3, method="GE-binomial",
        slack=-1, autoencoder=0, l2=0.0, learning_rate=2e-4,
        natural=False, minibatch_size=16, minibatch_balance=0.25,
        epoch_size=3, num_epochs=2,
        pretrained=False, model="resnet8", units=4, dropout=0.0, bn="off",
        pooling=None, unit_scaling=2, ngf=32, patch_size=96, patch_padding=48,
        save_prefix=str(tmp_path / "model"), output=str(tmp_path / "log.tsv"),
        test_batch_size=1, seed=0, dims=2,
    )
    train_from_args(args)

    log = pd.read_csv(tmp_path / "log.tsv", sep="\t")
    assert list(log.columns) == ["epoch", "iter", "split", "loss",
                                 "ge_penalty", "precision",
                                 "adjusted_precision", "tpr", "fpr", "auprc"]
    train_rows = log[log.split == "train"]
    assert len(train_rows) == 6
    assert np.isfinite(train_rows.loss.astype(float)).all()
    test_rows = log[log.split == "test"]
    assert len(test_rows) == 2
    assert np.isfinite(test_rows.auprc.astype(float)).all()

    # checkpoints exist and round-trip through the factory
    from topaz_tpu.models.factory import load_picker

    ckpt = str(tmp_path / "model_epoch2.npz")
    assert os.path.exists(ckpt)
    spec, params, state = load_picker(ckpt)
    assert spec.arch == "resnet8"
    assert spec.width == 71


def test_kfold_split_training(tmp_path, rng):
    """train -k 5 --fold 0 splits micrographs and evaluates the heldout fold."""
    import types

    from topaz_tpu.training import train_from_args

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng, n_images=5)
    args = types.SimpleNamespace(
        describe=False, device=0, num_workers=0, num_threads=0,
        train_images=img_dir, train_targets=targets_path,
        test_images=None, test_targets=None,
        format_="auto", image_ext="",
        k_fold=5, fold=0, cross_validation_seed=42,
        num_particles=20, pi=None, radius=3, method="PN",
        slack=-1, autoencoder=0, l2=0.0, learning_rate=2e-4,
        natural=False, minibatch_size=8, minibatch_balance=0.25,
        epoch_size=2, num_epochs=1,
        pretrained=False, model="resnet8", units=4, dropout=0.0, bn="off",
        pooling=None, unit_scaling=2, ngf=32, patch_size=96, patch_padding=48,
        save_prefix=None, output=str(tmp_path / "log.tsv"),
        test_batch_size=1, seed=0, dims=2,
    )
    train_from_args(args)
    import pandas as pd

    log = pd.read_csv(tmp_path / "log.tsv", sep="\t")
    # heldout-fold evaluation rows present
    assert (log.split == "test").sum() == 1
    assert np.isfinite(log[log.split == "test"].auprc.astype(float)).all()


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_hyperparameter_flags_parity(rng):
    """The newly surfaced hyperparameters (--entropy-penalty, --ge-momentum,
    --pu-beta) reproduce the reference trainers at non-default values."""
    import torch

    ref_methods = ref_module("topaz.methods")
    import jax.numpy as jnp

    from topaz_tpu.train.methods import init_method_state, make_loss_fn

    scores, labels = _scores_labels(rng)
    n_pos = int(labels.sum())
    X = torch.zeros(len(scores))
    Y = torch.tensor(labels)

    # GE-binomial with entropy penalty
    model = _FixedModel(scores)
    optim = torch.optim.SGD([model.scores], lr=0.0)
    criteria = torch.nn.BCEWithLogitsLoss()
    trainer = ref_methods.GE_binomial(model, optim, criteria, 0.01,
                                      slack=1.0, entropy_penalty=0.1)
    loss, ge, *_ = trainer.step(X, Y)
    loss_fn, _, _ = make_loss_fn("GE-binomial", 0.01, entropy_penalty=0.1)
    _, _, m = loss_fn(jnp.asarray(scores), n_pos, init_method_state(0.01))
    assert np.isclose(float(m["ge_penalty"]), ge, rtol=2e-4, atol=2e-5)

    # GE-KL with running-expectation momentum: two steps so the running
    # average matters
    model = _FixedModel(scores)
    optim = torch.optim.SGD([model.scores], lr=0.0)
    trainer = ref_methods.GE_KL(model, optim, criteria, 0.01, slack=10.0,
                                momentum=0.5)
    trainer.step(X, Y)
    loss2, ge2, *_ = trainer.step(X, Y)
    loss_fn, _, _ = make_loss_fn("GE-KL", 0.01, momentum=0.5)
    st = init_method_state(0.01)
    _, st, _ = loss_fn(jnp.asarray(scores), n_pos, st)
    _, _, m2 = loss_fn(jnp.asarray(scores), n_pos, st)
    assert np.isclose(float(m2["ge_penalty"]), ge2, rtol=2e-4, atol=2e-5)

    # PU with beta clipping engaged
    model = _FixedModel(scores)
    optim = torch.optim.SGD([model.scores], lr=0.0)
    trainer = ref_methods.PU(model, optim, criteria, 0.02, beta=0.5)
    loss_pu, *_ = trainer.step(X, Y)
    loss_fn, _, _ = make_loss_fn("PU", 0.02, beta=0.5)
    _, _, m3 = loss_fn(jnp.asarray(scores), n_pos, init_method_state(0.02))
    assert np.isclose(float(m3["loss"]), loss_pu, rtol=2e-4, atol=2e-5)

    # CLI parses the new flags with reference defaults
    from topaz_tpu.cli.commands import train as train_cmd

    args = train_cmd.add_arguments().parse_args(
        ["--train-images", "x", "--train-targets", "y"])
    assert args.entropy_penalty == 0.0
    assert args.ge_momentum == 1.0
    assert args.pu_beta == 0.0


def test_train_requires_pi_for_ge_methods(tmp_path, rng):
    """GE/PU methods without --pi or -n fail fast with the flag contract
    (the reference dies later with an opaque NoneType TypeError)."""
    import pytest

    from topaz_tpu.cli.commands.train import add_arguments
    from topaz_tpu.io import mrc
    from topaz_tpu.training import train_model

    img = rng.normal(0, 1, (128, 128)).astype(np.float32)
    mrc.write(str(tmp_path / "m0.mrc"), img)
    (tmp_path / "targets.txt").write_text(
        "image_name\tx_coord\ty_coord\nm0\t30\t40\n")
    args = add_arguments().parse_args([
        "--train-images", str(tmp_path),
        "--train-targets", str(tmp_path / "targets.txt"),
        "--num-epochs", "1", "--epoch-size", "2",
        "-o", str(tmp_path / "out.txt"),
    ])
    assert args.pi is None and args.num_particles <= 0
    with pytest.raises(ValueError, match="requires pi"):
        train_model(args)


def test_crop_sampler_packed_keys_consistent():
    """The packed positive-pixel probe uses the same int64 wraparound as
    the key array, so membership matches even for coordinates beyond the
    packed field widths (regression: Python ints never matched wrapped
    numpy keys for image index >= 2^15, letting 'negatives' land on
    labeled positives)."""
    import numpy as np

    from topaz_tpu.train.data import CropSampler

    # beyond-limit values: image index 40000 >= 2^15, y 200000 >= 2^17
    for k, z, y, x in [(40000, 0, 5, 7), (3, 0, 200000, 9),
                       (1, 0, 2, 3)]:
        probe = CropSampler._pack(k, z, y, x)
        arr = (np.int64(k) << 48) | (np.int64(z) << 34) \
            | (np.int64(y) << 17) | np.int64(x)
        assert np.int64(probe) == arr


def test_train_from_list_with_space_paths(tmp_path, rng):
    """Image-list files are read as TSV first, so paths containing spaces
    train fine (documented divergence: the reference whitespace-splits,
    topaz/training.py:69-91, and breaks on such paths). Bare
    whitespace-separated lists still parse via the fallback."""
    import shutil

    from topaz_tpu.train.data import find_image_paths
    from topaz_tpu.training import train_from_args

    img_dir, targets_path = _make_synthetic_dataset(tmp_path, rng)
    spaced = tmp_path / "my micrographs dir"
    shutil.move(img_dir, spaced)
    paths = sorted(str(p) for p in spaced.glob("*.mrc"))
    assert all(" " in p for p in paths)

    list_file = tmp_path / "images.txt"
    pd.DataFrame({
        "image_name": [os.path.splitext(os.path.basename(p))[0]
                       for p in paths],
        "path": paths,
    }).to_csv(list_file, sep="\t", index=False)

    got = find_image_paths(str(list_file))
    assert list(got["path"]) == paths

    # bare whitespace-separated list (no spaces in paths) still works
    bare = tmp_path / "bare.txt"
    bare.write_text("image_name   path\na   /tmp/a.mrc\nb   /tmp/b.mrc\n")
    got_bare = find_image_paths(str(bare))
    assert list(got_bare["path"]) == ["/tmp/a.mrc", "/tmp/b.mrc"]

    # tab-separated header over space-separated rows: the tab parse
    # "succeeds" but yields path=NaN on every row — must fall back
    mixed = tmp_path / "mixed.txt"
    mixed.write_text("image_name\tpath\na /tmp/a.mrc\nb /tmp/b.mrc\n")
    got_mixed = find_image_paths(str(mixed))
    assert list(got_mixed["path"]) == ["/tmp/a.mrc", "/tmp/b.mrc"]

    # a stray tab making the tab parse ragged (ParserError) — must fall
    # back to whitespace, which parses every row to 2 fields
    ragged = tmp_path / "ragged.txt"
    ragged.write_text("image_name path\na /tmp/a.mrc\nb\t/tmp/b.mrc\n")
    got_ragged = find_image_paths(str(ragged))
    assert list(got_ragged["path"]) == ["/tmp/a.mrc", "/tmp/b.mrc"]

    args = types.SimpleNamespace(
        describe=False, device=0, num_workers=0, num_threads=0,
        train_images=str(list_file), train_targets=targets_path,
        test_images=None, test_targets=None,
        format_="auto", image_ext="",
        k_fold=0, fold=0, cross_validation_seed=42,
        num_particles=20, pi=None, radius=3, method="PN",
        slack=-1, autoencoder=0, l2=0.0, learning_rate=2e-4,
        natural=False, minibatch_size=16, minibatch_balance=0.25,
        epoch_size=2, num_epochs=1,
        pretrained=False, model="conv31", units=4, dropout=0.0, bn="off",
        pooling=None, unit_scaling=2, ngf=32, patch_size=96, patch_padding=48,
        save_prefix=str(tmp_path / "spmodel"),
        output=str(tmp_path / "splog.tsv"),
        test_batch_size=1, seed=0, dims=2,
    )
    train_from_args(args)
    log = pd.read_csv(tmp_path / "splog.tsv", sep="\t")
    assert np.isfinite(
        log[log.split == "train"].loss.astype(float)).all()
