"""Picker training orchestration: data stats, pi calibration, epoch loop.

Workflow-layer equivalent of topaz/training.py with the reference's exact
stdout/stderr contract:
  * '# source split p_observed ...' data-stat lines from MRC headers only
    (training.py:279-295)
  * pi adjustment pi <- pi - p_observed for GE methods and automatic
    fallback to PN when pi <= p_observed (training.py:352-400)
  * TSV metric rows 'epoch iter split <method metrics> auprc'
    (training.py:571-603), per-epoch checkpoints

TPU-native internals: vectorized memmap crop sampling (train/data.py),
on-device augmentation + jitted train step (train/trainer.py), dense
whole-image evaluation, torch-free .npz checkpoints.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from topaz_tpu.io import coordinates as file_utils
from topaz_tpu.io.mrc import parse_header
from topaz_tpu.preprocess import calculate_pi, pixels_given_radius
from topaz_tpu.train.data import CropSampler, find_image_paths
from topaz_tpu.train.methods import make_loss_fn
from topaz_tpu.train.trainer import init_train_state, make_optimizer, make_train_step
from topaz_tpu.utils.printing import report


def group_paths_by_source(images_path: str, targets: pd.DataFrame,
                          image_ext: str = "") -> List[List[str]]:
    """Group image paths by 'source' (topaz/training.py:69-91)."""
    image_paths = find_image_paths(images_path, image_ext)
    if "source" not in image_paths.columns:
        if "source" not in targets.columns:
            image_paths["source"] = 0
            targets["source"] = 0
        else:
            targets_grouped = targets.groupby("image_name")["source"].first()
            image_paths["source"] = image_paths["image_name"].map(targets_grouped)
    return image_paths.groupby("source")["path"].apply(list).tolist()


def extract_image_stats(image_paths: List[List[str]], targets: pd.DataFrame,
                        mode: str = "train", radius: int = 3,
                        dims: int = 2) -> Tuple[int, int]:
    """Count positive/total regions from MRC headers only
    (training.py:251-276)."""
    num_positive_regions = 0
    total_regions = 0
    pixels_per_particle = pixels_given_radius(radius, dims)
    for source, source_paths in enumerate(image_paths):
        source_positive = 0
        source_total = 0
        for path in source_paths:
            with open(path, "rb") as f:
                header = parse_header(f.read(1024))
            source_total += int(header.nz) * int(header.ny) * int(header.nx)
            image_name = os.path.splitext(os.path.basename(path))[0]
            target = targets[targets["image_name"] == image_name]
            source_positive += len(target) * pixels_per_particle
        p_observed = source_positive / source_total
        report(f"{source}\t{mode}\t{p_observed:.5e}\t{source_positive}\t{source_total}")
        num_positive_regions += source_positive
        total_regions += source_total
    return num_positive_regions, total_regions


def report_data_stats(train_images_path: str, train_targets_path: str,
                      test_images_path: Optional[str] = None,
                      test_targets_path: Optional[str] = None,
                      radius: int = 3, dims: int = 2, image_ext: str = "",
                      format: str = "auto"):
    """Count positives/pixels/images from MRC headers only (training.py:279-295)."""
    report("source\tsplit\tp_observed\tnum_positive_regions\ttotal_regions")
    train_targets = file_utils.read_coordinates(train_targets_path,
                                                format=format)
    train_grouped = group_paths_by_source(train_images_path, train_targets,
                                          image_ext)
    num_train_images = sum(len(g) for g in train_grouped)
    num_positive, total = extract_image_stats(
        train_grouped, train_targets, mode="train", radius=radius, dims=dims)
    if test_images_path is not None and test_targets_path is not None:
        test_targets = file_utils.read_coordinates(test_targets_path,
                                                   format=format)
        test_grouped = group_paths_by_source(test_images_path, test_targets,
                                             image_ext)
        extract_image_stats(test_grouped, test_targets, mode="test",
                            radius=radius, dims=dims)
    return num_positive, total, num_train_images


def make_model_from_args(args):
    """Create or load the classifier, matching pretrained configurations
    (topaz/training.py:298-349)."""
    from topaz_tpu.models.factory import load_picker, new_picker

    report("Loading model:", args.model)
    if args.model.endswith(".sav") or args.model.endswith(".npz"):
        return load_picker(args.model)

    report(f"Model parameters: units={args.units}, dropout={args.dropout}, "
           f"bn={args.bn}")
    flag = None
    if args.pretrained:
        key = (args.model, args.units)
        flag = {("resnet8", 32): "resnet8_u32", ("resnet8", 64): "resnet8_u64",
                ("resnet16", 32): "resnet16_u32",
                ("resnet16", 64): "resnet16_u64"}.get(key)
    if flag is not None:
        try:
            report("Loading pretrained model:", flag)
            return load_picker(flag)
        except FileNotFoundError:
            report(f"WARNING: pretrained weights for {flag} unavailable; "
                   f"initializing randomly")
    return new_picker(args.model, units=args.units, bn=(args.bn == "on"),
                      dropout=args.dropout, pooling=args.pooling,
                      unit_scaling=args.unit_scaling, dims=args.dims,
                      seed=getattr(args, "seed", 0))


def adjust_method(method: str, pi: Optional[float], p_observed: float):
    """pi adjustment + PN fallback for GE methods (training.py:352-374)."""
    if pi is not None and pi <= p_observed and method in ("GE-KL", "GE-binomial"):
        print(f"WARNING: pi={pi} but the observed fraction of positives is "
              f"{p_observed} and method is set to {method}.", file=sys.stderr)
        print(f"WARNING: setting method to PN with pi={p_observed} instead.",
              file=sys.stderr)
        print(f"WARNING: if you meant to use {method}, please set pi > "
              f"{p_observed}.", file=sys.stderr)
        return "PN", p_observed
    if pi is not None and method in ("GE-KL", "GE-binomial"):
        return method, pi - p_observed
    return method, pi


from functools import lru_cache


@lru_cache(maxsize=8)
def _dense_scorer(spec, precision):
    """One jitted whole-image dense scorer per (spec, precision); params
    and state are traced arguments so per-epoch weights don't retrace."""
    import jax

    from topaz_tpu.models.picker import apply_picker

    @jax.jit
    def _score(params, model_state, x):
        y, _ = apply_picker(spec, params, x[None], state=model_state,
                            dense=True, precision=precision)
        return y[0]

    return _score


def evaluate_model(spec, params, model_state, test_paths: List[str],
                   test_targets: pd.DataFrame, radius: int = 3,
                   precision=None):
    """Dense whole-image evaluation (topaz/training.py:506-548): per-pixel
    BCE + AUPRC against rasterized target masks."""
    import jax.numpy as jnp

    from topaz_tpu.io.image import load_image
    from topaz_tpu.ops.masks import as_mask
    from topaz_tpu.ops.metrics import average_precision
    from topaz_tpu.train.methods import bce_with_logits

    # one compiled dense scorer per (spec, precision) for the whole run —
    # a fresh jit closure here would recompile the picker EVERY epoch
    _score = _dense_scorer(spec, precision)

    n = 0
    loss = 0.0
    scores = []
    y_true = []
    for path in test_paths:
        img = np.asarray(load_image(path), dtype=np.float32)
        name = os.path.splitext(os.path.basename(path))[0]
        t = test_targets[test_targets["image_name"] == name]
        z = (t["z_coord"].values
             if img.ndim == 3 and "z_coord" in t.columns else None)
        mask = as_mask(img.shape, radius, t["x_coord"].values,
                       t["y_coord"].values, z_coord=z)
        score = np.asarray(_score(params, model_state, jnp.asarray(img)))
        this_loss = float(np.mean(np.asarray(
            bce_with_logits(jnp.asarray(score.ravel()), jnp.asarray(mask.ravel()))
        )))
        n += 1
        loss += (this_loss - loss) / n
        scores.append(score.ravel())
        y_true.append(mask.ravel())

    scores = np.concatenate(scores)
    y_true = np.concatenate(y_true)
    y_hat = 1.0 / (1.0 + np.exp(-scores))
    precision_v = y_hat[y_true == 1].sum() / y_hat.sum()
    tpr = y_hat[y_true == 1].mean()
    fpr = y_hat[y_true == 0].mean()
    auprc = average_precision(y_true, scores)
    return loss, precision_v, tpr, fpr, auprc


def train_model(args, output=None):
    """End-to-end training (topaz/training.py:606-647 + fit_epochs)."""
    from topaz_tpu.models.factory import save_picker

    output = output or sys.stdout

    spec, params, model_state = make_model_from_args(args)
    report("Receptive field:", spec.width)

    num_positive, total_regions, num_images = report_data_stats(
        args.train_images, args.train_targets, args.test_images,
        args.test_targets, radius=args.radius, dims=args.dims,
        image_ext=args.image_ext, format=args.format_)

    if args.num_particles > 0:
        expected = args.num_particles * num_images
        pi = calculate_pi(expected, args.radius, total_regions, args.dims)
        report(f"Specified expected number of particle per micrograph = "
               f"{args.num_particles}")
        report(f"With radius = {args.radius}")
        report(f"Setting pi = {pi}")
    else:
        pi = args.pi
        report(f"pi = {pi}")
    if pi is None and args.method in ("GE-KL", "GE-binomial", "PU"):
        # the reference dies later with an opaque NoneType TypeError
        # (topaz/training.py:632); fail fast with the flag contract instead
        raise ValueError(
            f"method {args.method} requires pi: set --pi or give the "
            f"expected particles per micrograph with -n/--num-particles")

    p_observed = num_positive / total_regions
    method, pi_adj = adjust_method(args.method, pi, p_observed)
    loss_fn, header, split = make_loss_fn(
        method, pi_adj, slack=args.slack,
        entropy_penalty=getattr(args, "entropy_penalty", 0.0),
        momentum=getattr(args, "ge_momentum", 1.0),
        beta=getattr(args, "pu_beta", 0.0))

    est_max_prec = p_observed / pi if pi else 1.0
    report("Estimated max precision given pi and p_observed:", est_max_prec)
    report("If your adjusted precision is greater than 1.0 (especially on a "
           "test split), you have likely set pi too high.")
    report(f"minibatch_size={args.minibatch_size}, epoch_size={args.epoch_size}, "
           f"num_epochs={args.num_epochs}")

    # data
    train_targets = file_utils.read_coordinates(args.train_targets,
                                                format=args.format_)
    train_grouped = group_paths_by_source(args.train_images, train_targets,
                                          args.image_ext)
    train_paths = [p for group in train_grouped for p in group]
    # multi-host: offset the sampler seed per process so each host samples
    # distinct crops (identical seeds would duplicate the global batch)
    seed = getattr(args, "seed", 0)
    if getattr(args, "device", 0) == -2:
        from topaz_tpu.parallel.devices import maybe_distributed_init

        if maybe_distributed_init():
            import jax

            seed += 1000003 * jax.process_index()
    sampler = CropSampler(train_paths, train_targets, spec.width,
                          radius=args.radius, split=split,
                          rotate=(args.dims == 2
                                  or getattr(args, "augment3d", False)),
                          seed=seed, dims=args.dims)
    report(f"Loaded {sampler.num_images} training micrographs with "
           f"~{int(sampler.num_pixels // sampler.mask_size)} labeled particles")

    test_paths = None
    test_targets = None
    if args.test_images is not None and args.test_targets is not None:
        test_targets = file_utils.read_coordinates(args.test_targets,
                                                   format=args.format_)
        test_df = find_image_paths(args.test_images, args.image_ext)
        test_paths = test_df["path"].tolist()
        report(f"Loaded {len(test_paths)} testing micrographs with "
               f"{len(test_targets)} labeled particles")

    balance = (num_positive / total_regions) if args.natural else args.minibatch_balance

    # optional autoencoder regularizer (topaz/training.py:339-345)
    gen_width = 0
    if args.autoencoder > 0:
        import jax

        from topaz_tpu.models.generative import generator_width, init_generator

        depth = int(np.log2(spec.width + 1) - 3)
        gen_params, _ = init_generator(spec.latent_dim,
                                       jax.random.PRNGKey(getattr(args, "seed", 0) + 1),
                                       units=args.ngf, depth=depth)
        params = {**params, "generative": gen_params}
        gen_width = generator_width(depth)
        header = header[:1] + ["recon_error"] + header[1:] \
            if "ge_penalty" not in header else \
            header[:2] + ["recon_error"] + header[2:]
        report(f"Generator: units={args.ngf}, size={gen_width}")

    # -d -2: data-parallel over the device mesh (grad psum inserted by XLA);
    # -d N pins single-device training to that chip
    mesh = None
    dev_flag = getattr(args, "device", 0)
    if dev_flag == -2:
        from topaz_tpu.parallel.devices import data_mesh_for, resolve_devices

        mesh = data_mesh_for(resolve_devices(-2), args.minibatch_size,
                             warn=True)
        if mesh is not None:
            report(f"Data-parallel training over {mesh.shape['data']} devices")
    elif dev_flag >= 0:
        from topaz_tpu.parallel.devices import resolve_devices

        resolve_devices(dev_flag)

    optimizer = make_optimizer(args.learning_rate, "adam")
    step_fn = make_train_step(spec, loss_fn, optimizer, l2=args.l2,
                              autoencoder=args.autoencoder,
                              generator_width=gen_width, mesh=mesh)
    state = init_train_state(spec, params, model_state, optimizer, pi_adj,
                             seed=getattr(args, "seed", 0))

    # epoch loop with the reference's TSV contract (training.py:571-603).
    # Host sampling runs in a prefetch thread and metric rows print a few
    # steps behind dispatch, so the device never idles on the host.
    import copy

    import jax.numpy as jnp

    from topaz_tpu.train.trainer import load_train_state, save_train_state
    from topaz_tpu.utils.batching import iterate_prefetched

    # --resume: restore the FULL training state (optimizer/method/rng +
    # host sampler stream) and continue bit-exactly, mid-epoch included.
    # Extension over the reference, whose resume is weights-only
    # (topaz/training.py:301-304).
    start_epoch, start_step, it = 1, 0, 1
    resume_path = getattr(args, "resume", None)
    if resume_path:
        state, rmeta = load_train_state(resume_path, state)
        it = rmeta["iter"]
        start_epoch = rmeta["epoch"]
        start_step = rmeta["steps_in_epoch"]
        if start_step >= args.epoch_size or start_step == 0:
            start_epoch += 1
            start_step = 0
        if rmeta.get("sampler_rng"):
            sampler.rng.bit_generator.state = rmeta["sampler_rng"]
        report(f"Resuming at epoch {start_epoch}"
               + (f" step {start_step + 1}" if start_step else "")
               + f" (iter {it})")

    save_steps = int(getattr(args, "save_interval_steps", 0) or 0)
    state_path = (args.save_prefix + "_train_state.npz"
                  if args.save_prefix is not None else None)

    print("\t".join(["epoch", "iter", "split"] + header + ["auprc"]),
          file=output, flush=True)
    prec_idx = header.index("precision")
    plain_cols = [h for h in header if h != "adjusted_precision"]

    def _print_row(epoch, it, packed):
        # one host fetch for the whole row (each scalar fetch is a full
        # link round-trip; at 3 ms/step the RTT would otherwise dominate)
        row = [float(v) for v in np.asarray(packed)]
        row.insert(prec_idx + 1, row[prec_idx] / est_max_prec)
        print(f"{epoch}\t{it}\ttrain\t" + "\t".join(str(v) for v in row)
              + "\t-", file=output, flush=True)

    def _save_state(epoch, steps_in_epoch, rng_state):
        if state_path is None:
            return
        os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
        save_train_state(state_path, _to_numpy(state), epoch, it,
                         steps_in_epoch, sampler_rng_state=rng_state)

    for epoch in range(start_epoch, args.num_epochs + 1):
        n_steps = args.epoch_size - (start_step if epoch == start_epoch else 0)

        def _producer(n=n_steps):
            # the sampler rng state is captured AFTER each draw so a
            # mid-epoch checkpoint resumes on exactly the next batch the
            # uninterrupted run would have drawn (prefetched-but-unconsumed
            # batches are not skipped).
            # Batch composition is per-item Bernoulli like the reference
            # (positive_balance, utils/data/memory_mapped_data.py:210-216):
            # the positive count is Binomial(B, balance) per batch, drawn
            # from the sampler's own stream so resume stays bit-exact.
            for _ in range(n):
                n_pos = (int(sampler.rng.binomial(args.minibatch_size,
                                                  balance))
                         if balance else 0)
                batch = sampler.sample_batch(args.minibatch_size, n_pos)
                yield batch, copy.deepcopy(sampler.rng.bit_generator.state)

        # metric rows print a few steps behind dispatch: the device runs
        # ahead of the host by up to `depth` steps, hiding the host->device
        # round-trip behind real compute (the step itself is ~3 ms on v5e)
        from collections import deque

        depth = int(os.environ.get("TOPAZ_METRIC_LAG", "8"))
        pending: deque = deque()
        step_in_epoch = start_step if epoch == start_epoch else 0
        rng_state = None
        for (crops, labels), rng_state in iterate_prefetched(_producer,
                                                             maxsize=4):
            state, metrics = step_fn(state, crops, labels)
            pending.append((epoch, it,
                            jnp.stack([metrics[h] for h in plain_cols])))
            if len(pending) > depth:
                _print_row(*pending.popleft())
            it += 1
            step_in_epoch += 1
            if save_steps and step_in_epoch % save_steps == 0 \
                    and step_in_epoch < args.epoch_size:
                _save_state(epoch, step_in_epoch, rng_state)
        while pending:
            _print_row(*pending.popleft())

        if test_paths:
            loss, prec, tpr, fpr, auprc = evaluate_model(
                spec, state.params, state.model_state, test_paths,
                test_targets, radius=args.radius)
            adjusted = prec / est_max_prec
            dashes = "\t".join(["-"] * (len(header) - 5))
            dashes = "\t" + dashes + "\t" if dashes else "\t"
            print(f"{epoch}\t{it}\ttest\t{loss}{dashes}{prec}\t{adjusted}\t"
                  f"{tpr}\t{fpr}\t{auprc}", file=output, flush=True)

        if args.save_prefix is not None:
            digits = int(np.ceil(np.log10(max(args.num_epochs, 2))))
            path = args.save_prefix + f"_epoch{epoch:0{digits}}.npz"
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            save_picker(path, spec, _to_numpy(state.params),
                        _to_numpy(state.model_state))
            _save_state(epoch, 0, rng_state)

    return spec, state


def _to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def train_from_args(args) -> None:
    """CLI entry (topaz/commands/train.py main contract)."""
    if args.describe:
        spec, _, _ = make_model_from_args(args)
        print(spec)
        sys.exit()

    if args.k_fold > 1 and args.test_images is None:
        _apply_kfold_split(args)

    if args.output is not None:
        out_dir = os.path.dirname(args.output)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
    output = sys.stdout if args.output is None else open(args.output, "w")
    report("Training...")
    try:
        result = train_model(args, output=output)
    finally:
        if args.output is not None:
            output.close()
    report("Done!")
    return result


def _apply_kfold_split(args) -> None:
    """Split training micrographs into train/test folds
    (topaz/training.py:191-223 adapted to the path-based pipeline)."""
    import tempfile

    from topaz_tpu.train.partition import kfold

    targets = file_utils.read_coordinates(args.train_targets,
                                          format=args.format_)
    grouped = group_paths_by_source(args.train_images, targets,
                                    args.image_ext)
    rows = []
    for source, paths in enumerate(grouped):
        for path in paths:
            name = os.path.splitext(os.path.basename(path))[0]
            count = int((targets["image_name"] == name).sum())
            rows.append({"source": source, "image_name": name, "path": path,
                         "count": count})
    table = pd.DataFrame(rows)
    random = np.random.RandomState(args.cross_validation_seed)
    partitions = list(kfold(args.k_fold, table, random=random))
    train_table, test_table = partitions[args.fold]
    report(f"Split into {len(train_table)} train and {len(test_table)} test "
           f"micrographs")

    tmpdir = tempfile.mkdtemp(prefix="topaz_kfold_")

    def write_split(table, tag):
        img_list = os.path.join(tmpdir, f"images_{tag}.txt")
        table[["image_name", "path"]].to_csv(img_list, sep="\t", index=False)
        tgt = targets[targets["image_name"].isin(set(table["image_name"]))]
        tgt_list = os.path.join(tmpdir, f"targets_{tag}.txt")
        tgt.to_csv(tgt_list, sep="\t", index=False)
        return img_list, tgt_list

    args.train_images, args.train_targets = write_split(train_table, "train")
    args.test_images, args.test_targets = write_split(test_table, "test")
