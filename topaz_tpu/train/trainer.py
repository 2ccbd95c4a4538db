"""Jitted training step: augment -> strided forward -> PU objective ->
optax update, optionally sharded over a device mesh.

Replaces the reference's eager per-step torch loop (methods.py .step(),
training.py:551-568). The whole step — including augmentation and the
L2 penalty — is one compiled program; data parallelism is jax.sharding
over the batch axis (XLA inserts the gradient reductions), not
DataParallel or process pools.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from topaz_tpu.models.picker import PickerSpec, apply_picker
from topaz_tpu.train.augment import augment_crops, augment_crops_3d
from topaz_tpu.train.methods import MethodState, init_method_state


class TrainState(NamedTuple):
    params: Dict
    model_state: Dict
    opt_state: optax.OptState
    method_state: MethodState
    rng: jax.Array


def make_optimizer(lr: float, optim: str = "adam", momentum: float = 0.0) -> optax.GradientTransformation:
    """optax optimizer by name (adam/adagrad/rmsprop/sgd), reference defaults."""
    if optim == "adam":
        return optax.adam(lr)
    if optim == "adagrad":
        return optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
    if optim == "sgd":
        return optax.sgd(lr, momentum=momentum or None)
    if optim == "rmsprop":
        return optax.rmsprop(lr)
    raise ValueError(f"unknown optimizer: {optim}")


def _l2_penalty(params: Dict, l2: float) -> jnp.ndarray:
    # the reference penalizes features + classifier only, never the
    # generative decoder (topaz/methods.py:63-67)
    leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in params.items() if k != "generative"}
    )
    return 0.5 * l2 * sum(jnp.sum(w.astype(jnp.float32) ** 2) for w in leaves)


def make_train_step(
    spec: PickerSpec,
    loss_fn,
    optimizer: optax.GradientTransformation,
    l2: float = 0.0,
    mesh: Optional[jax.sharding.Mesh] = None,
    precision=None,
    autoencoder: float = 0.0,
    generator_width: int = 0,
):
    """Build the jitted train step.

    The step takes raw over-sized crops (B, S, S) plus their labels (B,);
    augmentation (rotation / flips / center crop to the receptive field)
    runs on device. Labels travel with the crops, so batch composition may
    vary per batch (the reference's per-item Bernoulli ``positive_balance``,
    utils/data/memory_mapped_data.py:210-216) and multi-host shards need no
    reordering — each process's labels shard alongside its crops.
    When ``mesh`` is given, the batch is sharded over its 'data' axis.
    With ``autoencoder > 0`` the params tree carries a 'generative' decoder
    and the loss adds the weighted reconstruction error
    (topaz/methods.py:11-23).
    """
    crop = spec.width
    # augmentation engages when the sampler delivered sqrt(2)-oversized
    # windows (train/data.py raw_size); a merely parity-padded window
    # (crop+1 for even crops, rotate=False samplers) is center-cropped
    # without rotating — the decision is static at trace time
    rotate_threshold = int(np.ceil(crop * np.sqrt(2)))

    def loss_and_metrics(params, model_state, crops, labels, rng,
                         method_state):
        k_aug, k_drop = jax.random.split(rng)
        if crops.shape[1:] == (crop,) * spec.dims:
            # sampler delivered final-size crops (2D fused native path, or
            # unaugmented windows already at the receptive field)
            x = crops
        elif spec.dims == 3:
            aug = crops.shape[-1] >= rotate_threshold
            x = augment_crops_3d(crops, k_aug, crop, rotate=aug, flip=aug)
        else:
            aug = crops.shape[-1] >= rotate_threshold
            x = augment_crops(crops, k_aug, crop, rotate=aug, flip=aug)
        score, latent, new_model_state = apply_picker(
            spec, params, x, state=model_state, dense=False, train=True,
            dropout_rng=k_drop, precision=precision, return_latent=True,
        )
        score = score.reshape(-1)
        loss, new_method_state, metrics = loss_fn(score, labels,
                                                  method_state)
        if autoencoder > 0:
            from topaz_tpu.models.generative import apply_generator

            recon = apply_generator(params["generative"],
                                    latent.reshape(latent.shape[0], -1),
                                    train=True, precision=precision)[..., 0]
            pad = (crop - generator_width) // 2
            target = x[:, pad : pad + generator_width,
                       pad : pad + generator_width]
            recon_error = jnp.mean(
                jnp.sum((target - recon).reshape(x.shape[0], -1) ** 2, axis=1)
            )
            loss = loss + recon_error * autoencoder
            metrics = {**metrics, "recon_error": recon_error}
        if l2 > 0:
            loss = loss + _l2_penalty(params, l2)
        return loss, (new_model_state, new_method_state, metrics)

    def step(state: TrainState, crops: jnp.ndarray,
             labels: jnp.ndarray) -> Tuple[TrainState, Dict]:
        rng, sub = jax.random.split(state.rng)
        grads, (model_state, method_state, metrics) = jax.grad(
            loss_and_metrics, has_aux=True
        )(state.params, state.model_state, crops, labels, sub,
          state.method_state)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, model_state, opt_state, method_state, rng), metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())

        def sharded_step(state, crops, labels):
            crops = jax.lax.with_sharding_constraint(crops, data_sharding)
            labels = jax.lax.with_sharding_constraint(labels, data_sharding)
            return step(state, crops, labels)

        jitted = jax.jit(sharded_step, donate_argnums=(0,),
                         out_shardings=(replicated, replicated))

        def run(state, crops, labels):
            labels = np.asarray(labels, np.float32)
            if jax.process_count() > 1:
                # multi-host: each process feeds its local shard of the
                # global batch (SURVEY 2.8 distributed backend)
                crops = jax.make_array_from_process_local_data(
                    data_sharding, np.asarray(crops))
                labels = jax.make_array_from_process_local_data(
                    data_sharding, labels)
            else:
                crops = jax.device_put(crops, data_sharding)
                labels = jax.device_put(labels, data_sharding)
            return jitted(state, crops, labels)

        return run

    return jax.jit(step, donate_argnums=(0,))


def init_train_state(spec: PickerSpec, params: Dict, model_state: Dict,
                     optimizer: optax.GradientTransformation,
                     pi: Optional[float], seed: int = 0) -> TrainState:
    """Bundle params/model state/optimizer state/method state/rng."""
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model_state = jax.tree_util.tree_map(jnp.asarray, model_state)
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=optimizer.init(params),
        method_state=init_method_state(pi),
        rng=jax.random.PRNGKey(seed),
    )


# -- full-training-state checkpoints (resume with optimizer/method/rng) ------
#
# The reference's "resume" is weights-only (pass a .sav to --model,
# topaz/training.py:301-304): the optimizer restarts cold and the data
# stream is unrelated. These checkpoints capture the ENTIRE TrainState
# (params, model/BN state, optax state, method running state, jax rng)
# plus the host sampler's bit-generator state, so `topaz train --resume`
# continues a run bit-exactly — the elastic/fault-tolerance upgrade over
# SURVEY section 5 (checkpoint/resume row).

def save_train_state(path: str, state: TrainState, epoch: int, it: int,
                     steps_in_epoch: int, sampler_rng_state=None) -> None:
    """Write the full training state. ``steps_in_epoch`` = consumed steps
    of the (possibly unfinished) ``epoch``; 0 means the epoch completed.
    ``sampler_rng_state`` must be the numpy bit-generator state *as of the
    last consumed batch* so a resumed run draws the exact next crops."""
    import json

    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    meta = {"epoch": int(epoch), "iter": int(it),
            "steps_in_epoch": int(steps_in_epoch),
            "n_leaves": len(leaves),
            "sampler_rng": sampler_rng_state}
    import os

    tmp = path + ".tmp.npz"  # .npz suffix keeps np.savez from renaming
    np.savez(tmp, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)  # atomic: a crash mid-save never corrupts


def load_train_state(path: str, template: TrainState):
    """Load a full training state written by :func:`save_train_state`.

    ``template`` (a freshly initialized TrainState for the SAME model /
    optimizer / method configuration) supplies the pytree structure; the
    leaf count is checked so a config mismatch fails clearly instead of
    mis-assigning arrays."""
    import json

    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    treedef = jax.tree_util.tree_structure(template)
    n = meta["n_leaves"]
    if treedef.num_leaves != n:
        raise ValueError(
            f"training state at {path} has {n} leaves but the current "
            f"model/optimizer/method configuration expects "
            f"{treedef.num_leaves}; resume with the same architecture, "
            f"optimizer, and method flags as the original run")
    template_leaves = jax.tree_util.tree_leaves(template)
    leaves = []
    for i, tmpl in enumerate(template_leaves):
        arr = data[f"leaf_{i}"]
        t_shape = getattr(tmpl, "shape", ())
        if tuple(arr.shape) != tuple(t_shape):
            raise ValueError(
                f"training state leaf {i} has shape {arr.shape} but the "
                f"current configuration expects {t_shape} (architecture "
                f"mismatch)")
        leaves.append(jnp.asarray(arr))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta
