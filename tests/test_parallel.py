"""Multi-device tests on the 8-device virtual CPU mesh (conftest)."""

import numpy as np
import pytest


def test_mesh_shapes():
    import jax

    from topaz_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = make_mesh(n_data=4, n_space=2)
    assert mesh2.shape == {"data": 4, "space": 2}


def test_batched_scorer_matches_single(rng):
    import jax.numpy as jnp

    from topaz_tpu.models.factory import new_picker
    from topaz_tpu.models.picker import apply_picker
    from topaz_tpu.parallel.mesh import make_batched_scorer, make_mesh

    spec, params, state = new_picker("resnet8", units=4, seed=0)
    mesh = make_mesh()
    B = mesh.shape["data"]
    batch = rng.normal(size=(B, 96, 96)).astype(np.float32)

    score = make_batched_scorer(spec, params, state, mesh, precision="highest")
    sharded_out = np.asarray(score(jnp.asarray(batch)))

    single, _ = apply_picker(spec, params, batch, state=state, dense=True,
                             precision="highest")
    np.testing.assert_allclose(sharded_out, np.asarray(single), rtol=1e-5,
                               atol=1e-5)


def test_halo_sharded_scoring_matches_whole_image(rng):
    """Spatially sharded scoring with ppermute halo exchange equals
    single-device whole-image scoring."""
    import jax.numpy as jnp

    from topaz_tpu.models.factory import new_picker
    from topaz_tpu.models.picker import apply_picker
    from topaz_tpu.parallel.mesh import make_halo_dense_scorer, make_mesh

    spec, params, state = new_picker("resnet8", units=4, seed=1)
    mesh = make_mesh(n_data=1, n_space=8)
    H, W = 8 * 48, 120  # H divisible by the space axis
    image = rng.normal(size=(H, W)).astype(np.float32)

    score = make_halo_dense_scorer(spec, params, state, mesh,
                                   precision="highest")
    sharded = np.asarray(score(jnp.asarray(image)))

    whole, _ = apply_picker(spec, params, image[None], state=state, dense=True,
                            precision="highest")
    np.testing.assert_allclose(sharded, np.asarray(whole)[0], rtol=1e-4,
                               atol=1e-4)


def test_dp_train_step(rng):
    """Sharded training step runs and produces replicated updated params."""
    import jax
    import jax.numpy as jnp
    import optax

    from topaz_tpu.models.factory import new_picker
    from topaz_tpu.parallel.mesh import make_dp_train_step, make_mesh
    from topaz_tpu.train.methods import make_loss_fn
    from topaz_tpu.train.trainer import init_train_state, make_optimizer

    spec, params, state = new_picker("resnet8", units=4, seed=2)
    mesh = make_mesh()
    loss_fn, header, _ = make_loss_fn("GE-binomial", 0.05)
    optimizer = make_optimizer(2e-4)
    tstate = init_train_state(spec, params, state, optimizer, 0.05, seed=0)

    B = mesh.shape["data"] * 2
    step = make_dp_train_step(spec, loss_fn, optimizer, mesh=mesh)
    crops = rng.normal(size=(B, 101, 101)).astype(np.float32)
    labels = (np.arange(B) < B // 4).astype(np.float32)
    new_state, metrics = step(tstate, crops, labels)
    assert np.isfinite(float(metrics["loss"]))
    leaf_new = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf_new)).all()


def test_halo_denoiser_fcnn_exact(rng):
    """Pool-free fcnn: halo-sharded denoising == whole-image denoising."""
    import jax.numpy as jnp

    from topaz_tpu.models.denoise_factory import apply_fn_for, load_denoiser
    from topaz_tpu.parallel.mesh import make_halo_denoiser, make_mesh

    meta, params = load_denoiser("fcnn")
    mesh = make_mesh(n_data=1, n_space=8)
    H, W = 8 * 32, 128
    image = rng.normal(2.0, 3.0, (H, W)).astype(np.float32)

    denoise = make_halo_denoiser(meta, params, mesh, halo=16)
    sharded = np.asarray(denoise(jnp.asarray(image)))

    apply_fn = apply_fn_for(meta)
    mu, std = image.mean(), image.std()
    xn = (image - mu) / std
    whole = np.asarray(apply_fn(params, jnp.asarray(xn)[None, :, :, None],
                                dims=2))[0, :, :, 0] * std + mu
    # exact everywhere except within the deep-layer receptive field of the
    # true image top/bottom edges (apron pixel-padding vs per-layer padding)
    np.testing.assert_allclose(sharded[16:-16], whole[16:-16], rtol=1e-4,
                               atol=1e-4)
    assert np.corrcoef(sharded.ravel(), whole.ravel())[0, 1] > 0.99


def test_halo_denoiser_unet_approx(rng):
    """Pooling U-Net: halo-sharded result approximates whole-image output
    (boundary-band deviations, like the reference's own patch mode)."""
    import jax.numpy as jnp

    from topaz_tpu.models.denoise_factory import apply_fn_for, load_denoiser
    from topaz_tpu.parallel.mesh import make_halo_denoiser, make_mesh

    meta, params = load_denoiser("unet-small")
    mesh = make_mesh(n_data=1, n_space=4)
    H, W = 4 * 64, 128
    image = rng.normal(0.0, 1.0, (H, W)).astype(np.float32)

    denoise = make_halo_denoiser(meta, params, mesh, halo=32)
    sharded = np.asarray(denoise(jnp.asarray(image)))

    apply_fn = apply_fn_for(meta)
    mu, std = image.mean(), image.std()
    xn = (image - mu) / std
    whole = np.asarray(apply_fn(params, jnp.asarray(xn)[None, :, :, None],
                                dims=2))[0, :, :, 0] * std + mu
    assert sharded.shape == whole.shape
    corr = np.corrcoef(sharded.ravel(), whole.ravel())[0, 1]
    assert corr > 0.99, corr


def test_halo_denoiser_3d(rng):
    """3D halo-sharded denoising: z-sharded volume through a random 3D
    U-Net approximates the whole-volume pass."""
    import jax
    import jax.numpy as jnp

    from topaz_tpu.models.denoise import apply_unet
    from topaz_tpu.models.denoise_factory import new_denoiser
    from topaz_tpu.parallel.mesh import make_halo_denoiser, make_mesh

    meta, params = new_denoiser("unet", nf=4, base_width=7, dims=3, seed=0)
    mesh = make_mesh(n_data=1, n_space=4)
    D, H, W = 4 * 32, 64, 64
    vol = rng.normal(0.0, 1.0, (D, H, W)).astype(np.float32)

    denoise = make_halo_denoiser(meta, params, mesh, halo=16)
    sharded = np.asarray(denoise(jnp.asarray(vol)))

    mu, std = vol.mean(), vol.std()
    xn = (vol - mu) / std
    whole = np.asarray(apply_unet(params, jnp.asarray(xn)[None, ..., None],
                                  dims=3))[0, ..., 0] * std + mu
    assert sharded.shape == whole.shape
    corr = np.corrcoef(sharded.ravel(), whole.ravel())[0, 1]
    assert corr > 0.95, corr


def test_dryrun_multichip_self_bootstraps(tmp_path):
    """The driver gate: dryrun_multichip must succeed even when the calling
    process sees fewer devices — it re-execs a virtual-CPU-mesh child."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # simulate the driver's environment: no virtual-device XLA flags
    env.pop("XLA_FLAGS", None)
    env.pop("TOPAZ_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"  # stay off the exclusive TPU grant in tests
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(4)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd="/root/repo", capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip OK on 4 devices" in proc.stdout


def test_distributed_init_single_process():
    """Env-driven jax.distributed.initialize (multi-host hook) comes up in
    a single-process configuration and resolve_devices(-2) sees devices."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.update({
        "TOPAZ_COORDINATOR": f"localhost:{port}",
        "TOPAZ_NUM_PROCESSES": "1",
        "TOPAZ_PROCESS_ID": "0",
        "JAX_PLATFORMS": "cpu",
    })
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from topaz_tpu.parallel.devices import maybe_distributed_init, resolve_devices\n"
        "assert maybe_distributed_init()\n"
        "assert maybe_distributed_init()  # idempotent\n"
        "devs = resolve_devices(-2)\n"
        "assert len(devs) >= 1\n"
        "print('DIST-OK', jax.process_count())\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd="/root/repo", capture_output=True, text=True,
                          timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert "DIST-OK 1" in proc.stdout
