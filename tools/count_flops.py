#!/usr/bin/env python
"""Count the FLOPs of the bench workloads (VERDICT r3 item 4: make MFU
computable). Runs on the CPU backend — XLA's cost analysis of the
compiled program; FLOPs are backend-independent — and prints the
constants bench.py embeds (bench itself must stay fast and wedge-proof,
so it does not compile CPU twins at run time).

Usage: JAX_PLATFORMS=cpu python tools/count_flops.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def flops_of(fn, *args) -> float:
    comp = jax.jit(fn).lower(*args).compile()
    return float(comp.cost_analysis()["flops"])


def denoise_flops(size: int) -> float:
    from topaz_tpu.models.denoise_factory import apply_fn_for, load_denoiser

    meta, params = load_denoiser("unet")
    apply_ = apply_fn_for(meta)

    def fn(x):
        mu, std = jnp.mean(x), jnp.std(x)
        xin = ((x - mu) / std)[None, :, :, None]
        y = apply_(params, xin, dims=2)[0, :, :, 0]
        return y * std + mu

    return flops_of(fn, jnp.zeros((size, size), jnp.float32))


def train_step_flops(batch: int = 256) -> float:
    """FLOPs of one labels-vector train step (the step signature is
    ``step(st, crops, labels)`` since the per-item-Bernoulli batch
    composition refactor, 0bec8a6 — labels travel with the crops)."""
    from topaz_tpu.models.factory import load_picker
    from topaz_tpu.train.methods import make_loss_fn
    from topaz_tpu.train.trainer import (init_train_state, make_optimizer,
                                         make_train_step)

    spec, params, state = load_picker("resnet8_u32")
    loss_fn, _h, _s = make_loss_fn("GE-binomial", 0.025)
    opt = make_optimizer(2e-4, "adam")
    step = make_train_step(spec, loss_fn, opt)
    st = init_train_state(spec, params, state, opt, 0.025)
    crops = jnp.zeros((batch, spec.width, spec.width), jnp.float32)
    labels = jnp.asarray((np.arange(batch) < 16), jnp.float32)
    comp = jax.jit(step).lower(st, crops, labels).compile()
    return float(comp.cost_analysis()["flops"])


def main():
    print(f"# jax {jax.__version__}, backend "
          f"{jax.devices()[0].platform}")
    # U-Net denoise at three sizes: verify ~area scaling, then the 4k
    # number is measured directly (CPU compile of the 4k graph is slow
    # but this tool runs offline)
    for size in (1024, 2048):
        f = denoise_flops(size)
        print(f"denoise_{size}: {f:.4g} flops "
              f"({f / (size * size):.1f} flops/px)")
    f4k = denoise_flops(4096)
    print(f"DENOISE4K_FLOPS = {f4k:.6g}  # whole-image unet @ 4096^2")
    ft = train_step_flops()
    print(f"TRAIN_STEP_FLOPS = {ft:.6g}  # GE-binomial resnet8_u32 "
          f"fwd+bwd+adam, batch 256 @ 71^2")


if __name__ == "__main__":
    main()
