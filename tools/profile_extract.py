"""Per-stage timing of the extract-only path on the real chip.

Stages (bench.build_pipeline extract):
  1. downsample(raw 4096^2, 8) -> 512^2     (rfft2/irfft2)
  2. norm_fit(small.ravel())                (GMM EM while_loop)
  3. apply_picker dense resnet8_u32 @ 512^2
  4. nms_topk_2d(score, 14, -6, 2048)
Each stage jitted separately; timed over N dispatches with end drain.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from topaz_tpu.cli.main import _setup_compilation_cache
_setup_compilation_cache()

from topaz_tpu.models.factory import load_picker
from topaz_tpu.models.picker import apply_picker
from topaz_tpu.ops.fourier import downsample
from topaz_tpu.ops.gmm import norm_fit
from topaz_tpu.ops.nms import nms_topk_2d

N = 20
rng = np.random.default_rng(0)
raw = jnp.asarray(rng.normal(0, 1, (4096, 4096)).astype(np.float32))

spec, params, state = load_picker("resnet8_u32")

f_down = jax.jit(lambda x: downsample(x, 8))
f_norm = jax.jit(lambda s: norm_fit(s.ravel()))
f_score = jax.jit(lambda n: apply_picker(spec, params, n[None], state=state,
                                         dense=True)[0])
f_nms = jax.jit(lambda s: nms_topk_2d(s[0], 14, -6.0, 2048))

small = f_down(raw)
mu, std, *_ = f_norm(small)
norm = (small - mu) / std
score = f_score(norm)
out = f_nms(score)
jax.block_until_ready(out)
_ = np.asarray(out[1][:1])

def timeit(name, fn, arg):
    t0 = time.time()
    outs = [fn(arg) for _ in range(N)]
    for o in outs:
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = np.asarray(leaf.ravel()[:1])  # slice ON DEVICE, fetch 1 elem
    dt = (time.time() - t0) / N
    print(f"{name:12s} {dt*1e3:8.2f} ms")
    return dt

t1 = timeit("downsample", f_down, raw)
t2 = timeit("norm_fit", f_norm, small)
t3 = timeit("score", f_score, norm)
t4 = timeit("nms", f_nms, score)
print(f"{'sum':12s} {(t1+t2+t3+t4)*1e3:8.2f} ms")

# the fused extract for comparison
import bench
ext, _ = bench.build_pipeline()
o = ext(raw); _ = np.asarray(o[1][:1])
t0 = time.time()
outs = [ext(raw) for _ in range(N)]
for o in outs:
    _ = np.asarray(o[1]).ravel()[:1]
print(f"{'fused':12s} {(time.time()-t0)/N*1e3:8.2f} ms")
