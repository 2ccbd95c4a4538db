"""Pallas disk-max kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest


@pytest.mark.parametrize("r,shape,tile", [(3, (100, 130), 64),
                                          (14, (300, 200), 128),
                                          (7, (64, 64), 256)])
def test_disk_max_pallas_matches_lax(rng, r, shape, tile):
    import jax.numpy as jnp

    from topaz_tpu.ops.nms import disk_max
    from topaz_tpu.ops.nms_pallas import disk_max_pallas

    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ref = np.asarray(disk_max(x, r))
    out = np.asarray(disk_max_pallas(x, r, -jnp.inf, tile=tile, interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_disk_max_pallas_int32(rng):
    import jax.numpy as jnp

    from topaz_tpu.ops.nms import INT_NEG, disk_max
    from topaz_tpu.ops.nms_pallas import disk_max_pallas

    x = jnp.asarray(rng.integers(-999, 999, (90, 70)).astype(np.int32))
    ref = np.asarray(disk_max(x, 5, init=INT_NEG))
    out = np.asarray(disk_max_pallas(x, 5, INT_NEG, tile=64, interpret=True))
    np.testing.assert_array_equal(ref, out)
