"""Native C++ library vs numpy/jnp reference implementations."""

import numpy as np
import pytest

from gs2d_tpu import native_lib


@pytest.mark.skipif(not native_lib.available(),
                    reason="native lib not built")
def test_native_knn_matches_exact():
    import jax.numpy as jnp

    from gs2d_tpu.ops.knn import mean_sq_dist3
    rng = np.random.default_rng(0)
    for n in (10, 500, 5000):
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        ref = np.asarray(mean_sq_dist3(jnp.asarray(pts)))
        nat = native_lib.knn3_mean_sq_dist(pts)
        np.testing.assert_allclose(nat, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(not native_lib.available(),
                    reason="native lib not built")
def test_native_points3d_parse(tmp_path):
    from gs2d_tpu.scene.colmap import (read_points3d_binary,
                                       write_points3d_binary)
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(500, 3))
    rgb = (rng.random((500, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "points3D.bin")
    write_points3d_binary(xyz, rgb, p)
    x2, r2, e2 = read_points3d_binary(p)   # native fast path
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)
