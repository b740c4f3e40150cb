"""Spatial (halo-exchange) sharding of a single GenericUNet forward: the
sharded result must EQUAL the single-device forward — this is exact model
parallelism for >HBM volumes, not overlap-blend tiling."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: pytest -m 'not slow' skips

import jax
import jax.numpy as jnp

from micformer_tpu.models.generic_unet import GenericUNet
from micformer_tpu.parallel import make_mesh
from micformer_tpu.parallel.spatial import halo_exchange, spatial_sharded_apply


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_mesh(space=n)


def test_halo_exchange_neighbors_and_edges():
    mesh = _mesh(4)
    from jax.sharding import PartitionSpec as P

    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1, 1, 1)

    def f(x):
        return halo_exchange(x, 1, 1, "space")

    out = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P(None, "space"), out_specs=P(None, "space")),
    )(x)
    out = np.asarray(out).reshape(4, 4)  # 4 shards x (1 + 2 + 1)
    # shard 0: left halo zero, then rows 0,1, right halo = row 2
    np.testing.assert_array_equal(out[0], [0.0, 0.0, 1.0, 2.0])
    np.testing.assert_array_equal(out[1], [1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(out[3], [5.0, 6.0, 7.0, 0.0])


@pytest.mark.parametrize("pools,convs", [
    (((2, 2, 2), (2, 2, 2)), ((3, 3, 3),) * 3),
    (((1, 2, 2), (2, 2, 2)), ((1, 3, 3), (3, 3, 3), (3, 3, 3))),
])
def test_spatial_forward_matches_single_device(rng, pools, convs):
    mesh = _mesh(4)
    model = GenericUNet(num_classes=3, base_num_features=4,
                        pool_kernels=pools, conv_kernels=convs,
                        conv_per_stage=2)
    x = jnp.asarray(rng.normal(size=(1, 2, 32, 16, 16)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)

    want = model.apply(variables, x)
    got = spatial_sharded_apply(model, variables, x, mesh)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_spatial_rejects_misaligned_depth(rng):
    mesh = _mesh(4)
    model = GenericUNet(num_classes=2, base_num_features=4,
                        pool_kernels=((2, 2, 2),) * 2,
                        conv_kernels=((3, 3, 3),) * 3)
    x = jnp.zeros((1, 2, 24, 16, 16), jnp.float32)  # 24 % (4*4) != 0
    variables = jax.jit(model.init)(jax.random.key(0), x)
    with pytest.raises(AssertionError):
        spatial_sharded_apply(model, variables, x, mesh)
