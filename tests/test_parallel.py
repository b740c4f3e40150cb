"""Mesh/parallel helpers: distributed Dice psum, case sharding, spatial specs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from micformer_tpu.parallel import make_mesh, shard_batch, replicate
from micformer_tpu.parallel.mesh import global_dice_sums, shard_cases, spatial_sharding


def test_global_dice_sums_match_unsharded(rng):
    """The awesome_allgather equivalent: per-shard partial sums psum'd across
    the mesh must equal the global sums."""
    mesh = make_mesh()
    probs = jnp.asarray(rng.uniform(size=(8, 4, 6, 6, 6)).astype(np.float32))
    targets = jnp.asarray((rng.uniform(size=(8, 4, 6, 6, 6)) > 0.5).astype(np.float32))

    f = shard_map(
        lambda p, t: global_dice_sums(p, t, "data"),
        mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P(), P()), check_vma=False,
    )
    inter, psum_, tsum = f(probs, targets)
    axes = (0, 2, 3, 4)
    np.testing.assert_allclose(np.asarray(inter), np.asarray(
        jnp.sum(probs * targets, axis=axes)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(psum_), np.asarray(
        jnp.sum(probs * probs, axis=axes)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tsum), np.asarray(
        jnp.sum(targets * targets, axis=axes)), rtol=1e-5)


def test_shard_cases_round_robin():
    keys = [f"case{i}" for i in range(10)]
    shards = [shard_cases(keys, pi, 4) for pi in range(4)]
    # disjoint cover, nnU-Net all_keys[rank::world] semantics
    assert sorted(sum(shards, [])) == sorted(keys)
    assert shards[0] == ["case0", "case4", "case8"]


def test_shard_batch_and_replicate(rng):
    mesh = make_mesh()
    batch = {"x": jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == P("data")
    rep = replicate(batch, mesh)
    assert rep["x"].sharding.spec == P()


def test_spatial_sharding_spec():
    mesh = make_mesh(data=8, space=1)
    sh = spatial_sharding(mesh, axis=2)
    assert sh.spec == P(None, None, "space", None, None)


@pytest.mark.slow
def test_tensor_parallel_forward_matches_single_device(rng):
    """Megatron-style head/feature sharding over a 'model' axis (GSPMD
    annotations only): the tensor-parallel forward must match the unsharded
    forward, and the qkv/proj/MLP kernels must actually be split."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from micformer_tpu.models.micformer import MicFormer
    from micformer_tpu.parallel.tensor import (
        tensor_parallel_apply,
        tensor_parallel_shardings,
    )

    model = MicFormer(num_classes=4, embed_dim=24, depths=(1, 1),
                      num_heads=(4, 8))
    x = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 32)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    params = variables["params"]
    want = model.apply({"params": params}, x)

    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("model",))
    shs = tensor_parallel_shardings(params, mesh)
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(shs)
    split = {"/".join(map(str, k)) for k, s in flat.items() if any(s.spec)}
    assert any("qkv/kernel" in k for k in split), split
    assert any("proj/kernel" in k for k in split)
    assert any("Dense_0/kernel" in k or "mlp" in k for k in split)

    got = tensor_parallel_apply(model, params, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-5)
