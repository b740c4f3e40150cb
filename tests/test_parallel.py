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
