"""Device-mesh parallelism — the TPU-native replacement for the reference's
torch.distributed/NCCL stack (SURVEY.md §2 parallelism list, §5 backend row).

Capability mapping (reference -> here):
  - DDP allreduce (nnUNetTrainerV2_DDP.py:198)            -> grads psum'd by XLA
    when the jitted train step runs with batch sharded over the 'data' axis and
    params replicated: no explicit collective code, the sharding IS the DDP.
  - awesome_allgather_function (utilities/distributed.py:27-50: autograd
    all-gather for global Dice nominators/denominators)   -> the loss runs
    under the same jit, so per-shard partial sums are combined by XLA psum —
    differentiably; `global_dice_sums` makes this explicit under shard_map.
  - rank-0 guards (print_if_rank0 / master_do utils.py:46-54)
                                                          -> is_primary().
  - per-rank validation-key sharding (nnUNetTrainerV2_DDP.py:492)
                                                          -> shard_cases().
  - multi-host init (dist.init_process_group 'nccl')      -> jax.distributed
    .initialize() is the user's call on multi-host pods; single-controller
    meshes here work unchanged.

Mesh axes: 'data' (batch / DDP-equivalent) and optional 'space' (spatial
sharding of volumes / sliding-window tiles over ICI — the TPU-idiomatic
extension covering the reference's sliding-window decomposition, SURVEY §5
long-context row).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, space: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'space') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // space
    assert data * space == n, f"mesh {data}x{space} != {n} devices"
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def data_parallel_shardings(mesh: Mesh):
    """(batch_sharding, replicated_sharding) for jit in/out specs."""
    return (
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
    )


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of [B, ...] arrays with B sharded over `axis`."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def zero1_shardings(opt_state, mesh: Mesh, axis_name: str = "data"):
    """ZeRO-1 placement for an optax optimizer state: shard every moment-like
    leaf over the mesh `axis_name`, replicate the rest.

    The TPU-native form of optimizer-state sharding (DeepSpeed ZeRO stage 1 /
    torch's ZeroRedundancyOptimizer — a capability slot the reference's plain
    DDP lacks): each leaf with a dimension divisible by the axis size is
    given a NamedSharding splitting its largest such dimension; GSPMD then
    keeps the Adam moments resident at 1/N per device and inserts the
    reduce-scatter / all-gather pair around the update automatically. Scalars
    (step counts) and indivisible leaves stay replicated.

    Returns a pytree of NamedShardings matching `opt_state`'s structure —
    usable as a jit in/out sharding or with jax.device_put."""
    n = mesh.shape[axis_name]
    rep = NamedSharding(mesh, P())

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        if not shape:
            return rep
        best = None
        for ax, s in enumerate(shape):
            if s % n == 0 and (best is None or s > shape[best]):
                best = ax
        if best is None:
            return rep
        spec = [None] * len(shape)
        spec[best] = axis_name
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf_sharding, opt_state)


def spatial_sharding(mesh: Mesh, axis: int = 2):
    """NamedSharding splitting one spatial axis of [B, C, D, H, W] over 'space'."""
    spec = [None] * 5
    spec[axis] = "space"
    return NamedSharding(mesh, P(*spec))


def is_primary() -> bool:
    """Rank-0 guard (reference master_do / print_if_rank0 parity)."""
    return jax.process_index() == 0


def shard_cases(keys, process_index: int | None = None, process_count: int | None = None):
    """Deterministic round-robin case sharding for validation
    (nnUNetTrainerV2_DDP.py:492 `all_keys[rank::world]` parity)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(keys)[pi::pc]


def global_dice_sums(probs, targets, axis_name: str = "data"):
    """Differentiable cross-device Dice sums — the reference's
    awesome_allgather trick done the JAX way (inside shard_map/pmap: psum of
    the per-shard nominator/denominator partial sums; gradients flow through
    psum automatically)."""
    import jax.numpy as jnp

    axes = (0,) + tuple(range(2, probs.ndim))
    inter = jax.lax.psum(jnp.sum(probs * targets, axis=axes), axis_name)
    psum_ = jax.lax.psum(jnp.sum(probs * probs, axis=axes), axis_name)
    tsum = jax.lax.psum(jnp.sum(targets * targets, axis=axes), axis_name)
    return inter, psum_, tsum
