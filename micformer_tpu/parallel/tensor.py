"""Tensor (model) parallelism for the transformer model zoo.

Megatron-style head/feature sharding expressed purely as GSPMD sharding
annotations — no explicit collectives (SURVEY §7 design stance: "pick a
mesh, annotate shardings, let XLA insert collectives"):

  - attention qkv / q / kv kernels  [C, k*F]: column-parallel — the output
    feature axis (heads x head_dim, possibly stacked q/k/v) splits over the
    'model' axis, so each device projects and attends its own head group.
  - attention proj kernel [F, C]: row-parallel — the input feature axis
    splits; XLA inserts the psum that merges per-device partial outputs.
  - MLP Dense_0 [C, hidden]: column-parallel; Dense_1 [hidden, C]:
    row-parallel — the classic fc1/fc2 pair.
  - biases of column-parallel layers split likewise; row-parallel biases and
    everything else (norms, convs, embeddings) stay replicated.

The reference has no model parallelism at all (single-GPU + DDP); this is a
TPU-native extension for models whose attention/MLP widths outgrow one
chip's HBM. Works with the plain batched attention path; the lane-major /
head-loop fast paths slice heads in Python, which fights the head sharding,
so `tensor_parallel_apply` disables them under its context.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parameter-path patterns (flax param tree keys joined with '/') -> which
# axis of the kernel splits over 'model'. Column-parallel: output axis (-1);
# row-parallel: input axis (0).
_COLUMN_PAT = re.compile(r"(^|/)(qkv|q|kv)/kernel$|(^|/)Mlp_\d+/Dense_0/kernel$"
                         r"|(^|/)mlp/Dense_0/kernel$")
_COLUMN_BIAS_PAT = re.compile(r"(^|/)(qkv|q|kv)/bias$|(^|/)Mlp_\d+/Dense_0/bias$"
                              r"|(^|/)mlp/Dense_0/bias$")
_ROW_PAT = re.compile(r"(^|/)proj/kernel$|(^|/)Mlp_\d+/Dense_1/kernel$"
                      r"|(^|/)mlp/Dense_1/kernel$")


def tensor_parallel_shardings(params, mesh: Mesh, axis_name: str = "model",
                              num_heads_multiple: int | None = None):
    """NamedSharding pytree for `params`: Megatron column/row split of the
    attention + MLP weights over `axis_name`, everything else replicated.

    A kernel is only split when the target dimension is divisible by the
    axis size (and, for attention projections, when splitting keeps whole
    head groups together — pass `num_heads_multiple` to enforce that the
    per-device feature slice stays a multiple of head_dim)."""
    n = mesh.shape[axis_name]
    rep = NamedSharding(mesh, P())

    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    out = {}
    for key, value in flat.items():
        path = "/".join(str(k) for k in key)
        shape = getattr(value, "shape", ())
        sh = rep
        if _COLUMN_PAT.search(path) and len(shape) == 2 and shape[1] % n == 0:
            sh = NamedSharding(mesh, P(None, axis_name))
        elif _COLUMN_BIAS_PAT.search(path) and len(shape) == 1 and shape[0] % n == 0:
            sh = NamedSharding(mesh, P(axis_name))
        elif _ROW_PAT.search(path) and len(shape) == 2 and shape[0] % n == 0:
            sh = NamedSharding(mesh, P(axis_name, None))
        out[key] = sh
    return unflatten_dict(out)


def shard_params_tensor_parallel(params, mesh: Mesh, axis_name: str = "model"):
    """Place `params` according to tensor_parallel_shardings."""
    shs = tensor_parallel_shardings(params, mesh, axis_name)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shs)


class _force_batched_attention:
    """Disable the head-slicing fast paths (python loops over heads fight
    GSPMD's head sharding) for the duration of a tensor-parallel apply."""

    def __enter__(self):
        import micformer_tpu.models.layers as L
        from micformer_tpu.ops import attention as A

        self._saved = (L.ATTN_LANE_PROJ, A.LANE_MAJOR, A.HEAD_LOOP_MAX)
        L.ATTN_LANE_PROJ = False
        A.LANE_MAJOR = False
        A.HEAD_LOOP_MAX = 0
        return self

    def __exit__(self, *exc):
        import micformer_tpu.models.layers as L
        from micformer_tpu.ops import attention as A

        L.ATTN_LANE_PROJ, A.LANE_MAJOR, A.HEAD_LOOP_MAX = self._saved
        return False


def tensor_parallel_apply(model, params, x, mesh: Mesh,
                          axis_name: str = "model"):
    """jit `model.apply` with Megatron param shardings over `axis_name`.

    Inputs/outputs are replicated; weights live sharded. GSPMD propagates
    the head split through qkv -> attention -> proj and inserts one psum per
    row-parallel layer. Compiled under the batched attention path (see
    _force_batched_attention)."""
    shs = tensor_parallel_shardings(params, mesh, axis_name)
    params = jax.tree.map(lambda v, s: jax.device_put(v, s), params, shs)
    rep = NamedSharding(mesh, P())

    with _force_batched_attention():
        fn = jax.jit(
            lambda p, xx: model.apply({"params": p}, xx),
            in_shardings=(shs, rep), out_shardings=rep)
        return fn(params, jax.device_put(x, rep))
