"""Plan-driven GenericUNet + 2D/pseudo-3D sliding-window engines
(VERDICT round-1 missing items 3 & 6)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micformer_tpu import registry


pytestmark = pytest.mark.slow  # heavyweight tier: pytest -m 'not slow' skips


# ---------------------------------------------------------------------------
# planner pool/conv schedules (get_pool_and_conv_props decisions)
# ---------------------------------------------------------------------------

def test_isotropic_schedule_is_classic_unet():
    from micformer_tpu.pipeline.planner import compute_pool_and_conv_schedules

    pools, convs = compute_pool_and_conv_schedules((128, 128, 128), (1.0, 1.0, 1.0))
    assert pools == [[2, 2, 2]] * 5
    assert convs == [[3, 3, 3]] * 6


def test_anisotropic_schedule_pools_fine_axes_first():
    from micformer_tpu.pipeline.planner import compute_pool_and_conv_schedules

    # thick-slice CT: z spacing 5mm vs 1mm in-plane
    pools, convs = compute_pool_and_conv_schedules((32, 256, 256), (5.0, 1.0, 1.0))
    # first rounds must not pool z (spacing 5 > 2*1) and must use kernel 1 on z
    assert pools[0] == [1, 2, 2]
    assert convs[0] == [1, 3, 3]
    # once in-plane spacing catches up, z pooling joins
    assert any(p[0] == 2 for p in pools)
    assert convs[-1][0] == 3


def test_plan_feeds_generic_unet_forward_and_grad():
    from micformer_tpu.pipeline.planner import (
        DatasetFingerprint, plan_experiment)
    from micformer_tpu.models.generic_unet import build_from_plan

    fp = DatasetFingerprint(shapes=[[32, 32, 32]] * 3, spacings=[[1, 1, 1]] * 3,
                            class_values=list(range(8)), intensity_mean=0.0,
                            intensity_std=1.0, intensity_p005=-1.0,
                            intensity_p995=1.0)
    plan = plan_experiment(fp, max_patch=(32, 32, 32))
    model = build_from_plan(plan, num_classes=8)
    x = jnp.zeros((1, 2, 32, 32, 32))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 8, 32, 32, 32)

    def loss(p):
        return jnp.mean(model.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_generic_unet_deep_supervision_pyramid():
    from micformer_tpu.models.generic_unet import GenericUNet

    model = GenericUNet(num_classes=4, base_num_features=4,
                        pool_kernels=((2, 2, 2), (2, 2, 2)),
                        conv_kernels=((3, 3, 3),) * 3,
                        deep_supervision=True)
    x = jnp.zeros((1, 2, 16, 16, 16))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    outs = model.apply({"params": params}, x)
    assert [tuple(o.shape[2:]) for o in outs] == [(16,) * 3, (8,) * 3]


def test_generic_unet_2d():
    from micformer_tpu.models.generic_unet import GenericUNet

    model = GenericUNet(num_classes=8, base_num_features=4,
                        pool_kernels=((2, 2), (2, 2), (2, 2)),
                        conv_kernels=((3, 3),) * 4, max_features=512)
    x = jnp.zeros((2, 2, 32, 32))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 8, 32, 32)


def test_registry_builds_generic_unet_from_plan_kwarg():
    plan = {"pool_op_kernel_sizes": [[2, 2, 2]] * 2,
            "conv_kernel_sizes": [[3, 3, 3]] * 3,
            "base_num_features": 4, "classes": list(range(8))}
    model = registry.build("generic_unet", plan=plan, num_classes=8)
    x = jnp.zeros((1, 2, 16, 16, 16))
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    assert model.apply({"params": params}, x).shape == (1, 8, 16, 16, 16)


# ---------------------------------------------------------------------------
# 2D / pseudo-3D sliding-window engines (neural_network.py:429-822)
# ---------------------------------------------------------------------------

def _linear_2d_predictor(num_classes=4):
    """Deterministic toy 2D 'network': per-class linear map of channel sums —
    shift-equivariant so tiled and dense evaluation must agree exactly."""
    def predictor(x):  # [b, C, H, W]
        base = jnp.mean(x, axis=1, keepdims=True)
        scales = jnp.arange(1.0, num_classes + 1.0).reshape(1, -1, 1, 1)
        return base * scales
    return predictor


def test_2d_engine_matches_dense_forward():
    from micformer_tpu.infer import sliding_window_inference_2d

    pred = _linear_2d_predictor(4)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(1, 2, 5, 24, 24)).astype(np.float32))

    tiled = sliding_window_inference_2d(vol, (16, 16), pred, num_classes=4,
                                        overlap=0.5, sw_batch_size=3)
    # dense: run the predictor on each full slice
    dense = jax.vmap(lambda s: pred(s), in_axes=2, out_axes=2)(vol)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense), atol=1e-5)


def test_2d_engine_mirror_tta_flips_in_plane_only():
    import itertools

    from micformer_tpu.infer import sliding_window_inference_2d

    def asym_pred(x):  # not flip-equivariant: output depends on raw coords
        return jnp.cumsum(jnp.mean(x, 1, keepdims=True), axis=-1)

    vol = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 1, 3, 16, 16)).astype(np.float32))
    out = sliding_window_inference_2d(vol, (16, 16), asym_pred, num_classes=1,
                                      mirror_tta=True)

    # expected: average over flip subsets of the IN-PLANE axes only (3, 4),
    # never the slice axis (2) — nnU-Net 2D mirror_axes convention
    def dense(v):
        return jax.vmap(asym_pred, in_axes=2, out_axes=2)(v)

    acc = None
    for sub in itertools.chain.from_iterable(
            itertools.combinations((3, 4), r) for r in range(3)):
        y = dense(jnp.flip(vol, sub) if sub else vol)
        y = jnp.flip(y, sub) if sub else y
        acc = y if acc is None else acc + y
    expected = acc / 4.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-4)


def test_pseudo3d_engine_neighborhood_channels():
    from micformer_tpu.infer import sliding_window_inference_pseudo3d

    C, p = 2, 1  # pseudo3d_slices=3 -> input channels C*(2p+1)=6
    def pred(x):  # [b, 6, H, W]: return the CENTER slice of channel 0 stack
        assert x.shape[1] == C * (2 * p + 1)
        return x[:, 1:2]  # channel-major: c0 slices at idx 0..2, center = 1

    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.normal(size=(1, C, 6, 16, 16)).astype(np.float32))
    out = sliding_window_inference_pseudo3d(vol, (16, 16), pred,
                                            pseudo3d_slices=3, num_classes=1)
    # center-slice extraction reproduces channel 0 of the volume exactly
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(vol[:, 0]),
                               atol=1e-5)


def test_pseudo3d_zero_pads_volume_ends():
    from micformer_tpu.infer import sliding_window_inference_pseudo3d

    def pred(x):  # return the PREVIOUS slice (offset -1): c0 slices idx 0..2
        return x[:, 0:1]

    vol = jnp.asarray(np.arange(1, 5, dtype=np.float32).reshape(1, 1, 4, 1, 1)
                      * jnp.ones((1, 1, 4, 8, 8)))
    out = sliding_window_inference_pseudo3d(vol, (8, 8), pred,
                                            pseudo3d_slices=3, num_classes=1)
    got = np.asarray(out)[0, 0, :, 0, 0]
    np.testing.assert_allclose(got, [0.0, 1.0, 2.0, 3.0], atol=1e-5)


# ---------------------------------------------------------------------------
# plan CLI
# ---------------------------------------------------------------------------

def test_plan_cli_writes_plans(tmp_path):
    from micformer_tpu.data.synthetic import write_synthetic_dataset
    from micformer_tpu.cli import plan as plan_cli

    root = str(tmp_path / "d")
    write_synthetic_dataset(root, n_cases=5, shape=(40, 44, 36), seed=11)
    plan_cli.main(["--data", root, "--max-patch", "32"])
    p3 = json.load(open(root + "/plans/plan_3d.json"))
    p2 = json.load(open(root + "/plans/plan_2d.json"))
    assert len(p3["conv_kernel_sizes"]) == len(p3["pool_op_kernel_sizes"]) + 1
    assert len(p2["conv_kernel_sizes"][0]) == 2
    assert p3["classes"]
