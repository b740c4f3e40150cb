"""VT-Unet 2D-Swin pretrained-weight inflation (load_from parity + real
inflation of the genuinely-2D tensors)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from micformer_tpu.convert.torch_import import (
    inflate_patch_embed_2d_to_3d,
    inflate_rel_pos_table_2d_to_3d,
    vtunet_params_from_swin2d,
)

pytestmark = pytest.mark.slow  # heavyweight tier: pytest -m 'not slow' skips

DEPTHS = (2, 2, 2, 1)
HEADS = (3, 6, 12, 24)
E = 24
WIN = (3, 3, 3)


def _fake_swin2d_state_dict(rng):
    """Official-2D-Swin-named checkpoint with matching dims (embed 24, win 3)."""
    sd = {}
    sd["patch_embed.proj.weight"] = rng.normal(size=(E, 3, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = rng.normal(size=(E,)).astype(np.float32)
    sd["patch_embed.norm.weight"] = rng.normal(size=(E,)).astype(np.float32)
    sd["patch_embed.norm.bias"] = rng.normal(size=(E,)).astype(np.float32)
    for i, depth in enumerate(DEPTHS):
        C = E * 2 ** i
        for b in range(depth):
            p = f"layers.{i}.blocks.{b}"
            sd[p + ".norm1.weight"] = rng.normal(size=(C,)).astype(np.float32)
            sd[p + ".norm1.bias"] = rng.normal(size=(C,)).astype(np.float32)
            sd[p + ".norm2.weight"] = rng.normal(size=(C,)).astype(np.float32)
            sd[p + ".norm2.bias"] = rng.normal(size=(C,)).astype(np.float32)
            sd[p + ".attn.qkv.weight"] = rng.normal(size=(3 * C, C)).astype(np.float32)
            sd[p + ".attn.qkv.bias"] = rng.normal(size=(3 * C,)).astype(np.float32)
            sd[p + ".attn.proj.weight"] = rng.normal(size=(C, C)).astype(np.float32)
            sd[p + ".attn.proj.bias"] = rng.normal(size=(C,)).astype(np.float32)
            sd[p + ".attn.relative_position_bias_table"] = rng.normal(
                size=(5 * 5, HEADS[i])).astype(np.float32)  # 2D window 3 -> 25
            sd[p + ".mlp.fc1.weight"] = rng.normal(size=(4 * C, C)).astype(np.float32)
            sd[p + ".mlp.fc1.bias"] = rng.normal(size=(4 * C,)).astype(np.float32)
            sd[p + ".mlp.fc2.weight"] = rng.normal(size=(C, 4 * C)).astype(np.float32)
            sd[p + ".mlp.fc2.bias"] = rng.normal(size=(C,)).astype(np.float32)
    sd["norm.weight"] = rng.normal(size=(E * 8,)).astype(np.float32)
    sd["norm.bias"] = rng.normal(size=(E * 8,)).astype(np.float32)
    return sd


def test_patch_embed_inflation_depth_constant_response():
    """A depth-constant 3D input must reproduce the 2D conv response."""
    rng = np.random.default_rng(0)
    w2d = rng.normal(size=(6, 3, 4, 4)).astype(np.float32)
    k3d = inflate_patch_embed_2d_to_3d(w2d, kd=4, in_channels=1)
    assert k3d.shape == (4, 4, 4, 1, 6)
    patch2d = rng.normal(size=(4, 4)).astype(np.float32)
    gray = w2d.mean(axis=1)
    want = np.einsum("hw,ehw->e", patch2d, gray)
    got = np.einsum("dhwce,dhw->e", k3d, np.broadcast_to(patch2d, (4, 4, 4)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rel_pos_table_inflation():
    t2d = np.arange(25 * 2, dtype=np.float32).reshape(25, 2)
    t3d = inflate_rel_pos_table_2d_to_3d(t2d, (3, 3, 3))
    assert t3d.shape == (125, 2)
    # constant across the depth-delta axis
    t = t3d.reshape(5, 5, 5, 2)
    for d in range(5):
        np.testing.assert_array_equal(t[d], t[0])
    np.testing.assert_array_equal(t[0].reshape(25, 2), t2d)
    # non-factoring table is rejected
    assert inflate_rel_pos_table_2d_to_3d(np.zeros((169, 2)), (3, 3, 3)) is None


@pytest.fixture(scope="module")
def vtunet_params():
    from micformer_tpu.models.vtunet import VTUNet

    model = VTUNet(num_classes=4, embed_dim=E, depths=DEPTHS, num_heads=HEADS,
                   window_size=WIN)
    x = jnp.zeros((1, 2, 32, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)
    return model, jax.tree.map(np.asarray, variables["params"])


def test_vtunet_inflation_loads_and_mirrors(vtunet_params):
    model, params = vtunet_params
    sd = _fake_swin2d_state_dict(np.random.default_rng(1))
    new, report = vtunet_params_from_swin2d(
        sd, params, depths=DEPTHS, window_size=WIN, in_channels=2)
    assert len(report["loaded"]) > 40, report["skipped"][:5]

    # encoder qkv transplanted (flax kernel = W.T)
    np.testing.assert_allclose(
        new["enc0_b0"]["attn"]["qkv"]["kernel"],
        np.asarray(sd["layers.0.blocks.0.attn.qkv.weight"]).T, rtol=1e-6)
    # decoder mirror: layers.0 -> dec3 (load_from layers_up.(3-X) rule)
    np.testing.assert_allclose(
        new["dec3_b1"]["attn"]["proj"]["kernel"],
        np.asarray(sd["layers.0.blocks.1.attn.proj.weight"]).T, rtol=1e-6)
    # rel-pos table inflated to the 3D size
    assert new["enc1_b0"]["attn"]["rel_pos_bias_table"].shape == (
        125, HEADS[1])
    # untouched heads keep their init (checkpoint has no 'head')
    np.testing.assert_array_equal(new["head"]["kernel"], params["head"]["kernel"])

    # model still runs with the inflated params
    x = jnp.zeros((1, 2, 32, 32, 32), jnp.float32)
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(
        jax.tree.map(jnp.asarray, new), x)
    assert out.shape == (1, 4, 32, 32, 32)
    assert bool(jnp.isfinite(out).all())


def test_vtunet_inflation_drops_mismatches(vtunet_params):
    _, params = vtunet_params
    sd = _fake_swin2d_state_dict(np.random.default_rng(2))
    sd["layers.0.blocks.0.attn.qkv.weight"] = np.zeros((10, 10), np.float32)
    new, report = vtunet_params_from_swin2d(
        sd, params, depths=DEPTHS, window_size=WIN, in_channels=2)
    assert any("enc0_b0/attn/qkv" in s for s in report["skipped"])
    np.testing.assert_array_equal(new["enc0_b0"]["attn"]["qkv"]["kernel"],
                                  params["enc0_b0"]["attn"]["qkv"]["kernel"])


def test_load_pretrained_params_nonstrict(vtunet_params):
    """nnU-Net load_pretrained_weights semantics: matching leaves copied,
    heads skipped, shape mismatches dropped."""
    from micformer_tpu.convert.torch_import import load_pretrained_params

    _, params = vtunet_params
    src = {k: v for k, v in params.items()}
    import copy
    src = copy.deepcopy(params)
    src["enc0_b0"]["norm1"]["scale"] = src["enc0_b0"]["norm1"]["scale"] + 7.0
    src["head"]["kernel"] = src["head"]["kernel"] + 7.0
    src["enc1_b0"]["attn"]["qkv"]["kernel"] = np.zeros((2, 2), np.float32)

    out, report = load_pretrained_params(params, src)
    np.testing.assert_allclose(out["enc0_b0"]["norm1"]["scale"],
                               np.asarray(params["enc0_b0"]["norm1"]["scale"]) + 7.0)
    # head untouched
    np.testing.assert_array_equal(out["head"]["kernel"], params["head"]["kernel"])
    assert any("head" in s for s in report["skipped"])
    # shape mismatch dropped
    np.testing.assert_array_equal(out["enc1_b0"]["attn"]["qkv"]["kernel"],
                                  params["enc1_b0"]["attn"]["qkv"]["kernel"])
