"""Torch-parity tests for layer-level equivalences the models rely on.

These pin down the *mathematical identities* used in the rebuild (not weight
compatibility): the zero-dilate+conv form of depthwise transpose convs
(models/mednext.py), InstanceNorm vs torch InstanceNorm3d, PReLU semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


pytestmark = pytest.mark.slow  # heavyweight tier: pytest -m 'not slow' skips


def test_zero_dilate_conv_equals_torch_transpose_conv(rng):
    """MedNeXt up-block identity: depthwise ConvTranspose3d(k3, s2, p1) +
    F.pad((1,0)x3) == zero-dilate + depthwise conv k3 with padding (2,1),
    for the SAME kernel (torch's transpose conv correlates with the kernel
    flipped relative to a forward conv)."""
    import torch
    import torch.nn.functional as F
    import flax.linen as nn
    from micformer_tpu.models.layers import zero_dilate

    C, L = 3, 5
    x = rng.normal(size=(1, C, L, L, L)).astype(np.float32)
    w = rng.normal(size=(C, 1, 3, 3, 3)).astype(np.float32)  # depthwise

    xt = torch.from_numpy(x)
    wt = torch.from_numpy(w)
    ref = F.conv_transpose3d(xt, wt, stride=2, padding=1, groups=C)
    ref = F.pad(ref, (1, 0, 1, 0, 1, 0)).numpy()  # [1, C, 2L, 2L, 2L]
    # (torch correlates with w as-is in transpose mode; the adjoint-of-conv
    #  formulation needs the spatially flipped kernel)

    # ours: dilate + conv. torch transpose-conv with kernel w equals a plain
    # conv with the SPATIALLY FLIPPED kernel over the dilated input.
    xj = jnp.moveaxis(jnp.asarray(x), 1, -1)          # NDHWC
    xd = zero_dilate(xj)                              # [1, 2L-1, ..., C]
    w_flip = w[:, 0, ::-1, ::-1, ::-1]                # [C, 3, 3, 3]
    wj = jnp.asarray(np.transpose(w_flip, (1, 2, 3, 0))[..., None, :])  # DHWIO, I=1
    out = jax.lax.conv_general_dilated(
        jnp.pad(xd, ((0, 0), (2, 1), (2, 1), (2, 1), (0, 0))), wj,
        (1, 1, 1), "VALID", feature_group_count=C,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = np.moveaxis(np.asarray(out), -1, 1)
    # torch's F.pad prepends a LITERAL ZERO plane per axis; our formulation
    # computes a real windowed value there (documented deviation — no dead
    # border plane). Everything else is element-exact.
    np.testing.assert_allclose(got[:, :, 1:, 1:, 1:], ref[:, :, 1:, 1:, 1:],
                               atol=1e-4)
    assert np.all(ref[:, :, 0] == 0) and np.all(ref[:, :, :, 0] == 0)


def test_instance_norm_matches_torch(rng):
    import torch
    from micformer_tpu.models.layers import InstanceNorm

    x = rng.normal(size=(2, 6, 6, 6, 4)).astype(np.float32) * 3 + 1
    mod = InstanceNorm()
    out = mod.apply({}, jnp.asarray(x))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    ref = torch.nn.InstanceNorm3d(4)(xt).numpy()
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-4)


def test_prelu_matches_torch(rng):
    import torch
    from micformer_tpu.models.layers import PReLU

    x = rng.normal(size=(2, 5, 5, 5, 3)).astype(np.float32)
    mod = PReLU()
    v = mod.init(jax.random.key(0), jnp.asarray(x))
    out = mod.apply(v, jnp.asarray(x))
    ref = torch.nn.PReLU()(torch.from_numpy(x)).detach().numpy()  # both init 0.25
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_single_modal_dataset(tmp_path, rng):
    from micformer_tpu.data.synthetic import write_synthetic_dataset
    from micformer_tpu.data import get_datasets

    root = str(tmp_path)
    write_synthetic_dataset(root, n_cases=6, shape=(20, 20, 20), seed=1)
    train, _, _ = get_datasets(root, target_shape=(16, 16, 16), single_modal=True)
    s = train[0]
    assert s["image"].shape[0] == 1  # CT only (SingleModal_nnformer parity)
    full, _, _ = get_datasets(root, target_shape=(16, 16, 16))
    assert full[0]["image"].shape[0] == 2
