"""AOT export artifacts: serialize -> deserialize -> call equals live pipeline."""

import json
import os

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from micformer_tpu import registry
from micformer_tpu.convert.aot_export import (
    build_inference_fn, export_artifact, load_artifact)


def _tiny_model_and_params():
    model = registry.build("unet3d", num_classes=8)
    x0 = jnp.zeros((1, 2, 16, 16, 16), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x0)
    return model, variables["params"]


@pytest.mark.slow  # re-tier r4: >30s on the fast tier
def test_export_roundtrip_argmax(tmp_path):
    model, params = _tiny_model_and_params()
    art = str(tmp_path / "artifact")
    meta = export_artifact(
        art, model, params, target_shape=(16, 16, 16), roi=(16, 16, 16),
        sw_batch_size=1, model_name="unet3d")
    assert os.path.exists(os.path.join(art, "module.jaxexp"))
    assert meta["output"] == "argmax_uint8"
    assert meta["input_shape"] == [1, 2, 16, 16, 16]
    assert json.load(open(os.path.join(art, "meta.json")))["model"] == "unet3d"

    call, meta2 = load_artifact(art)
    assert meta2 == meta
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 2, 16, 16, 16)).astype(np.float32))
    got = np.asarray(call(x))
    want = np.asarray(build_inference_fn(
        model, params, roi=(16, 16, 16), sw_batch_size=1)(x))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow  # re-tier r4: >30s on the fast tier
def test_export_roundtrip_logits(tmp_path):
    model, params = _tiny_model_and_params()
    art = str(tmp_path / "artifact")
    export_artifact(
        art, model, params, target_shape=(16, 16, 16), roi=(16, 16, 16),
        sw_batch_size=1, argmax=False)
    call, meta = load_artifact(art)
    assert meta["output"] == "logits_f32"
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(size=(1, 2, 16, 16, 16)).astype(np.float32))
    got = np.asarray(call(x))
    want = np.asarray(build_inference_fn(
        model, params, roi=(16, 16, 16), sw_batch_size=1, argmax=False)(x))
    assert got.shape == (1, 8, 16, 16, 16)
    # deserialized module compiles through a slightly different pipeline:
    # float fuzz only (measured max 2.4e-6 abs / 2.5e-4 rel)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=5e-4)


@pytest.mark.slow  # re-tier r4: >30s on the fast tier
def test_artifact_version_guard(tmp_path):
    model, params = _tiny_model_and_params()
    art = str(tmp_path / "artifact")
    export_artifact(art, model, params, target_shape=(16, 16, 16),
                    roi=(16, 16, 16), sw_batch_size=1)
    meta_path = os.path.join(art, "meta.json")
    meta = json.load(open(meta_path))
    meta["version"] = 999
    json.dump(meta, open(meta_path, "w"))
    try:
        load_artifact(art)
    except ValueError as e:
        assert "999" in str(e)
    else:
        raise AssertionError("expected version guard to raise")
