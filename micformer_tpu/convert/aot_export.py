"""AOT serving artifacts — serialized StableHLO of the full inference pipeline.

The reference deploys by shipping its Python tree plus a ``.pth.tar`` and
re-running ``test.ipynb`` (SURVEY.md §2.10); there is no model-export story.
This is the TPU-native equivalent of a deployment artifact: the ENTIRE
sliding-window inference program (tiling, predictor, gaussian blending,
optional mirror TTA, argmax) exported through ``jax.export`` as one
version-checked StableHLO module with the trained weights baked in as
constants. The artifact is self-contained — serving it needs jax and the
artifact directory, not the model zoo, the checkpoint tree, or the config
system — and it is portable across processes and (when lowered for multiple
platforms) across backends.

Layout of an artifact directory:
    module.jaxexp   jax.export serialized bytes (StableHLO + calling conv)
    meta.json       protocol metadata (shapes, roi, blending, model name)
"""

from __future__ import annotations

import json
import os

VERSION = 1


def build_inference_fn(model, params, *, roi, num_classes=8, overlap=0.5,
                       sw_batch_size=4, step_mode="monai", mirror_tta=False,
                       argmax=True):
    """The serving program: volume [B,2,D,H,W] -> seg [B,D,H,W] (argmax)
    or logits [B,C,D,H,W] — same composition as cli/serve.py."""
    import jax.numpy as jnp

    from micformer_tpu.infer import sliding_window_inference

    def predictor(win):
        out = model.apply({"params": params}, win)
        return out[0] if isinstance(out, (list, tuple)) else out

    def infer(volume):
        logits = sliding_window_inference(
            volume, tuple(roi), predictor, num_classes=num_classes,
            overlap=overlap, sw_batch_size=sw_batch_size,
            step_mode=step_mode, mirror_tta=mirror_tta)
        if argmax:
            return jnp.argmax(logits, axis=1).astype(jnp.uint8)
        return logits

    return infer


def export_artifact(out_dir: str, model, params, *, target_shape, roi,
                    num_classes=8, overlap=0.5, sw_batch_size=4,
                    step_mode="monai", mirror_tta=False, argmax=True,
                    batch=1, platforms=None, model_name=None):
    """Export the inference pipeline for `target_shape` volumes to `out_dir`.

    platforms: optional list like ["tpu"] / ["cpu","tpu"]; None = the current
    default backend. Weights are baked into the module as constants.
    Returns the meta dict."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    infer = build_inference_fn(
        model, params, roi=roi, num_classes=num_classes, overlap=overlap,
        sw_batch_size=sw_batch_size, step_mode=step_mode,
        mirror_tta=mirror_tta, argmax=argmax)

    spec = jax.ShapeDtypeStruct((batch, 2) + tuple(target_shape), jnp.float32)
    exported = jexport.export(jax.jit(infer), platforms=platforms)(spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "module.jaxexp"), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "version": VERSION,
        "model": model_name or type(model).__name__,
        "input_shape": [batch, 2] + list(target_shape),
        "output": "argmax_uint8" if argmax else "logits_f32",
        "num_classes": num_classes,
        "roi": list(roi),
        "overlap": overlap,
        "sw_batch_size": sw_batch_size,
        "step_mode": step_mode,
        "mirror_tta": mirror_tta,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_artifact(artifact_dir: str):
    """-> (callable volume -> output, meta dict). The callable is the
    deserialized module's `.call` — it traces/compiles on first use for the
    running backend (must be one of meta["platforms"])."""
    from jax import export as jexport

    with open(os.path.join(artifact_dir, "module.jaxexp"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(artifact_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("version", 0) > VERSION:
        raise ValueError(
            f"artifact version {meta['version']} is newer than this "
            f"framework's supported version {VERSION}")
    return exported.call, meta
