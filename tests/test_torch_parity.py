"""Model-level torch parity: transplant reference PyTorch weights into the
flax models and assert forward logits match (VERDICT round-1 item 3).

Oracle: the reference's own in-repo model code at /root/reference (read-only,
imported for numeric comparison only). MicFormer is the flagship target
(MICFormer_self.py:881-1055). MONAI-backed references (UNet, SwinUNETR)
cannot be instantiated here — monai is not installed in this image — so their
parity is pinned at the layer level (tests/test_layer_parity.py) instead.

Input is 64^3 — the smallest cube where no stage reaches spatial size 1.
At size-1 axes the reference STN divides by (size-1)=0 (inf/nan coordinates
into grid_sample); ops/warp.py deliberately deviates there (identity on that
axis). Measured numbers are recorded in docs/PARITY.md.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "MicFormer", "models")),
        reason="reference repo not mounted",
    ),
    pytest.mark.slow,  # parity tier: pytest -m 'not slow' skips
]


@pytest.fixture(scope="module")
def micformer_parity_run():
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert import (
        load_reference_micformer,
        micformer_params_from_torch,
    )

    torch.manual_seed(0)
    embed = 24  # heads (3,6,12,24) divide 24*2^i; full-size 48 is CPU-slow
    tmodel = load_reference_micformer(REFERENCE, embed_dim=embed, num_classes=8)
    params = micformer_params_from_torch(tmodel.state_dict())
    fmodel = registry.build("micformer", num_classes=8, embed_dim=embed)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 2, 64, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    apply = jax.jit(lambda p, v: fmodel.apply({"params": p}, v))
    got = np.asarray(apply(params, jnp.asarray(x)))
    return tmodel, fmodel, params, x, ref, got


def test_micformer_forward_parity(micformer_parity_run):
    _, _, _, _, ref, got = micformer_parity_run
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 5e-4, f"max abs err {err:.2e} (measured 9e-5 on transplant)"


def test_micformer_parity_is_weight_sensitive(micformer_parity_run):
    """Guard against a trivially-passing comparison: perturbing one
    transplanted tensor must break parity by orders of magnitude."""
    _, fmodel, params, x, ref, _ = micformer_parity_run
    bad = jax.tree.map(lambda a: a, params)
    bad["out_conv"]["kernel"] = bad["out_conv"]["kernel"] + 0.05
    got = np.asarray(fmodel.apply({"params": bad}, jnp.asarray(x)))
    assert np.abs(got - ref).max() > 1e-2


def test_mednext_forward_parity():
    """Full-model transplant parity for MedNeXt-S k3 (create_mednext_v1.py:3-17,
    MedNextV1.py:7-389) — faithful_up reproduces the reference's literal-zero
    up-block border planes so the comparison is element-exact everywhere."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert.zoo_import import (
        load_reference_mednext, mednext_params_from_torch)

    torch.manual_seed(0)
    tmodel = load_reference_mednext(size="S", in_channels=2, num_classes=8)
    params = mednext_params_from_torch(tmodel.state_dict())
    fmodel = registry.build("mednext", size="S", faithful_up=True)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 2, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jax.jit(
        lambda p, v: fmodel.apply({"params": p}, v))(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 5e-4, f"max abs err {err:.2e}"


def test_mednext_deep_supervision_parity():
    """ds heads out_1..out_4 transplant onto ds1..ds4 and every pyramid level
    matches (MedNextV1.py:306-335 ordering: [full, 1/2, 1/4, 1/8, 1/16])."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert.zoo_import import (
        load_reference_mednext, mednext_params_from_torch)

    torch.manual_seed(1)
    tmodel = load_reference_mednext(size="S", in_channels=2, num_classes=8,
                                    deep_supervision=True)
    params = mednext_params_from_torch(tmodel.state_dict(), deep_supervision=True)
    fmodel = registry.build("mednext", size="S", deep_supervision=True,
                            faithful_up=True)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 2, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        refs = [r.numpy() for r in tmodel(torch.from_numpy(x))]
    gots = jax.jit(lambda p, v: fmodel.apply({"params": p}, v))(params, jnp.asarray(x))
    assert len(gots) == len(refs) == 5
    for lvl, (r, g) in enumerate(zip(refs, gots)):
        g = np.asarray(g)
        assert g.shape == r.shape
        err = np.abs(g - r).max()
        assert err < 5e-4, f"level {lvl}: max abs err {err:.2e}"


def test_transbts_forward_parity():
    """Full-model transplant parity for TransBTS (TransBTS.py:155-238 BTS:
    conv encoder + 4-layer ViT bottleneck + DeUp_Cat decoder + softmax).
    BatchNorms run on batch statistics (== InstanceNorm at batch 1); the
    reference's always-on eval dropout and hard-coded [1,4096,512] pos embed
    are neutralized in the loader (documented quirks)."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert.zoo_import import (
        load_reference_transbts, transbts_params_from_torch)

    torch.manual_seed(2)
    tmodel = load_reference_transbts(img_dim=32, num_channels=2, num_classes=8)
    params = transbts_params_from_torch(tmodel.state_dict())
    fmodel = registry.build("transbts", num_classes=8)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 2, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jax.jit(
        lambda p, v: fmodel.apply({"params": p}, v))(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    # softmax output: probabilities in [0,1]
    np.testing.assert_allclose(got.sum(1), 1.0, atol=1e-4)
    err = np.abs(got - ref).max()
    assert err < 5e-4, f"max abs err {err:.2e}"


def test_nnformer_forward_parity():
    """Full-model transplant parity for nnFormer (nnFormer_tumor.py:889-955,
    MM-WHS Head config): conv stems, per-stage windows incl. the
    construction-time clamp, skip-KV decoder, scrambled-rpe table remap."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert.zoo_import import (
        load_reference_nnformer, nnformer_params_from_torch)

    torch.manual_seed(3)
    crop = (64, 64, 64)
    tmodel = load_reference_nnformer(crop_size=crop, in_channels=2, num_classes=8)
    # bias tables init to trunc_normal(0.02); bump them so the rpe remap is
    # actually load-bearing in the comparison
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "relative_position_bias_table" in name:
                p.mul_(20.0)
    params = nnformer_params_from_torch(tmodel.state_dict(), crop_size=crop)
    fmodel = registry.build("nnformer", num_classes=8)

    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 2) + crop).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jax.jit(
        lambda p, v: fmodel.apply({"params": p}, v))(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 5e-4, f"max abs err {err:.2e}"


def test_nnformer_deep_supervision_parity():
    """ds heads final.{0,1,2} transplant onto head{0,1,2}; all three pyramid
    levels match in the reference's returned order (full-res first,
    nnFormer_tumor.py:944-951 seg_outputs[::-1])."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert.zoo_import import (
        load_reference_nnformer, nnformer_params_from_torch)

    torch.manual_seed(4)
    crop = (32, 32, 32)
    tmodel = load_reference_nnformer(crop_size=crop, in_channels=2,
                                     num_classes=8, deep_supervision=True)
    params = nnformer_params_from_torch(tmodel.state_dict(), crop_size=crop,
                                        deep_supervision=True)
    fmodel = registry.build("nnformer", num_classes=8, deep_supervision=True)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 2) + crop).astype(np.float32)
    with torch.no_grad():
        refs = [r.numpy() for r in tmodel(torch.from_numpy(x))]
    gots = jax.jit(lambda p, v: fmodel.apply({"params": p}, v))(params, jnp.asarray(x))
    assert len(gots) == len(refs) == 3
    for lvl, (r, g) in enumerate(zip(refs, gots)):
        g = np.asarray(g)
        assert g.shape == r.shape
        err = np.abs(g - r).max()
        assert err < 5e-4, f"level {lvl}: max abs err {err:.2e}"


def test_swinunet3d_forward_parity():
    """Full-model transplant parity for SwinUnet3D (SwinUnet_3D.py:420-524):
    gated conv paths, regular+shifted window pairs (the reference's per-axis
    -inf masks vs the rebuild's region-id -100 mask — equal at f32), converge
    norms, final expand. window 2 / input 64^3 satisfies the reference's
    size % (ws*32) == 0 assert on CPU-sized volumes."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert.zoo_import import (
        load_reference_swinunet3d, swinunet3d_params_from_torch)

    torch.manual_seed(5)
    tmodel = load_reference_swinunet3d(window_size=2, in_channels=2, num_classes=8)
    params = swinunet3d_params_from_torch(tmodel.state_dict())
    # faithful_scramble reproduces the reference's shifted-window einops
    # relabeling defect (window grid flattened (n_z,n_x,n_y) post-mask)
    fmodel = registry.build("swinunet3d", num_classes=8, window_size=2,
                            faithful_scramble=True)

    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 2, 64, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jax.jit(
        lambda p, v: fmodel.apply({"params": p}, v))(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 5e-4, f"max abs err {err:.2e}"


def test_transunet_forward_parity():
    """Full-model transplant parity for TransUNet (trans_unet.py:10-101):
    double-conv encoder, patchified attention gates (packed MHA in_proj split
    into q/k/v, interleaved sinusoidal PE), transpose-conv decoder with
    skip-first concat. Channels scaled down so every gate's patch size
    (min(skip)//8) stays >= 1 at a CPU-sized 32^3 input."""
    import torch
    from micformer_tpu import registry
    from micformer_tpu.convert.zoo_import import (
        load_reference_transunet, transunet_params_from_torch)

    torch.manual_seed(6)
    chs = (8, 16, 32, 64)
    tmodel = load_reference_transunet(input_shape=(2, 32, 32, 32),
                                      num_classes=8, num_channels_list=chs)
    params = transunet_params_from_torch(tmodel.state_dict(), chs)
    fmodel = registry.build("transunet", num_classes=8, num_channels_list=chs)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 2, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jax.jit(
        lambda p, v: fmodel.apply({"params": p}, v))(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 5e-4, f"max abs err {err:.2e}"


def test_micformer_train_loss_parity(micformer_parity_run):
    """Cross-framework TRAIN-LOSS parity (VERDICT r2 item 1): the reference
    harness loss path — torch MicFormer forward + MDiceLoss
    (train_mmwhs_noPad.py:108,187; loss/dice.py:158-166) — must equal the
    rebuild's path (flax forward + losses.dice.mdice_loss, the Trainer's
    'mdice' loss) on an identical fixed batch with transplanted weights."""
    import importlib.util

    import torch
    from micformer_tpu.losses.dice import mdice_loss

    tmodel, fmodel, params, x, _, _ = micformer_parity_run
    spec = importlib.util.spec_from_file_location(
        "_ref_micformer_loss", os.path.join(REFERENCE, "MicFormer", "loss", "dice.py"))
    loss_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(loss_mod)

    # synthetic 8-class one-hot label on the same 64^3 grid
    rng = np.random.default_rng(8)
    lab = rng.integers(0, 8, size=(1, 64, 64, 64))
    onehot = np.eye(8, dtype=np.float32)[lab].transpose(0, 4, 1, 2, 3)

    with torch.no_grad():
        seg_t = tmodel(torch.from_numpy(x))
        loss_t = float(loss_mod.MDiceLoss()(seg_t, torch.from_numpy(onehot)))

    logits_j = fmodel.apply({"params": params}, jnp.asarray(x))
    loss_j = float(mdice_loss(logits_j, jnp.asarray(onehot)))
    assert abs(loss_j - loss_t) < 1e-5, f"{loss_j} vs {loss_t}"
    # sanity: a real loss value, not a degenerate constant
    assert 0.05 < loss_t < 1.5


def test_vtunet_block_parity_encoder_and_decoder():
    """VT-Unet block-level transplant parity (vt_unet.py:272-409
    SwinTransformerBlock3D): regular, shifted, and the decoder alpha-fusion
    form (cross-attention against saved prev_k/prev_v + FPE MLP term) — the
    blocks and cross-KV mechanics around the documented true-3D merge
    deviation (models/vtunet.py docstring)."""
    import torch
    from micformer_tpu.convert.zoo_import import (
        load_reference_vtunet_module, vtunet_block_params_from_torch)
    from micformer_tpu.models.vtunet import VTBlock

    mod = load_reference_vtunet_module()
    torch.manual_seed(7)
    dim, heads, ws = 48, 3, (2, 2, 2)
    rng = np.random.default_rng(9)
    x = rng.normal(size=(1, 8, 8, 8, dim)).astype(np.float32)  # channels-last

    def run_torch(block, shift, prev=None, is_decoder=False):
        mask = None
        if shift:
            mask = mod.compute_mask(8, 8, 8, ws, tuple(w // 2 for w in ws),
                                    torch.device("cpu"))
        with torch.no_grad():
            pv, pk = (prev if prev else (None, None))
            return block(torch.from_numpy(x), mask, pv, pk, None,
                         is_decoder=is_decoder)

    # encoder: regular + shifted
    for shift in (False, True):
        blk = mod.SwinTransformerBlock3D(
            dim, heads, window_size=ws,
            shift_size=tuple(w // 2 for w in ws) if shift else (0, 0, 0)).eval()
        with torch.no_grad():
            blk.attn.relative_position_bias_table.mul_(20.0)  # load-bearing rpe
        ref, v_t, k_t, _ = run_torch(blk, shift)
        params = vtunet_block_params_from_torch(blk)
        fblk = VTBlock(dim, heads, ws, shift=shift)
        got, v_j, k_j, _ = fblk.apply({"params": params}, jnp.asarray(x))
        err = np.abs(np.asarray(got) - ref.numpy()).max()
        assert err < 1e-4, f"shift={shift}: max abs err {err:.2e}"

    # decoder alpha-fusion: prev_k/prev_v produced by each framework's own
    # encoder block (numerically equal given the transplant above)
    enc_t = mod.SwinTransformerBlock3D(dim, heads, window_size=ws,
                                       shift_size=(0, 0, 0)).eval()
    _, pv_t, pk_t, _ = run_torch(enc_t, False)
    dec_t = mod.SwinTransformerBlock3D(dim, heads, window_size=ws,
                                       shift_size=(0, 0, 0)).eval()
    ref, _, _, _ = run_torch(dec_t, False, prev=(pv_t, pk_t), is_decoder=True)

    enc_p = vtunet_block_params_from_torch(enc_t)
    fenc = VTBlock(dim, heads, ws, shift=False)
    _, pv_j, pk_j, _ = fenc.apply({"params": enc_p}, jnp.asarray(x))
    dec_p = vtunet_block_params_from_torch(dec_t)
    fdec = VTBlock(dim, heads, ws, shift=False)
    got, _, _, _ = fdec.apply({"params": dec_p}, jnp.asarray(x),
                              prev_v=pv_j, prev_k=pk_j, is_decoder=True)
    err = np.abs(np.asarray(got) - ref.numpy()).max()
    assert err < 1e-4, f"decoder fusion: max abs err {err:.2e}"


def test_param_count_matches_torch(micformer_parity_run):
    """count_parameters parity: the flax tree holds exactly the torch
    parameter budget minus the reference's dead concat_back_dim[0] (built,
    never used: the forward only applies concat_back_dim[inx] for inx>0)."""
    from micformer_tpu.utils import count_parameters

    tmodel, _, params, _, _, _ = micformer_parity_run
    torch_total = sum(p.numel() for p in tmodel.parameters() if p.requires_grad)
    dead = sum(p.numel() for n, p in tmodel.named_parameters()
               if n.startswith("swin.concat_back_dim.0."))
    assert count_parameters(params) == torch_total - dead


def test_vtunet_full_model_parity():
    """FULL-MODEL VT-Unet transplant parity in faithful_2d_merge mode
    (VERDICT r3 item 7): the reference SwinTransformerSys3D
    (vt_unet.py:782-1118) with its 2D-port PatchMerging/PatchExpand hacks
    (:412-536, hard-coded view(B, 32, ...) -> token depth pinned to 32) vs
    flax VTUNet(faithful_2d_merge=True). img (128,64,64), embed 48 keeps the
    CPU budget sane while exercising window clamping, the full-window
    rel-pos-table slicing quirk, and every decoder stage."""
    import torch
    from micformer_tpu.convert.zoo_import import (
        load_reference_vtunet, vtunet_params_from_torch)
    from micformer_tpu.models.vtunet import VTUNet

    torch.manual_seed(3)
    tmodel = load_reference_vtunet(img_size=(128, 64, 64), in_chans=2,
                                   num_classes=8, embed_dim=48)
    with torch.no_grad():
        for m in tmodel.modules():
            if hasattr(m, "relative_position_bias_table"):
                m.relative_position_bias_table.mul_(20.0)  # load-bearing rpe
    params = vtunet_params_from_torch(tmodel.state_dict())
    fmodel = VTUNet(num_classes=8, embed_dim=48, depths=(2, 2, 2, 1),
                    num_heads=(3, 6, 12, 24), window_size=(7, 7, 7),
                    patch_size=(4, 4, 4), faithful_2d_merge=True)

    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, 2, 128, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jax.jit(
        lambda p, v: fmodel.apply({"params": p}, v))(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    print(f"vtunet full-model transplant: max abs err {err:.2e}")
    assert err < 1e-4, f"max abs err {err:.2e}"
