"""End-to-end CLI flow on synthetic data: train -> predict -> evaluate."""

import glob
import json
import os

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # heavyweight tier: pytest -m 'not slow' skips


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    from micformer_tpu.data.synthetic import write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("clidata"))
    write_synthetic_dataset(root, n_cases=6, shape=(24, 24, 24), seed=5)
    return root


def test_train_cli(data_root, tmp_path_factory):
    from micformer_tpu.cli.train import main

    run_dir = str(tmp_path_factory.mktemp("clirun"))
    main([
        "--data", data_root, "--cache", data_root + "/cache",
        "--model", "unet3d", "--epochs", "2", "--val", "1",
        "--target-shape", "16", "--run-dir", run_dir,
    ])
    assert os.path.isdir(os.path.join(run_dir, "ckpt_best_dice"))
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))
    assert os.path.exists(os.path.join(run_dir, "val.txt"))
    # stash for the predict test
    test_train_cli.run_dir = run_dir


def test_predict_and_evaluate_cli(data_root, tmp_path_factory):
    from micformer_tpu.cli.predict import main as predict_main
    from micformer_tpu.cli.evaluate import main as evaluate_main
    from micformer_tpu.data.nifti import write_nifti, read_nifti
    from micformer_tpu.data import get_datasets

    run_dir = getattr(test_train_cli, "run_dir", None)
    if run_dir is None:
        pytest.skip("train test did not run")
    out_dir = str(tmp_path_factory.mktemp("preds"))
    predict_main([
        "--data", data_root, "--cache", data_root + "/cache",
        "--model", "unet3d", "--run-dirs", run_dir,
        "--out", out_dir, "--roi", "16", "--target-shape", "16",
        "--split", "test", "--largest-cc",
    ])
    preds = glob.glob(os.path.join(out_dir, "*_pred.nii.gz"))
    assert preds, "no predictions written"

    # build GT label maps for the same split
    gt_dir = str(tmp_path_factory.mktemp("gts"))
    _, _, test_ds = get_datasets(data_root, cache_dir=data_root + "/cache",
                                 target_shape=(16, 16, 16))
    for i in range(len(test_ds)):
        s = test_ds[i]
        gt = np.argmax(np.asarray(s["label"]), axis=0).astype(np.uint8)
        write_nifti(os.path.join(gt_dir, f"{s['patient_id']}_gt.nii.gz"), gt)

    summary = str(tmp_path_factory.mktemp("ev") / "summary.json")
    agg = evaluate_main(["--pred", out_dir, "--gt", gt_dir, "--json", summary])
    assert os.path.exists(summary)
    data = json.load(open(summary))
    assert "results" in data and "mean" in data["results"]


def test_softmax_export_and_ensemble_cli(data_root, tmp_path_factory):
    """predict --save-softmax -> cli.ensemble averages saved probabilities
    (ensemble_predictions.py workflow)."""
    from micformer_tpu.cli.predict import main as predict_main
    from micformer_tpu.cli.ensemble import main as ensemble_main
    from micformer_tpu.data.nifti import read_nifti

    run_dir = getattr(test_train_cli, "run_dir", None)
    if run_dir is None:
        pytest.skip("train test did not run")
    out_a = str(tmp_path_factory.mktemp("preds_a"))
    out_b = str(tmp_path_factory.mktemp("preds_b"))
    for out in (out_a, out_b):
        predict_main([
            "--data", data_root, "--cache", data_root + "/cache",
            "--model", "unet3d", "--run-dirs", run_dir,
            "--out", out, "--roi", "16", "--target-shape", "16",
            "--split", "test", "--save-softmax",
        ])
        assert glob.glob(os.path.join(out, "*_softmax.npz"))

    ens = str(tmp_path_factory.mktemp("ens"))
    ensemble_main(["--inputs", out_a, out_b, "--out", ens])
    merged = glob.glob(os.path.join(ens, "*_pred.nii.gz"))
    assert merged
    # identical inputs -> ensemble equals the individual argmax
    pid = os.path.basename(merged[0])
    a = read_nifti(os.path.join(out_a, pid))
    e = read_nifti(merged[0])
    sm = np.load(glob.glob(os.path.join(out_a, "*_softmax.npz"))[0])["softmax"]
    assert sm.shape[0] == 8 and sm.dtype == np.float16
    # f16 softmax storage can flip exact-tie voxels; require near-identity
    mismatch = np.mean(np.asarray(a) != np.asarray(e))
    assert mismatch < 0.005, f"ensemble differs on {mismatch:.2%} of voxels"


def test_spatial_engine_cli(data_root, tmp_path_factory):
    """train a plan-shaped generic_unet via YAML, then predict with
    --engine spatial (halo-exchange sharded forward) — the model is
    reconstructed from the run dir's config.yaml, not re-specified."""
    import yaml
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from micformer_tpu.cli.train import main as train_main
    from micformer_tpu.cli.predict import main as predict_main

    cfg = {
        "model": {"name": "generic_unet", "num_classes": 8,
                  "extra": {"base_num_features": 4,
                            "pool_kernels": [[2, 2, 2], [2, 2, 2]],
                            "conv_kernels": [[3, 3, 3]] * 3}},
    }
    cfg_path = str(tmp_path_factory.mktemp("cfg") / "gu.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir = str(tmp_path_factory.mktemp("gurun"))
    train_main([
        "--cfg", cfg_path, "--data", data_root, "--cache", data_root + "/cache",
        "--epochs", "1", "--val", "1", "--target-shape", "16",
        "--run-dir", run_dir,
    ])
    out_dir = str(tmp_path_factory.mktemp("gupreds"))
    predict_main([
        "--data", data_root, "--cache", data_root + "/cache",
        "--run-dirs", run_dir, "--out", out_dir,
        "--roi", "16", "--target-shape", "16", "--split", "test",
        "--engine", "spatial", "--spatial-shards", "4",
    ])
    assert glob.glob(os.path.join(out_dir, "*_pred.nii.gz"))


def test_sharded_tiles_cli(data_root, tmp_path_factory):
    """--sharded-tiles: the 3D tile grid sharded over all (virtual) devices."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from micformer_tpu.cli.predict import main as predict_main

    run_dir = getattr(test_train_cli, "run_dir", None)
    if run_dir is None:
        pytest.skip("train test did not run")
    out_dir = str(tmp_path_factory.mktemp("shpreds"))
    predict_main([
        "--data", data_root, "--cache", data_root + "/cache",
        "--run-dirs", run_dir, "--out", out_dir,
        "--roi", "16", "--target-shape", "32", "--split", "test",
        "--sharded-tiles",
    ])
    assert glob.glob(os.path.join(out_dir, "*_pred.nii.gz"))


def test_native_geometry_export(tmp_path_factory):
    """--native-geometry must resample the SOFTMAX to the source grid before
    argmax and write the source affine (save_segmentation_nifti_from_softmax
    semantics, MedNeXt segmentation_export.py:27-120) — round-trip with a
    non-identity affine and a source shape != model grid."""
    from micformer_tpu.cli.train import main as train_main
    from micformer_tpu.cli.predict import main as predict_main
    from micformer_tpu.data.synthetic import write_synthetic_dataset
    from micformer_tpu.data.nifti import read_nifti

    affine = np.array([
        [0.0, -1.25, 0.0, 31.0],
        [1.5, 0.0, 0.0, -14.5],
        [0.0, 0.0, 2.0, 7.25],
        [0.0, 0.0, 0.0, 1.0],
    ])
    root = str(tmp_path_factory.mktemp("geomdata"))
    write_synthetic_dataset(root, n_cases=6, shape=(20, 24, 28), seed=11,
                            affine=affine)
    run_dir = str(tmp_path_factory.mktemp("geomrun"))
    train_main([
        "--data", root, "--cache", root + "/cache",
        "--model", "unet3d", "--epochs", "1", "--val", "1",
        "--target-shape", "16", "--run-dir", run_dir,
    ])
    out_dir = str(tmp_path_factory.mktemp("geompreds"))
    predict_main([
        "--data", root, "--cache", root + "/cache",
        "--model", "unet3d", "--run-dirs", run_dir,
        "--out", out_dir, "--roi", "16", "--target-shape", "16",
        "--split", "test", "--native-geometry",
    ])
    preds = glob.glob(os.path.join(out_dir, "*_pred.nii.gz"))
    assert preds
    seg, hdr = read_nifti(preds[0], with_header=True)
    # back at the source grid (z,y,x) = reversed NIfTI (x,y,z) dims
    assert seg.shape == (20, 24, 28)
    # the source world transform survived the round trip (f32 header storage)
    np.testing.assert_allclose(hdr.affine, affine, atol=1e-5)
    # labels are sane: valid range, and the class mix is not degenerate
    assert seg.max() <= 7
    # softmax-resample-then-argmax must equal argmax of the trilinear-resampled
    # probabilities (not a nearest-resized label map): recompute from the
    # saved softmax to pin the semantics
    predict_main([
        "--data", root, "--cache", root + "/cache",
        "--model", "unet3d", "--run-dirs", run_dir,
        "--out", out_dir + "_sm", "--roi", "16", "--target-shape", "16",
        "--split", "test", "--save-softmax",
    ])
    from micformer_tpu.data.image_utils import resize_trilinear

    pid = os.path.basename(preds[0]).replace("_pred.nii.gz", "")
    sm = np.load(os.path.join(out_dir + "_sm", f"{pid}_softmax.npz"))["softmax"]
    expect = np.argmax(resize_trilinear(sm.astype(np.float32), (20, 24, 28)), axis=0)
    agree = np.mean(expect == seg)
    assert agree > 0.999, f"softmax-resample semantics mismatch ({agree:.4f})"


def test_serve_cli(data_root, tmp_path_factory):
    """Serving loop: warm executable + filesystem request queue. Two dropped
    requests must produce segmentations + timing sentinels, then the loop
    must exit on --max-requests."""
    import time

    from micformer_tpu.cli.serve import main as serve_main
    from micformer_tpu.data.nifti import read_nifti

    run_dir = getattr(test_train_cli, "run_dir", None)
    if run_dir is None:
        pytest.skip("train test did not run")
    watch = str(tmp_path_factory.mktemp("watch"))
    out = str(tmp_path_factory.mktemp("served"))
    rng = np.random.default_rng(0)
    for name in ("req_a", "req_b"):
        np.save(os.path.join(watch, name + ".npy"),
                rng.normal(size=(2, 16, 16, 16)).astype(np.float32))
    time.sleep(0.3)  # age past the write-complete mtime window
    serve_main([
        "--run-dir", run_dir, "--watch", watch, "--out", out,
        "--target-shape", "16", "--roi", "16", "--sw-batch-size", "1",
        "--poll", "0.1", "--max-requests", "2",
    ])
    for name in ("req_a", "req_b"):
        seg = read_nifti(os.path.join(out, f"{name}_seg.nii.gz"))
        assert seg.shape == (16, 16, 16)
        stats = json.load(open(os.path.join(out, f"{name}.done")))
        assert stats["latency_s"] > 0
        assert stats["mean_latency_s"] > 0
    assert json.load(open(os.path.join(out, "req_b.done")))["served"] == 2 or \
        json.load(open(os.path.join(out, "req_a.done")))["served"] == 2


def test_export_cli_and_serve_exported(tmp_path_factory):
    """AOT deployment flow: export a trained run to a StableHLO artifact,
    then serve requests from the artifact alone (no checkpoint load)."""
    import time

    from micformer_tpu.cli.export import main as export_main
    from micformer_tpu.cli.serve import main as serve_main
    from micformer_tpu.data.nifti import read_nifti

    run_dir = getattr(test_train_cli, "run_dir", None)
    if run_dir is None:
        pytest.skip("train test did not run")
    art = str(tmp_path_factory.mktemp("artifact"))
    export_main([
        "--run-dir", run_dir, "--out", art,
        "--target-shape", "16", "--roi", "16", "--sw-batch-size", "1",
    ])
    assert os.path.exists(os.path.join(art, "module.jaxexp"))
    meta = json.load(open(os.path.join(art, "meta.json")))
    assert meta["model"] == "unet3d" and meta["output"] == "argmax_uint8"

    watch = str(tmp_path_factory.mktemp("watch2"))
    out = str(tmp_path_factory.mktemp("served2"))
    np.save(os.path.join(watch, "req_x.npy"),
            np.random.default_rng(2)
            .normal(size=(2, 16, 16, 16)).astype(np.float32))
    time.sleep(0.3)
    serve_main([
        "--exported", art, "--watch", watch, "--out", out,
        "--poll", "0.1", "--max-requests", "1",
    ])
    seg = read_nifti(os.path.join(out, "req_x_seg.nii.gz"))
    assert seg.shape == (16, 16, 16)


def test_find_lr_cli(data_root, tmp_path_factory):
    from micformer_tpu.cli.train import main as train_main

    run_dir = str(tmp_path_factory.mktemp("lrsweep"))
    train_main([
        "--data", data_root, "--cache", data_root + "/cache",
        "--model", "unet3d", "--target-shape", "16", "--run-dir", run_dir,
        "--find-lr",
    ])
    log = [json.loads(l) for l in open(os.path.join(run_dir, "log.jsonl"))]
    sweep = next(l["find_lr"] for l in log if "find_lr" in l)
    assert len(sweep["lrs"]) == len(sweep["losses"]) > 10
    assert sweep["lrs"][0] < sweep["lrs"][-1]
