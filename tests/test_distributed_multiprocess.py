"""Multi-process coverage (VERDICT r2 item 6).

Two REAL OS processes run `parallel/distributed.py initialize()` against a
localhost coordinator (the JAX equivalent of the reference's per-rank
`dist.init_process_group('nccl', 'env://')`, nnUNetTrainerV2_DDP.py:67),
build a global mesh spanning both processes, and verify a cross-process psum
and the shard_cases rank split. Guard-skipped where the CPU collective
backend is unavailable.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


_WORKER = r"""
import os, sys
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
import jax
# sitecustomize pins the axon TPU platform at interpreter start; config
# update before first backend use is the reliable switch (tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
from micformer_tpu.parallel.distributed import initialize

initialize()  # reads COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from micformer_tpu.parallel import make_mesh, shard_cases

assert jax.process_count() == 2, jax.process_count()
rank = jax.process_index()

# global mesh over all 4 devices (2 per process)
mesh = make_mesh(data=4, space=1)
sharding = NamedSharding(mesh, P("data"))

# each process contributes its local shard of a length-4 global array
global_shape = (4,)
local = np.asarray([float(rank * 2), float(rank * 2 + 1)], np.float32)
arrs = [jax.device_put(local[i:i+1], d)
        for i, d in enumerate(mesh.local_devices)]
x = jax.make_array_from_single_device_arrays(global_shape, sharding, arrs)

# cross-process collective: global sum must see every process's data
total = jax.jit(lambda v: jnp.sum(v), out_shardings=NamedSharding(mesh, P()))(x)
assert float(total) == 0 + 1 + 2 + 3, float(total)

# reference DDP validation-key sharding rule, now rank-aware for real
keys = shard_cases(list(range(10)))
expect = list(range(10))[rank::2]
assert keys == expect, (keys, expect)

print(f"OK rank={rank} procs={jax.process_count()} devices={len(jax.devices())}")
"""


_TRAIN_WORKER = r"""
import os, sys, tempfile
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
from micformer_tpu.parallel.distributed import initialize

initialize()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from micformer_tpu.parallel import make_mesh
from micformer_tpu.train.trainer import Trainer, TrainConfig
from micformer_tpu import registry

assert jax.process_count() == 2
rank = jax.process_index()
mesh = make_mesh(data=4, space=1)

# identical batch generated in both processes (the reference DDP trains the
# same global batch across ranks, nnUNetTrainerV2_DDP.py:198,204-244)
rng = np.random.default_rng(7)
imgs = rng.normal(size=(4, 2, 16, 16, 16)).astype(np.float32)
labs = rng.integers(0, 3, size=(4, 16, 16, 16)).astype(np.uint8)

def make_trainer(mesh, tag):
    # sgd_nesterov (the nnU-Net DDP preset): its update is LINEAR in the
    # gradient, so cross-process reduction-order noise stays O(eps·lr).
    # Adam's step-1 update is ~±lr·sign(g) — near-zero grads flip sign under
    # a different psum order, which says nothing about trainer correctness.
    cfg = TrainConfig(num_classes=3, augment="none", nan_guard=False,
                      scheduler="constant", optimizer="sgd_nesterov", lr=1e-3,
                      run_dir=tempfile.mkdtemp(prefix=f"xproc_{tag}_"))
    return Trainer(registry.build("unet3d", num_classes=3), cfg, mesh=mesh)

tr = make_trainer(mesh, "mesh")
state = tr.init_state((1, 2, 16, 16, 16))
batch_sh = NamedSharding(mesh, P("data"))
gi = jax.make_array_from_callback(imgs.shape, batch_sh, lambda idx: imgs[idx])
gl = jax.make_array_from_callback(labs.shape, batch_sh, lambda idx: labs[idx])
new_state, metrics = tr.train_step(state, gi, gl, jax.random.key(0))
dist_loss = float(metrics["loss"])
dist_params = jax.tree.map(
    lambda a: np.asarray(a.addressable_data(0)), new_state.params)

# single-device reference: same init seed, same full batch, same rng key
ref = make_trainer(None, "ref")
rstate = ref.init_state((1, 2, 16, 16, 16))
rnew, rmetrics = ref.train_step(rstate, jnp.asarray(imgs), jnp.asarray(labs),
                                jax.random.key(0))
ref_loss = float(rmetrics["loss"])
ref_params = jax.tree.map(np.asarray, rnew.params)

flat_d, _ = jax.tree_util.tree_flatten(dist_params)
flat_r, _ = jax.tree_util.tree_flatten(ref_params)
worst = max(float(np.max(np.abs(d.astype(np.float64) - r.astype(np.float64))))
            for d, r in zip(flat_d, flat_r))
assert abs(dist_loss - ref_loss) < 1e-6, (dist_loss, ref_loss)
assert worst < 1e-6, worst
print(f"TRAIN OK rank={rank} loss={dist_loss:.6f} max_param_delta={worst:.3e}")
"""


class _SlowDS:
    """Picklable dataset with observable per-worker process ids."""

    def __init__(self, n=6, shape=(6, 6, 6)):
        import numpy as np

        rng = np.random.default_rng(0)
        self.images = rng.normal(size=(n, 2) + shape).astype("float32")
        self.labels = rng.integers(0, 3, size=(n,) + shape).astype("uint8")

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return {"image": self.images[i], "label": self.labels[i],
                "patient_id": str(i), "pid": os.getpid()}


def test_process_mode_loader_matches_thread_mode():
    """DataLoader worker_mode='process' (forked preprocessing workers, the
    reference's mp.Process queue capability) must produce bit-identical
    batches in the same order as the serial and thread paths, with fetches
    actually happening in other processes."""
    import numpy as np
    from micformer_tpu.data.loader import DataLoader, make_fetch_pool

    ds = _SlowDS()
    serial = list(DataLoader(ds, batch_size=2, device_put=False))
    proc = list(DataLoader(ds, batch_size=2, device_put=False,
                           workers=3, worker_mode="process"))
    assert len(serial) == len(proc) == 3
    for (si, sl, _), (pi, pl, _) in zip(serial, proc):
        np.testing.assert_array_equal(np.asarray(si), np.asarray(pi))
        np.testing.assert_array_equal(np.asarray(sl), np.asarray(pl))

    pool, fetch_one = make_fetch_pool(ds, 3, "process")
    try:
        pids = {fetch_one(i).result()["pid"] for i in range(len(ds))}
    finally:
        pool.shutdown()
    assert os.getpid() not in pids, "fetches ran in the parent process"


def test_predict_prefetch_process_mode():
    """cli/predict._prefetch_cases with a fork-process pool preserves case
    order and yields every case exactly once."""
    from micformer_tpu.cli.predict import _prefetch_cases

    ds = _SlowDS()
    got = list(_prefetch_cases(ds, range(len(ds)), workers=3,
                               worker_mode="process"))
    assert [i for i, _ in got] == list(range(len(ds)))
    assert all(s["patient_id"] == str(i) for i, s in got)


def _run_two_process(worker_src, timeout=240):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("PYTHONSTARTUP", None)
        env.update({
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(rank),
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", worker_src], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU backend timed out in this environment")
    for rank, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "unimplemented" in out.lower():
            pytest.skip(f"distributed CPU backend unavailable: {out[-200:]}")
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    return outs


def test_two_process_distributed_init(tmp_path):
    outs = _run_two_process(_WORKER)
    for rank, out in enumerate(outs):
        assert f"OK rank={rank} procs=2 devices=4" in out, out


def test_two_process_trainer_train_step(tmp_path):
    """A REAL Trainer.train_step over a mesh whose 'data' axis spans two OS
    processes (the reference's DDP-wrapped training,
    nnUNetTrainerV2_DDP.py:198): the updated params must match the
    single-process result on the same global batch to float tolerance."""
    outs = _run_two_process(_TRAIN_WORKER, timeout=420)
    for rank, out in enumerate(outs):
        assert f"TRAIN OK rank={rank}" in out, out
