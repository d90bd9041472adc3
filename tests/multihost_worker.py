"""Worker process for the 2-process multi-host regression test.

Launched by tests/test_multihost.py as ``python multihost_worker.py
<pid> <nproc> <port> <tmpdir>``; each process owns 4 virtual CPU
devices, so the global mesh spans 8.  Exercises the real multi-host
path end to end: ``jax.distributed.initialize`` → process-aware
``shard_batch``/``replicate`` → jitted train steps with XLA-compiled
gradient reduction → rank-sliced DB encode writing per-rank part files
(the reference's DDP train + sharded-encode story,
qinco/qinco_tasks.py:338-345, search_tasks.py:85-137).
"""

import json
import os
import sys

pid, nproc, port, tmpdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402

from qinco_tpu.config import load_config  # noqa: E402
from qinco_tpu.models import QincoSpec, init_model_state, init_params  # noqa: E402
from qinco_tpu.parallel.mesh import make_mesh, replicate, shard_batch  # noqa: E402
from qinco_tpu.train.train_step import build_optimizer, make_train_step  # noqa: E402

assert jax.process_count() == nproc and len(jax.devices()) == 4 * nproc

# ---- distributed training parity -----------------------------------------
spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
params = init_params(jax.random.PRNGKey(0), spec)
mstate = init_model_state(spec)
cfg = load_config({"K": spec.K, "M": spec.M, "lr": 1e-2})
tx = build_optimizer(cfg, params, spec)
opt_state = tx.init(params)
step = make_train_step(spec, tx, grad_clip=0.1)

mesh = make_mesh()
params = replicate(mesh, params)
mstate = replicate(mesh, mstate)
opt_state = replicate(mesh, opt_state)

# Global batch 64 = 2 hosts x 32 local rows (contiguous per-host slices,
# the data-layer shard contract).
data = np.random.default_rng(42).normal(size=(64, spec.D)).astype(np.float32)
local = data[pid * 32 : (pid + 1) * 32]

losses = []
for _ in range(3):
    xb = shard_batch(mesh, local)
    wb = shard_batch(mesh, np.ones((32,), np.float32))
    params, opt_state, mstate, out = step(params, opt_state, mstate, xb, wb)
    losses.append(float(out.total_loss))

if pid == 0:
    final = jax.device_get(params)
    np.savez(
        os.path.join(tmpdir, "mh_params.npz"),
        **{f"leaf{i}": np.asarray(a) for i, a in enumerate(jax.tree.leaves(final))},
    )
    with open(os.path.join(tmpdir, "mh_losses.json"), "w") as f:
        json.dump(losses, f)

# ---- rank-sliced DB encode with part files (EncodeDBTask) ----------------
from qinco_tpu.tasks.base import get_task  # noqa: E402

enc_cfg = load_config(
    {
        "task": "encode",
        "db": os.path.join(tmpdir, "db.npy"),
        "output": os.path.join(tmpdir, "enc.npz"),
        "batch": 16,
        "K": spec.K, "M": spec.M, "L": spec.L, "de": spec.de,
        "dh": spec.dh, "A": spec.A, "B": spec.B,
        "seed": 0,
    }
)
task = get_task("encode")(enc_cfg)
task.run()
print(f"worker {pid} done", flush=True)
