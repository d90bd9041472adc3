"""Multi-host initialization.

TPU-native replacement for the reference's process-group bootstrap
(reference: accelerate launch in run.sh + torch DDP NCCL init,
qinco_v1/train_qinco.py:230-245): one call to
``jax.distributed.initialize`` per host process; afterwards
``jax.devices()`` spans the full slice, the mesh covers all chips, and
every collective compiles into the XLA program (ICI intra-slice, DCN
across slices) — no NCCL analog exists or is needed.

Launch pattern (replaces ``accelerate launch --multi_gpu``):

    # on every host of the slice (or via your cluster runner):
    QINCO_COORDINATOR=host0:8476 QINCO_NUM_PROCS=4 QINCO_PROC_ID=$i \
        python run_qinco.py task=train ...

On Cloud TPU the three variables are auto-detected by JAX and none are
required.  Data feeding is per-host: tasks shard row ranges with
``shard=(process_index, process_count)`` (see data/datasets.py), the
direct analog of the reference's rank arithmetic
(search_tasks.py:103-104).
"""

from __future__ import annotations

import os


def maybe_init_distributed(verbose: bool = True) -> bool:
    """Initialize jax.distributed from QINCO_* env vars if present.

    Returns True when multi-host mode was initialized.  Safe to call
    unconditionally before any other jax API use.
    """
    import jax

    coord = os.environ.get("QINCO_COORDINATOR")
    n_proc = os.environ.get("QINCO_NUM_PROCS")
    proc_id = os.environ.get("QINCO_PROC_ID")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(n_proc) if n_proc else None,
        process_id=int(proc_id) if proc_id else None,
    )
    if verbose and jax.process_index() == 0:
        print(
            f"jax.distributed initialized: {jax.process_count()} processes, "
            f"{len(jax.devices())} global devices",
            flush=True,
        )
    return True
