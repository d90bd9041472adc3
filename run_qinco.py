#!/usr/bin/env python
"""qinco-tpu CLI.

Usage mirrors the reference's Hydra entry point (reference: run.py:34-45):

    python run_qinco.py task=train model_args=qinco2-S db=bigann1M \\
        output=models/qinco2-S.npz ds.loop=500000

Any config key accepts a dotted ``key=value`` override; ``model_args=``
selects a preset from qinco_tpu/configs/model_args/.
"""

import os
import sys


def _maybe_reexec_cpu(argv):
    """cpu=true must take effect before any jax import; when a TPU PJRT
    plugin was injected at interpreter start (sitecustomize), the only
    reliable way is re-run in a subprocess with a cleaned environment.

    Returns the subprocess's exit code when it ran, else None — main()
    must return (not raise) so programmatic callers such as
    scripts/scale_regression.py survive the detour."""
    if "cpu=true" not in argv or os.environ.get("_QINCO_CPU_REEXEC"):
        return None
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        return None
    import subprocess

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_QINCO_CPU_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # Re-run this file, not sys.argv[0]: main() may have been called from
    # another driver whose argparse would choke on the forwarded task args.
    return subprocess.call(
        [sys.executable, os.path.abspath(__file__), *argv], env=env
    )


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if any(a in ("-h", "--help") for a in argv):
        print(__doc__)
        return 0
    rc = _maybe_reexec_cpu(argv)
    if rc is not None:
        return rc
    from qinco_tpu.config import load_config
    from qinco_tpu.parallel.distributed import maybe_init_distributed
    from qinco_tpu.tasks import get_task

    maybe_init_distributed()
    cfg = load_config(argv)
    if cfg.task is None:
        raise SystemExit(
            "Please specify a task (train, eval, ...) using 'task=<name>'"
        )
    task = get_task(cfg.task)(cfg)
    print(f"====================== RUNNING TASK {cfg.task}", flush=True)
    task.run()
    print("Task done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
