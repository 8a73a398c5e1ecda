"""Worker process for the 2-process multi-host integration test.

Usage: python -m tests.multihost_worker <coordinator> <num_procs> <pid> <outdir>

Each process: jax.distributed.initialize on CPU → run the restoration
pipeline over a shared tiny dataset (images stride across processes) →
gather a scalar across hosts → write a JSON report.
"""

import json
import os
import sys


def main():
    coordinator, n_procs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from osmosis_tpu.parallel import multihost as MH

    MH.initialize(coordinator, n_procs, pid)
    assert jax.process_count() == n_procs, jax.process_count()
    assert jax.process_index() == pid

    # stride ownership
    sl = MH.host_slice(5)
    assert sl == list(range(pid, 5, n_procs)), sl

    # run the real pipeline: both processes execute run_restoration over the
    # same config; the per-image loop strides by process index
    from osmosis_tpu.pipelines import run_restoration

    cfg_path = os.path.join(outdir, "cfg.yaml")
    run_dir = run_restoration(cfg_path, save_dir_override=os.path.join(outdir, "results"))

    # cross-host gather of a scalar metric
    import numpy as np

    gathered = MH.gather_scalars({"rank": float(pid), "n_owned": float(len(sl))})
    MH.barrier("done")

    report = {
        "pid": pid,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "run_dir": run_dir,
        "gathered_ranks": np.asarray(gathered["rank"]).tolist(),
        "outputs": sorted(os.listdir(os.path.join(run_dir, "single_images", "rgb"))),
        "log_files": sorted(
            f for f in os.listdir(run_dir) if f.startswith("log")
        ),
    }
    with open(os.path.join(outdir, f"report_{pid}.json"), "w") as f:
        json.dump(report, f)
    print("WORKER_OK", pid)


if __name__ == "__main__":
    main()
