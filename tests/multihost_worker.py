"""Worker process for the multi-host integration tests.

Usage:
  python -m tests.multihost_worker <coordinator> <num_procs> <pid> <outdir> \
      [mode] [crash_after]

Modes:
  restore       (default) — run_restoration over cfg.yaml in <outdir>
  resume        — run_restoration over cfg_resume.yaml (resume: True)
  prior         — run_prior_sampling over prior_cfg.yaml
  restore_crash — like restore, but EVERY rank hard-exits (os._exit) right
                  after saving its first <crash_after> images — a mid-run
                  job kill leaving partial outputs on disk for the resume
                  contract to pick up (no partial PNG writes: the exit fires
                  after the save completes)
  seg_crash     — like restore, but relies on the chainjournal fault
                  injection (OSMOSIS_TPU_CRASH_AFTER_SEGMENTS in the env) to
                  die MID-CHAIN at a segment boundary; the injected
                  RuntimeError is converted to os._exit(17) so the JAX
                  distributed runtime can't hang on teardown
  clean         — like restore but into <outdir>/results_clean with its own
                  report files: the uninterrupted control run for bitwise
                  comparison against a crash-then-resume run

Each process: jax.distributed.initialize on CPU → run the pipeline (images /
sample indices stride across processes into one shared run dir) → gather a
scalar across hosts → write a JSON report.
"""

import json
import os
import sys


def main():
    coordinator, n_procs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "restore"
    crash_after = int(sys.argv[6]) if len(sys.argv) > 6 else 0
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

    import numpy as np

    if mode == "prior":
        from osmosis_tpu.pipelines import run_prior_sampling

        run_dir = run_prior_sampling(
            os.path.join(outdir, "prior_cfg.yaml"),
            save_dir_override=os.path.join(outdir, "results_prior"),
        )
        gathered = MH.gather_scalars({"rank": float(pid)})
        MH.barrier("done")
        report = {
            "pid": pid,
            "process_count": jax.process_count(),
            "global_devices": jax.device_count(),
            "run_dir": run_dir,
            "gathered_ranks": np.asarray(gathered["rank"]).tolist(),
            "outputs": sorted(
                os.listdir(os.path.join(run_dir, "single_images", "rgb"))
            ),
        }
        with open(os.path.join(outdir, f"report_prior_{pid}.json"), "w") as f:
            json.dump(report, f)
        print("WORKER_OK", pid)
        return

    if mode == "restore_crash":
        # hard-kill this rank after its first crash_after saved images —
        # exits INSIDE the per-image save path, after the PNGs are complete
        from osmosis_tpu.pipelines import restore as R

        real_save = R._save_osmosis_outputs
        count = {"n": 0}

        def crashing_save(*a, **k):
            real_save(*a, **k)
            count["n"] += 1
            if count["n"] >= crash_after:
                print(f"WORKER_CRASH {pid} after {count['n']} images",
                      flush=True)
                os._exit(17)

        R._save_osmosis_outputs = crashing_save

    from osmosis_tpu.pipelines import run_restoration

    cfg_name = "cfg_resume.yaml" if mode == "resume" else "cfg.yaml"
    cfg_path = os.path.join(outdir, cfg_name)
    results_name = "results_clean" if mode == "clean" else "results"
    if mode == "seg_crash":
        try:
            run_restoration(
                cfg_path, save_dir_override=os.path.join(outdir, "results")
            )
        except RuntimeError as e:
            if "injected crash" in str(e):
                print(f"WORKER_CRASH {pid} (segment boundary)", flush=True)
                os._exit(17)
            raise
        # the OTHER rank hit the injection first and this rank never reached
        # its own boundary quota — still a mid-job death for the test's
        # purposes, but it must not report success
        print(f"WORKER_CRASH {pid} (ran to completion before injection)",
              flush=True)
        os._exit(18)
    run_dir = run_restoration(
        cfg_path, save_dir_override=os.path.join(outdir, results_name)
    )

    # cross-host gather of a scalar metric
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
    suffix = {"resume": "_resume", "clean": "_clean"}.get(mode, "")
    with open(os.path.join(outdir, f"report{suffix}_{pid}.json"), "w") as f:
        json.dump(report, f)
    print("WORKER_OK", pid)


if __name__ == "__main__":
    main()
