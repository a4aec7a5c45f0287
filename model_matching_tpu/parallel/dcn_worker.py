"""Multi-host (DCN) smoke worker: one process of an N-process cluster.

The reference is single-process (SURVEY.md section 2.3); the framework's
multi-host story is jax.distributed over DCN with the SAME shard_map
program used on a single host — the hypothesis mesh just spans processes.
This module is the executable half of that claim: launched N times (once
per process id) with forced virtual CPU devices, it bootstraps the
cluster through parallel.sharding.init_distributed, runs one sharded
matching step plus a sharded sweep chunk over the GLOBAL mesh, and writes
the replicated results as JSON so the launcher (tests/test_multihost.py,
__graft_entry__.dryrun_multihost) can assert every process agreed and the
pose matches a single-process run of the same budget.

Run:
    python -m model_matching_tpu.parallel.dcn_worker \
        --coordinator localhost:12345 --num-processes 2 --process-id 0 \
        --local-devices 4 --out /tmp/p0.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _force_cpu(local_devices: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # drop the ambient TPU tunnel registration (see tests/conftest.py)
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()


def launch(num_processes: int = 2, local_devices: int = 4,
           out_dir: str | None = None, timeout: float = 1500.0):
    """Spawn `num_processes` dcn_worker subprocesses against a fresh local
    coordinator port and return their parsed result dicts (ordered by
    process id). Raises on any worker failure, with that worker's output
    in the message. Used by tests/test_multihost.py and
    __graft_entry__.dryrun_multihost."""
    import socket
    import subprocess
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    out_dir = out_dir or tempfile.mkdtemp(prefix="mm_dcn_")
    outs = [os.path.join(out_dir, f"p{i}.json") for i in range(num_processes)]

    env = dict(os.environ)
    # each worker forces its own CPU platform + virtual device count; the
    # parent's XLA_FLAGS (e.g. the 8-device test mesh) must not leak in
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""

    procs = []
    for i in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "model_matching_tpu.parallel.dcn_worker",
             "--coordinator", f"localhost:{port}",
             "--num-processes", str(num_processes),
             "--process-id", str(i),
             "--local-devices", str(local_devices),
             "--out", outs[i]],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    try:
        for p in procs:
            logs.append(p.communicate(timeout=timeout)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, p in enumerate(procs):
        if p.returncode != 0:
            raise RuntimeError(
                f"dcn worker {i} failed (rc={p.returncode}):\n"
                + logs[i][-4000:]
            )
    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="dcn_worker")
    p.add_argument("--coordinator", required=True,
                   help="host:port of process 0's coordinator service")
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--out", required=True, help="result JSON path")
    a = p.parse_args(argv)

    _force_cpu(a.local_devices)

    import jax
    import numpy as np

    from model_matching_tpu.parallel.sharding import (
        init_distributed, make_mesh, matching_step_sharded, run_sweep_sharded,
    )

    nproc = init_distributed(
        coordinator_address=a.coordinator,
        num_processes=a.num_processes,
        process_id=a.process_id,
    )
    assert nproc == a.num_processes, (nproc, a.num_processes)
    assert jax.process_count() == a.num_processes
    n_global = len(jax.devices())
    assert n_global == a.num_processes * a.local_devices, n_global

    # the synthetic model/scene pair every entry-point dry run uses; built
    # identically in every process (deterministic from the seed), which is
    # what makes the fully-replicated in_specs of the shard_map program
    # valid across hosts
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from __graft_entry__ import _synthetic_setup

    model, scene, cfg = _synthetic_setup(
        num_model=128, num_scene=512, num_bases=2 * n_global,
        max_pairs=256, max_congruent=16,
    )
    mesh = make_mesh(jax.devices())
    best, pose, n_valid = matching_step_sharded(
        mesh, model, scene, cfg, jax.random.PRNGKey(0)
    )

    best_lcp, best_w, cl_t, cl_s, stats = run_sweep_sharded(
        mesh, model, scene, cfg,
        total_bases=2 * n_global, chunk=n_global, keep_per_chunk=n_global,
        verbose=False,
    )

    # instance-mode sweep over the SAME multi-process mesh: the
    # sequential flood-fill sampler runs per process and process 0's
    # chunk state is broadcast (run_sweep_sharded docstring) — the DCN
    # counterpart of the reference's hardest path (stocs.cpp:559-751)
    import dataclasses

    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    h, w = 24, 32
    n_scene = scene.pos.shape[0]
    flat = rng.choice(h * w, size=n_scene, replace=False)
    pixel = np.stack([flat // w, flat % w], axis=-1).astype(np.int32)
    edge_free = np.ones((h, w), bool)
    edge_free[:, w // 2] = False
    escene = dataclasses.replace(
        scene,
        pixel=jnp.asarray(pixel),
        edge_prob=jnp.asarray((pixel[:, 1] == w // 2).astype(np.float32)),
        edge_free=jnp.asarray(edge_free),
        has_edge=True,
    )
    inst_best, inst_w, _ict, _ics, inst_stats = run_sweep_sharded(
        mesh, model, escene, cfg,
        total_bases=2 * n_global, chunk=n_global, keep_per_chunk=n_global,
        verbose=False,
    )

    out = {
        "process_id": a.process_id,
        "process_count": int(jax.process_count()),
        "global_devices": n_global,
        "step_best": float(best),
        "step_pose": np.asarray(pose).tolist(),
        "step_valid": int(n_valid),
        "sweep_best": float(best_lcp),
        "sweep_pose": np.asarray(best_w).tolist(),
        "sweep_clusters": len(cl_s),
        "instance_best": float(inst_best),
        "instance_pose": np.asarray(inst_w).tolist(),
        "instance_hyp": int(inst_stats["hypotheses"]),
    }
    with open(a.out, "w") as f:
        json.dump(out, f)
    print(f"dcn_worker[{a.process_id}] ok: step_best={out['step_best']:.3f} "
          f"sweep_best={out['sweep_best']:.3f} devices={n_global}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
