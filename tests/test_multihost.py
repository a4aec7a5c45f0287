"""Multi-host (DCN) execution for real: 2 OS processes, 4 virtual CPU
devices each, bootstrapped through jax.distributed.initialize and running
the SAME shard_map programs the single-host path uses — the sharded
matching step and a sharded sweep — over the global 8-device mesh.

This is the executable proof of SURVEY.md section 2.3's multi-host claim
(ICI within a host, DCN across hosts): jax.process_count() == 2 in every
worker, both workers see identical replicated results, and the pose
equals a single-process run of the same budget (the mesh has the same 8
devices either way; how they map to processes must not change the
program's value).
"""

import numpy as np

from model_matching_tpu.parallel.dcn_worker import launch


def test_two_process_dcn_matches_single_process(tmp_path):
    results = launch(num_processes=2, local_devices=4,
                     out_dir=str(tmp_path))
    r0, r1 = results

    # the cluster actually formed: 2 processes, 8 global devices
    assert r0["process_count"] == 2 and r1["process_count"] == 2
    assert r0["global_devices"] == 8 and r1["global_devices"] == 8

    # the replicated outputs agree across processes exactly
    assert r0["step_best"] == r1["step_best"]
    assert r0["step_valid"] == r1["step_valid"]
    np.testing.assert_array_equal(
        np.asarray(r0["step_pose"]), np.asarray(r1["step_pose"])
    )
    assert r0["sweep_best"] == r1["sweep_best"]
    np.testing.assert_array_equal(
        np.asarray(r0["sweep_pose"]), np.asarray(r1["sweep_pose"])
    )

    # single-process reference run on this process's own 8-device mesh
    # (conftest forces xla_force_host_platform_device_count=8): identical
    # program, identical per-device keys -> identical best pose
    import jax

    from __graft_entry__ import _synthetic_setup
    from model_matching_tpu.parallel.sharding import (
        make_mesh, matching_step_sharded,
    )

    devices = jax.devices()
    assert len(devices) == 8
    model, scene, cfg = _synthetic_setup(
        num_model=128, num_scene=512, num_bases=16,
        max_pairs=256, max_congruent=16,
    )
    best, pose, n_valid = matching_step_sharded(
        make_mesh(devices), model, scene, cfg, jax.random.PRNGKey(0)
    )
    assert r0["step_valid"] == int(n_valid)
    np.testing.assert_allclose(r0["step_best"], float(best), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r0["step_pose"]), np.asarray(pose), atol=1e-5
    )
