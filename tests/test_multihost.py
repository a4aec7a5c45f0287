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
    # instance-mode sweep over DCN (sequential sampler per process,
    # process-0 chunk broadcast): replicated outputs agree exactly
    assert r0["instance_best"] == r1["instance_best"]
    assert r0["instance_hyp"] == r1["instance_hyp"]
    np.testing.assert_array_equal(
        np.asarray(r0["instance_pose"]), np.asarray(r1["instance_pose"])
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

    # single-process INSTANCE sweep on the same 8-device mesh: the
    # sampler key derivation and per-device streams depend only on the
    # global device index, so 2-process DCN must equal 1-process ICI
    import dataclasses

    import jax.numpy as jnp

    from model_matching_tpu.parallel.sharding import run_sweep_sharded

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
    inst_best, inst_w, _ct, _cs, inst_stats = run_sweep_sharded(
        make_mesh(devices), model, escene, cfg,
        total_bases=16, chunk=8, keep_per_chunk=8, verbose=False,
    )
    assert r0["instance_hyp"] == int(inst_stats["hypotheses"])
    np.testing.assert_allclose(
        r0["instance_best"], float(inst_best), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r0["instance_pose"]), np.asarray(inst_w), atol=1e-5
    )
