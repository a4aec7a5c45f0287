"""Dataset preset sanity: the mm-scale LINEMOD and the packed (edge-map)
pipelines load real fixtures with sane scales — the fast counterpart of the
full fixture runs exercised on hardware."""

import os

import numpy as np
import pytest

from model_matching_tpu.config import get_preset

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not present"
)


def test_presets_match_reference_readme():
    ycb = get_preset("ycb")
    assert ycb.match.camera.fx == pytest.approx(1066.778)
    assert ycb.match.depth_scale == pytest.approx(1 / 10000)
    lm = get_preset("linemod")
    assert lm.preprocess.voxel_size == 10.0
    assert lm.preprocess.model_scale == pytest.approx(1 / 1000)
    assert lm.match.depth_scale == pytest.approx(1 / 1000)
    pk = get_preset("packed")
    assert pk.preprocess.voxel_size == 0.005
    assert pk.match.depth_scale == pytest.approx(1 / 8000)
    with pytest.raises(KeyError):
        get_preset("nope")


@needs_ref
def test_linemod_scene_loads_at_meter_scale():
    from model_matching_tpu.scene import load_scene

    cfg = get_preset("linemod").match
    scene = load_scene(
        f"{REF}/examples/linemod/rgb.png",
        f"{REF}/examples/linemod/depth.png",
        f"{REF}/examples/linemod/probability_maps/obj_06.png",
        None, cfg,
    )
    v = np.asarray(scene.valid)
    assert 1000 < v.sum() < cfg.max_scene_points
    pos = np.asarray(scene.pos)[v] + np.asarray(scene.centroid)
    # mm-scale depth converted to meters: the table scene sits ~1 m away
    assert 0.3 < np.median(pos[:, 2]) < 2.0
    assert not scene.has_edge


@needs_ref
def test_packed_scene_has_edge_map():
    from model_matching_tpu.scene import load_scene

    cfg = get_preset("packed").match
    scene = load_scene(
        f"{REF}/examples/packed/rgb.png",
        f"{REF}/examples/packed/depth.png",
        f"{REF}/examples/packed/probability_maps/dove.png",
        f"{REF}/examples/packed/probability_maps/edge.png",
        cfg,
    )
    assert scene.has_edge
    ef = np.asarray(scene.edge_free)
    assert 0.05 < ef.mean() < 0.99  # real edge structure, not all-0/all-1
    v = np.asarray(scene.valid)
    assert v.sum() > 500
    # edge-pruned points exist (prob stays, edge_prob == 1 marks them)
    assert (np.asarray(scene.edge_prob)[v] == 1.0).any()


@needs_ref
def test_load_scene_multi_per_object_probs():
    from model_matching_tpu.scene import load_scene_multi

    cfg = get_preset("ycb").match
    # same map twice: per-object vectors must agree and match the
    # single-object loader's output
    pack, probs = load_scene_multi(
        f"{REF}/examples/ycb/rgb.png",
        f"{REF}/examples/ycb/depth.png",
        [f"{REF}/examples/ycb/probability_maps/024_bowl.png"] * 2,
        None, cfg,
    )
    probs = np.asarray(probs)
    assert probs.shape[0] == 2
    np.testing.assert_array_equal(probs[0], probs[1])
    np.testing.assert_array_equal(np.asarray(pack.class_prob), probs[0])
    v = np.asarray(pack.valid)
    assert (probs[0][v] > 0).all()  # union validity == per-object here
