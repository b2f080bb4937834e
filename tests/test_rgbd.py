"""RGBD mode (SensorStrategy=1) end-to-end — the mode the reference declares
but leaves TODO (Tracker.cpp:228); completed here via the depth -> virtual
disparity unification (doc/Stereo&&RGBDBAOptimization.docx §1)."""

import numpy as np

from visfs_tpu.io.sim import ate_rmse, generate_sequence
from visfs_tpu.slam.system import System


def test_rgbd_vo_tracks_trajectory():
    seq = generate_sequence(n_frames=10, n_points=400, seed=21,
                            motion="forward", with_depth=True)
    cam = seq.camera
    sys_ = System({
        "System/SensorStrategy": 1,
        "Tracker/MaxFeatures": 150,
        "Tracker/MinDistance": 16,
        "Optimizer/Iterations": 10,
    })
    sys_.init(
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        float(cam.baseline), width=cam.width, height=cam.height,
    )
    outs = sys_.run_sequence(seq.stamps, seq.left, seq.depth)
    assert not any(bool(o.lost) for o in outs[1:])
    est = np.stack([np.asarray(o.pose) for o in outs])
    ate = ate_rmse(est, seq.poses)
    assert ate < 0.02, ate


def test_rgbd_rejects_invalid_depth():
    """Features on zero-depth pixels must not enter the map."""
    seq = generate_sequence(n_frames=4, n_points=300, seed=22,
                            with_depth=True)
    cam = seq.camera
    depth = np.array(seq.depth)
    depth[:, :, : cam.width // 2] = 0.0  # kill left half depth
    sys_ = System({
        "System/SensorStrategy": 1,
        "Tracker/MaxFeatures": 150,
        "Tracker/MinDistance": 16,
    })
    sys_.init(
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        float(cam.baseline), width=cam.width, height=cam.height,
    )
    sys_.run_sequence(seq.stamps, seq.left, depth)
    st = sys_.state
    feats = np.asarray(st.features.valid)
    uv = np.asarray(st.features.uv)
    obs = np.asarray(st.features.obs_mask)
    # any observed feature position must be in the right half
    observed = obs & feats[:, None]
    assert (uv[observed][:, 0] >= cam.width // 2 - 1).all()
