"""End-to-end filter test on generated synthetic data (SURVEY.md §4:
the reference's acceptance methodology — ground truth as oracle, pose +
OSPA map error bounds)."""

import numpy as np
import pytest

from phdslam_tpu.config import SlamConfig
from phdslam_tpu.eval import simdata
from phdslam_tpu.eval.ospa import extract_map_estimate, ospa_distance
from phdslam_tpu.slam import SynthSLAMRunner


@pytest.fixture(scope="module")
def small_world(tmp_path_factory):
    d = tmp_path_factory.mktemp("synthdata")
    sp = simdata.SensorParams(max_range=12.0, std_range=0.25,
                              std_bearing=0.0087, pd=0.95, clutter_rate=5.0)
    mp = simdata.AckermanParams(std_encoder=0.3, std_alpha=0.02,
                                l=1.415, h=0.38, a=1.89, b=0.5)
    landmarks, traj, controls = simdata.generate_world(
        n_landmarks=30, extent=12.0, n_steps=80, dt=0.1, seed=42, mp=mp)
    noisy_controls, measurements = simdata.generate_run(
        landmarks, traj, controls, sp, mp, seed=7)
    simdata.write_run_dir(str(d), noisy_controls, measurements)
    return d, landmarks, traj, sp, mp


def make_cfg(mp, sp, tmpdir):
    return SlamConfig(
        motion_type=1, feature_model=0, filter_type=0,
        n_particles=48, max_features=64, max_measurements=48,
        dt=0.1, max_range=sp.max_range, max_bearing=np.pi,
        std_range=sp.std_range, std_bearing=sp.std_bearing,
        clutter_rate=sp.clutter_rate, pd=sp.pd,
        l=mp.l, h=mp.h, a=mp.a, b=mp.b,
        std_encoder=0.3, std_alpha=0.02,
        birth_weight=0.05, birth_noise_factor=1.5,
        min_separation=4.0, min_feature_weight=1e-5,
        particle_weighting=0, resample_threshold=0.5,
        map_estimate=1, data_directory=str(tmpdir), seed=3,
    )


def test_e2e_ackerman_slam(small_world, tmp_path):
    d, landmarks, traj, sp, mp = small_world
    cfg = make_cfg(mp, sp, d)
    runner = SynthSLAMRunner(cfg, str(d))
    res = runner.run(out_dir=str(tmp_path / "out"))

    T = len(res["est_poses"])
    assert T == 80
    assert not np.isnan(res["est_poses"]).any()

    # pose error: the filter should track the trajectory to within a couple
    # of meters (noise-driven bound, deliberately loose for 48 particles)
    err = np.linalg.norm(res["est_poses"][:, :2] - traj[:T, :2], axis=1)
    assert err[-20:].mean() < 2.5, err[-20:].mean()

    # the filter must beat dead reckoning computed from noisy controls:
    # (sanity that the map update actually corrects the pose)
    assert np.median(err) < 1.5

    # map OSPA at the end: estimated map vs in-FOV-visited landmarks
    out = runner.step_fn  # noqa: F841  (keep runner alive)
    st = runner.state
    max_idx = int(np.argmax(np.asarray(st.log_weight)))
    w = np.asarray(st.map_static.weight[max_idx])
    m = np.asarray(st.map_static.mean[max_idx])
    est_map = extract_map_estimate(w, m)
    # landmarks that were ever within sensor range of the true trajectory
    seen = []
    for lm in landmarks:
        dists = np.linalg.norm(traj[:T, :2] - lm, axis=1)
        if (dists < sp.max_range * 0.9).any():
            seen.append(lm)
    seen = np.asarray(seen)
    ospa, loc, cn = ospa_distance(seen, est_map, p=1, c=5)
    assert ospa < 3.0, (ospa, loc, cn, len(est_map), len(seen))

    # log files written and parseable
    logs = sorted((tmp_path / "out").glob("state_estimate*.log"))
    assert len(logs) == T
    line2 = logs[-1].read_text().splitlines()[1]
    est = np.fromstring(line2, sep=" ")
    assert est.size % 7 == 0 and est.size > 0


def test_e2e_no_measurement_steps(small_world):
    """Steps with empty measurement sets must not perturb weights/maps."""
    d, landmarks, traj, sp, mp = small_world
    cfg = make_cfg(mp, sp, d)
    runner = SynthSLAMRunner(cfg, str(d))
    # empty all measurements after step 10
    runner.mask_dev = runner.mask_dev.at[10:].set(False)
    res = runner.run()
    assert not np.isnan(res["est_poses"]).any()
    # without measurements the map is frozen: weights stay uniform
    lw = np.asarray(runner.state.log_weight)
    np.testing.assert_allclose(lw, -np.log(cfg.n_particles), rtol=1e-3)
