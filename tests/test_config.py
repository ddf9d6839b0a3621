"""Config overlay semantics tests (reference apps/main.cpp:61-103)."""

from visionx_slam_tpu.utils.config import (
    SystemConfig,
    apply_config_if_default,
    config_to_dict,
    parse_config_file,
)


def test_parse_config_file(tmp_path):
    p = tmp_path / "c.cfg"
    p.write_text(
        "# comment line\n"
        "min_matches=33   # trailing comment\n"
        "  min_parallax = 7.5  \n"
        "enable_culling=true\n"
        "not_a_kv_line\n"
        "\n"
        "sequence=rgbd_dataset_freiburg2_desk\n"
    )
    kv = parse_config_file(str(p))
    assert kv == {
        "min_matches": "33",
        "min_parallax": "7.5",
        "enable_culling": "true",
        "sequence": "rgbd_dataset_freiburg2_desk",
    }


def test_cli_wins_over_config(tmp_path):
    cfg = SystemConfig()
    kv = {"min_matches": "33", "min_inliers": "44", "sequence": "s2"}
    apply_config_if_default(cfg, kv, cli_set={"min_inliers"})
    assert cfg.tracking.min_matches == 33  # config applies where CLI was default
    assert cfg.tracking.min_inliers == 15  # CLI-set flag: config must not override
    assert cfg.sequence == "s2"


def test_unknown_key_warns_not_raises(caplog):
    cfg = SystemConfig()
    apply_config_if_default(cfg, {"bogus": "1"}, set())
    assert any("Unknown config key" in r.message for r in caplog.records)


def test_bool_coercion():
    cfg = SystemConfig()
    apply_config_if_default(cfg, {"enable_culling": "true",
                                  "enable_local_ba": "false"}, set())
    assert cfg.tracking.enable_culling is True
    assert cfg.tracking.enable_local_ba is False


def test_reference_flag_names_complete():
    # every one of the 23 reference gflags (apps/main.cpp:15-47) must exist
    names = set(config_to_dict(SystemConfig()).keys())
    reference_flags = {
        "config", "dataset_dir", "sequence", "viewer_thread", "viewer_loop_ms",
        "min_matches", "min_inliers", "min_keyframe_inliers", "min_parallax",
        "max_reproj_error", "min_keyframe_gap", "enable_culling",
        "min_landmark_observations", "min_landmarks_for_culling",
        "min_keyframes_for_culling", "max_keyframes",
        "kf_min_shared_observations", "kf_redundant_ratio",
        "landmark_max_reproj_error", "triangulation_max_reproj_error",
        "triangulation_min_angle_deg", "enable_local_ba", "ba_window_size",
        "ba_iterations", "ba_min_pose_observations",
        "ba_min_point_observations", "ba_huber_delta", "ba_max_reproj_error",
    }
    missing = reference_flags - names
    assert not missing, f"missing reference flags: {missing}"


def test_cli_parser_roundtrip():
    from visionx_slam_tpu.cli.main import parse_config

    cfg = parse_config([
        "--dataset_dir", "/data", "--sequence", "seq1",
        "--min_matches", "42", "--enable_local_ba", "false",
        "--max_frames", "10",
    ])
    assert cfg.dataset_dir == "/data"
    assert cfg.tracking.min_matches == 42
    assert cfg.tracking.enable_local_ba is False
    assert cfg.max_frames == 10
