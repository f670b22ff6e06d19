"""CLI flag -> config-override semantics (captra_tpu.cli.args).

The reference applies CLI slash-path overrides onto the merged YAML dict
(configs/config.py:8-18); the subtlety covered here is explicit booleans:
`--track_cfg/gt_label false` must REACH the config (to turn off a
YAML-enabled key), while untouched flags and action="store_true" defaults
must not.
"""
import argparse

from captra_tpu.cli.args import add_args, config_overrides
from captra_tpu.config import get_config


def _parse(argv):
    return add_args(argparse.ArgumentParser()).parse_args(argv)


def test_unset_flags_produce_no_overrides():
    out = config_overrides(_parse([]))
    assert out == {}


def test_explicit_false_boolean_is_an_override():
    args = _parse(["--track_cfg/conf_weighted_delta", "false",
                   "--track_cfg/gt_label", "false"])
    out = config_overrides(args)
    assert out["track_cfg/conf_weighted_delta"] is False
    assert out["track_cfg/gt_label"] is False


def test_store_true_flags_never_leak_into_overrides():
    args = _parse(["--save", "--no_eval"])
    assert config_overrides(args) == {}


def test_quality_profile_sym_preset():
    # sym rigid (NOCS bottle): absolute fit + contracting forward refinement
    cfg = get_config("config_track.yml", {
        "obj_config": "obj_info_nocs.yml", "obj_category": "1",
        "track_cfg/quality_profile": "best"})
    assert cfg.obj.sym
    assert cfg.track.quality_profile == "best"
    assert cfg.track.rot_fit == "npcs"
    assert cfg.track.refine_iters == 3
    assert cfg.track.refine_mode == "forward"


def test_quality_profile_articulated_fences_refinement():
    # articulated (multi-part): npcs alone (refinement measurably hurts,
    # EVIDENCE.md laptop 11.8 -> 16.5)
    cfg = get_config("config_track.yml", {
        "obj_config": "obj_info_sapien.yml", "obj_category": "laptop",
        "track_cfg/quality_profile": "best"})
    assert not cfg.obj.sym
    assert cfg.obj.num_parts > 1
    assert cfg.track.rot_fit == "npcs"
    assert cfg.track.refine_iters == 1


def test_quality_profile_nonsym_rigid_refines():
    # non-sym rigid (1 part): refinement contracts (runs/q4_n3_r5
    # npcs 14.45 -> npcs+refine3 11.57), so the preset keeps it
    cfg = get_config("config_track.yml", {
        "obj_config": "obj_info_nocs.yml", "obj_category": "3",
        "track_cfg/quality_profile": "best"})
    assert not cfg.obj.sym
    assert cfg.obj.num_parts == 1
    assert cfg.track.rot_fit == "npcs"
    assert cfg.track.refine_iters == 3
    assert cfg.track.refine_mode == "forward"


def test_quality_profile_scissors_carveout_refines():
    # scissors is the measured multi-part exception: refine x3 beat
    # no-refine on all 4 eval draws (EVIDENCE.md round-5 seed study)
    cfg = get_config("config_track.yml", {
        "obj_config": "obj_info_sapien.yml", "obj_category": "scissors",
        "track_cfg/quality_profile": "best"})
    assert cfg.obj.num_parts > 1
    assert cfg.track.rot_fit == "npcs"
    assert cfg.track.refine_iters == 3
    assert cfg.track.refine_mode == "forward"


def test_quality_profile_glasses_fences_refinement():
    # 3-part glasses stays fenced (refine hurts: 9.56 -> 10.66 on r15 nets)
    cfg = get_config("config_track.yml", {
        "obj_config": "obj_info_sapien.yml", "obj_category": "glasses",
        "track_cfg/quality_profile": "best"})
    assert cfg.obj.num_parts > 1
    assert cfg.track.rot_fit == "npcs"
    assert cfg.track.refine_iters == 1


def test_quality_profile_explicit_flags_win():
    args = _parse(["--quality_profile", "best",
                   "--track_cfg/refine_iters", "1",
                   "--track_cfg/rot_fit", "fused"])
    cfg = get_config("config_track.yml", {
        **config_overrides(args),
        "obj_config": "obj_info_nocs.yml", "obj_category": "1"})
    assert cfg.track.rot_fit == "fused"      # explicit beats preset
    assert cfg.track.refine_iters == 1


def test_quality_profile_default_is_reference():
    cfg = get_config("config_track.yml", {
        "obj_config": "obj_info_nocs.yml", "obj_category": "1"})
    assert cfg.track.quality_profile == "reference"
    assert cfg.track.rot_fit == "delta"
    assert cfg.track.refine_iters == 1


def test_quality_profile_rejects_unknown():
    import pytest
    with pytest.raises(ValueError):
        get_config("config_track.yml",
                   {"track_cfg/quality_profile": "nope"})


def test_explicit_false_disables_yaml_enabled_key():
    # config_track.yml leaves conf_weighted_delta off; enable it via one
    # override and confirm a False override wins over a True one end to end
    on = get_config("config_track.yml",
                    {"track_cfg/conf_weighted_delta": True})
    assert on.track.conf_weighted_delta is True
    off_args = _parse(["--track_cfg/conf_weighted_delta", "false"])
    off = get_config("config_track.yml", config_overrides(off_args))
    assert off.track.conf_weighted_delta is False
