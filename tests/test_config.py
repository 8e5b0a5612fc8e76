import pytest

from pdf_toolkit_ray import UserError
from pdf_toolkit_ray.config import ExtractConfig, deep_merge, load_config, validate_keys


def test_defaults_valid():
    cfg = ExtractConfig()
    assert cfg.split_ratio == 1.25
    assert cfg.outer_margin_mode == "off"


@pytest.mark.parametrize(
    "overrides",
    [
        {"density_threshold": 1.5},
        {"min_area_frac": 0.0},
        {"symmetry_strategy": "diagonal"},
        {"outer_margin_mode": "maybe"},
        {"bp_min_run": 0},
        {"salt_width": -1},
        {"bp_release_frac": 0.9, "bp_enter_cutoff": 0.5},
    ],
)
def test_validation_rejects(overrides):
    with pytest.raises(UserError):
        ExtractConfig(**overrides)


def test_unknown_keys_rejected():
    with pytest.raises(UserError, match="Unknown config keys: nope"):
        validate_keys({"nope": 1})


def test_deep_merge_override_wins():
    assert deep_merge({"a": 1, "b": {"c": 2, "d": 3}}, {"b": {"c": 9}}) == {
        "a": 1,
        "b": {"c": 9, "d": 3},
    }


def test_yaml_precedence(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text("extract:\n  split_ratio: 2.0\n  pad_nodes: 3\n")
    cfg = load_config(str(path), overrides={"pad_nodes": 7})
    assert cfg.split_ratio == 2.0  # YAML beats default
    assert cfg.pad_nodes == 7      # explicit override beats YAML
    assert cfg.tag_cost == 4.0     # default survives


def test_yaml_root_section(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text("split_ratio: 1.5\n")
    assert load_config(str(path)).split_ratio == 1.5


def test_config_hash_ignores_execution_knobs():
    a = ExtractConfig(batch_size=10)
    b = ExtractConfig(batch_size=999)
    c = ExtractConfig(density_threshold=0.6)
    assert a.config_hash() == b.config_hash()
    assert a.config_hash() != c.config_hash()
