"""Config system tests (C1: src/properties.cpp semantics)."""
import pytest

from fourd_ray_tracing_tpu.utils.config import (
    AppConfig,
    ConfigError,
    Properties,
    parse_properties_text,
)

SAMPLE = """
# comment line
 show_additional_windows = true
 window.main.title = Main section # trailing comment
 window.main.width = 850
 window.main.cell_size = 7
 window.additional.width = 600
 window.additional.cell_size = 10
 ray_tracing.samples = 100
 ray_tracing.reflections_amount = 4
 ray_tracing.small_indent = 0.005
 camera.focus_to_matrix_distance = 1.5
 camera.matrix_height = 2.0
 camera.initial_position.x = 0.0
 camera.initial_position.y = -2.0
 camera.initial_position.z = 0.0
 camera.initial_position.w = 0.0
 camera.initial_position.fi = 0.0
 camera.initial_position.te = 0.0
 camera.initial_position.psi = 0.0
 mouse_border_width = 15
 constrain_psi_range = true
 psi_range_radius = 45.0
 mouse_sensitivity = 0.005
 wheel_sensitivity = 0.1
 movement_speed = 3.0
 light_to_color_conversion_coefficient = 1.0
 max_fps = 60
"""


def test_parse_values_and_comments():
    m = parse_properties_text(SAMPLE)
    assert m["window.main.title"] == "Main section"
    assert m["window.main.width"] == "850"
    assert "# comment line" not in m


def test_typed_getters():
    p = Properties(parse_properties_text(SAMPLE))
    assert p.get_bool("show_additional_windows") is True
    assert p.get_unsigned_int("window.main.width") == 850
    assert p.get_float("camera.initial_position.y") == -2.0
    assert p.get_string_or_null("nonexistent") is None


def test_missing_key_raises():
    p = Properties({})
    with pytest.raises(ConfigError):
        p.get_string("nope")
    with pytest.raises(ConfigError):
        Properties({"k": "notanint"}).get_int("k")
    with pytest.raises(ConfigError):
        Properties({"k": "maybe"}).get_bool("k")


def test_app_config_roundtrip(tmp_path):
    f = tmp_path / "properties.txt"
    f.write_text(SAMPLE)
    cfg = AppConfig.load(f)
    assert cfg.samples == 100
    assert cfg.reflections_amount == 4
    assert cfg.main_window.cells_width == 850 // 7
    # height = width / GOLDEN, cell-quantized resolution (windows.cpp:11,25-26)
    assert cfg.main_window.height == 525
    assert cfg.main_window.cells_height == 75
    assert cfg.camera.y == -2.0


def test_repo_default_config_loads():
    from pathlib import Path

    cfg = AppConfig.load(Path(__file__).parent.parent / "configs" / "properties.txt")
    assert cfg.scene == "tiger"
    assert cfg.max_fps == 60
