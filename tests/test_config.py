"""Config-wiring regression tests.

Round-4 verdict finding: `scripts/main.py` hardcoded
`optimization.get("pallas_box_coarse", False)` while the
`OptimizationConfig` dataclass defaulted True and no shipped config set
the key — so `bench.py` (dataclass defaults) and the production driver
silently ran different kernel paths, and the headline number was not
the number a user got. These tests pin the contract: for every shipped
config, `build_config` resolves every kernel knob (`pallas_*`,
`use_pallas`, `field_dtype`) to exactly the dataclass default unless
the config explicitly overrides it.
"""

import dataclasses
import glob
import importlib.util
import os
import types

import pytest

from vsrd_tpu.pipeline import optimize as opt

REPO = os.path.join(os.path.dirname(__file__), "..")


def _load_driver():
    # spec-load: inserting scripts/ into sys.path would shadow the
    # stdlib `profile` module with scripts/profile.py
    spec = importlib.util.spec_from_file_location(
        "vsrd_driver_main_cfg", os.path.join(REPO, "scripts", "main.py")
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


KERNEL_KNOBS = [
    field.name
    for field in dataclasses.fields(opt.OptimizationConfig)
    if field.name.startswith("pallas_") or field.name in ("use_pallas", "field_dtype")
]


def _shipped_configs():
    pattern = os.path.join(REPO, "configs", "kitti_360", "vsrd", "*", "config.json")
    paths = sorted(glob.glob(pattern))
    assert paths, "no shipped configs found"
    return paths


@pytest.mark.parametrize("config_path", _shipped_configs(),
                         ids=lambda p: os.path.basename(os.path.dirname(p)))
def test_shipped_configs_resolve_to_dataclass_kernel_defaults(config_path):
    """bench.py constructs OptimizationConfig() directly; the driver goes
    through build_config on a shipped config. Both must land on the same
    kernel path for every knob (the round-4 box-coarse drift)."""
    driver = _load_driver()
    args = types.SimpleNamespace(config=config_path)
    cfg, _ = driver.build_config(args)
    defaults = opt.OptimizationConfig()
    for name in KERNEL_KNOBS:
        assert getattr(cfg, name) == getattr(defaults, name), (
            f"{name}: driver={getattr(cfg, name)!r} "
            f"dataclass={getattr(defaults, name)!r} ({config_path})"
        )


def test_config_override_reaches_the_dataclass(tmp_path):
    """An explicit `optimization.pallas_*` key in a config must win over
    the dataclass default (the escape hatch for strict-parity runs)."""
    import json

    defaults = opt.OptimizationConfig()
    override = {
        "optimization": {
            "pallas_box_coarse": not defaults.pallas_box_coarse,
            "pallas_matmul_precision": "highest",
            "use_pallas": not defaults.use_pallas,
        }
    }
    path = tmp_path / "config.json"
    path.write_text(json.dumps(override))
    driver = _load_driver()
    cfg, _ = driver.build_config(types.SimpleNamespace(config=str(path)))
    assert cfg.pallas_box_coarse is (not defaults.pallas_box_coarse)
    assert cfg.pallas_matmul_precision == "highest"
    assert cfg.use_pallas is (not defaults.use_pallas)


def test_kernel_knob_list_covers_all_pallas_fields():
    """If a new pallas_* field is added to OptimizationConfig, the driver
    helper automatically includes it (this test fails only if the helper
    filter itself drifts)."""
    driver = _load_driver()
    knobs = driver._kernel_knobs({})
    assert set(knobs) == set(KERNEL_KNOBS)
    defaults = opt.OptimizationConfig()
    for name, value in knobs.items():
        assert value == getattr(defaults, name)
