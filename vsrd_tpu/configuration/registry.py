"""Safe constructor registry for config-driven instantiation.

The reference instantiates objects straight from config via
``vsrd.utils.import_module`` with an ``"eval:<expr>"`` escape hatch that
evaluates arbitrary Python against the caller's locals
(`/root/reference/vsrd/utils.py:325-340`). This keeps the same JSON
shape — ``{"function": name, "args": [...], "kwargs": {...}}`` resolved
recursively — but resolves names through an explicit registry and
replaces ``eval:`` with ``ref:<dotted.path>`` lookups into a context
dict (no code execution).
"""

from __future__ import annotations

from typing import Any, Callable

REGISTRY: dict[str, Callable] = {}


def register(name: str | None = None):
    """Decorator/function to register a constructor under a dotted name."""

    def wrap(fn, name=name):
        REGISTRY[name or fn.__qualname__] = fn
        return fn

    if callable(name):
        fn, name = name, None
        return wrap(fn)
    return wrap


def register_defaults() -> None:
    """Register the framework's public constructors."""
    from ..data import KITTI360Dataset, KITTIRawDataset
    from ..data import transforms as tf
    from ..pipeline.optimize import OptimizationConfig

    defaults = {
        "vsrd.datasets.KITTI360Dataset": KITTI360Dataset,
        "vsrd.datasets.KITTIRawDataset": KITTIRawDataset,
        "vsrd_tpu.data.KITTI360Dataset": KITTI360Dataset,
        "vsrd_tpu.data.KITTIRawDataset": KITTIRawDataset,
        "vsrd.transforms.Resizer": tf.Resizer,
        "vsrd.transforms.MaskAreaFilter": tf.MaskAreaFilter,
        "vsrd.transforms.MaskRefiner": tf.MaskRefiner,
        "vsrd.transforms.BoxGenerator": tf.BoxGenerator,
        "vsrd.transforms.BoxSizeFilter": tf.BoxSizeFilter,
        "vsrd.transforms.SoftRasterizer": tf.SoftRasterizer,
        "vsrd.transforms.Cropper": tf.Cropper,
        "vsrd.transforms.RandomHorizontalFlipper": tf.RandomHorizontalFlipper,
        "vsrd.transforms.BoxJitter": tf.BoxJitter,
        "vsrd.transforms.FractalBrownianMotion": tf.FractalBrownianMotion,
        "vsrd.transforms.RandomConvolution": tf.RandomConvolution,
        "vsrd.transforms.ColorJitter": tf.ColorJitter,
        "vsrd_tpu.OptimizationConfig": OptimizationConfig,
    }
    for name, fn in defaults.items():
        REGISTRY.setdefault(name, fn)


def _lookup(path: str, context: dict) -> Any:
    node: Any = context
    for part in path.split("."):
        node = node[part] if isinstance(node, dict) else getattr(node, part)
    return node


def instantiate(config: Any, context: dict | None = None) -> Any:
    """Recursively resolve a config value.

    * ``{"function": name, "args": [...], "kwargs": {...}}`` -> call the
      registered constructor with resolved args/kwargs;
    * ``"ref:a.b.c"`` -> lookup in ``context``;
    * dicts/lists resolve elementwise; everything else passes through.
    """
    context = context or {}
    if isinstance(config, str):
        if config.startswith("ref:"):
            return _lookup(config[4:], context)
        if config.startswith("eval:"):
            raise ValueError(
                "eval: expressions are not supported (use ref:<path>); "
                f"got {config!r}"
            )
        return config
    if isinstance(config, list):
        return [instantiate(item, context) for item in config]
    if isinstance(config, dict):
        if "function" in config:
            if not REGISTRY:
                register_defaults()
            name = config["function"]
            if name not in REGISTRY:
                register_defaults()
            if name not in REGISTRY:
                raise KeyError(
                    f"constructor {name!r} is not registered; known: "
                    f"{sorted(REGISTRY)[:20]}..."
                )
            args = instantiate(config.get("args", []), context)
            kwargs = instantiate(config.get("kwargs", {}), context)
            return REGISTRY[name](*args, **kwargs)
        return {k: instantiate(v, context) for k, v in config.items()}
    return config
