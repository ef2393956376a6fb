"""Load the PyTorch reference's leaf modules without package __init__.

The reference package's ``vsrd/__init__.py`` imports every subpackage,
some of which need dependencies absent from this environment
(torchvision, pycocotools, skimage, cv2). The parity harness only needs
the pure-torch leaves, so we register synthetic parent packages and load
each leaf by file path; relative imports (``from .. import utils``)
resolve through sys.modules.

Nothing from the reference is copied — the modules are imported
read-only from /root/reference as the golden implementation under test.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"

_LEAVES = {
    "utils": "vsrd/utils.py",
    "samplers": "vsrd/rendering/samplers.py",
    "sdfs": "vsrd/rendering/sdfs.py",
    "rendering_utils": "vsrd/rendering/utils.py",
    "renderers": "vsrd/rendering/renderers.py",
    "box_parameters": "vsrd/models/detectors/box_parameters.py",
    "hyper_distance_field": "vsrd/models/fields/hyper_distance_field.py",
    "sinusoidal_encoder": "vsrd/models/encoders/sinusoidal_encoder.py",
    "geometric_operations": "vsrd/operations/geometric_operations.py",
    "kitti360_operations": "vsrd/operations/kitti360_operations.py",
    "losses_utils": "vsrd/losses/utils.py",
    "photometric_losses": "vsrd/losses/photometric_losses.py",
}

_MODULE_NAMES = {
    "utils": "refvsrd.utils",
    "samplers": "refvsrd.rendering.samplers",
    "sdfs": "refvsrd.rendering.sdfs",
    "rendering_utils": "refvsrd.rendering.utils",
    "renderers": "refvsrd.rendering.renderers",
    "box_parameters": "refvsrd.models.detectors.box_parameters",
    "hyper_distance_field": "refvsrd.models.fields.hyper_distance_field",
    "sinusoidal_encoder": "refvsrd.models.encoders.sinusoidal_encoder",
    "geometric_operations": "refvsrd.operations.geometric_operations",
    "kitti360_operations": "refvsrd.operations.kitti360_operations",
    "losses_utils": "refvsrd.losses.utils",
    "photometric_losses": "refvsrd.losses.photometric_losses",
}

_PACKAGES = [
    "refvsrd",
    "refvsrd.rendering",
    "refvsrd.models",
    "refvsrd.models.detectors",
    "refvsrd.models.fields",
    "refvsrd.models.encoders",
    "refvsrd.operations",
    "refvsrd.losses",
]


def load_reference(root: str = REFERENCE_ROOT) -> types.SimpleNamespace:
    """Returns a namespace of the reference's leaf modules (torch CPU)."""
    for name in _PACKAGES:
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            pkg.__package__ = name
            sys.modules[name] = pkg

    loaded = {}
    for alias, rel_path in _LEAVES.items():
        name = _MODULE_NAMES[alias]
        if name in sys.modules and hasattr(sys.modules[name], "__file__"):
            loaded[alias] = sys.modules[name]
            continue
        spec = importlib.util.spec_from_file_location(name, f"{root}/{rel_path}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        parent_name, _, leaf = name.rpartition(".")
        setattr(sys.modules[parent_name], leaf, mod)
        loaded[alias] = mod
    return types.SimpleNamespace(**loaded)


def make_samplers_deterministic(ref: types.SimpleNamespace) -> None:
    """Force the reference renderer's samplers into their own
    deterministic modes (samplers.py:5-8 midpoint, :17-19 linspace) so a
    parity run has no torch-RNG dependence. The renderer module binds the
    samplers *module*, so rebinding its functions is enough."""
    samplers = ref.samplers
    if getattr(samplers, "_parity_deterministic", False):
        return
    orig_quad = samplers.quadrature_sampler
    orig_inv = samplers.inverse_transform_sampler

    def quad(bins, deterministic=True):
        return orig_quad(bins, deterministic=True)

    def inv(bins, weights, num_samples, deterministic=True):
        return orig_inv(bins, weights, num_samples, deterministic=True)

    samplers.quadrature_sampler = quad
    samplers.inverse_transform_sampler = inv
    samplers._parity_deterministic = True
