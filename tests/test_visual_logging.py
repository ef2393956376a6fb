"""Diagnostic image panels: content checks + TensorBoard event assert.

Covers the reference's per-image_intervals visual QA families
(/root/reference/scripts/main.py:955-1107): GT masks + wireframes + ray
dots per view, predicted masks + wireframes, BEV.
"""

import glob
import os

import numpy as np
import jax
import pytest

from vsrd_tpu.pipeline import frame as fm, optimize as opt
from vsrd_tpu.visualization import panels


@pytest.fixture(scope="module")
def small_setup():
    cfg = opt.OptimizationConfig(
        num_steps=20, warmup_steps=10, num_rays=32, num_samples=8,
        checkpoint_interval=20, surface_num_iterations=16,
    )
    frame = fm.synthetic_frame(
        jax.random.PRNGKey(0), num_views=3, image_size=(32, 48),
        num_instances=2, max_instances=3,
    )
    params = opt.init_params(jax.random.PRNGKey(1), 3, cfg)
    return cfg, frame, params


@pytest.mark.slow
def test_panel_families_and_shapes(small_setup):
    cfg, frame, params = small_setup
    pan = panels.diagnostic_panels(
        params, frame, 15, cfg, surface_mask=False
    )
    target = int(frame.target_index)
    names = set(pan)
    for view in range(frame.num_views):
        assert f"gt/{view - target:d}" in names
    assert "pd/0" in names
    assert "bev/0" in names

    h, w = frame.image_size
    for name, image in pan.items():
        assert image.ndim == 3 and image.shape[-1] == 3, name
        expected = (1000, 1000) if name.startswith("bev") else (h, w)
        assert image.shape[:2] == expected, name
        assert np.isfinite(image).all(), name

    # GT panels must differ from a blank canvas (masks + wireframes drawn)
    gt0 = pan[f"gt/{0 - target:d}"]
    assert gt0.std() > 0.01
    # BEV canvas carries both red (GT) and blue (pred) strokes
    bev = pan["bev/0"]
    has_red = ((bev[..., 0] > 0.9) & (bev[..., 2] < 0.1)).any()
    has_blue = ((bev[..., 2] > 0.9) & (bev[..., 0] < 0.1)).any()
    assert has_red and has_blue


def test_panels_written_to_tensorboard(small_setup, tmp_path):
    tbx = pytest.importorskip("tensorboardX")
    cfg, frame, params = small_setup
    pan = panels.diagnostic_panels(params, frame, 15, cfg, surface_mask=False)
    writer = tbx.SummaryWriter(str(tmp_path))
    panels.write_panels(writer, pan, 20)
    writer.close()

    events = glob.glob(os.path.join(str(tmp_path), "events.*"))
    assert events
    blob = b"".join(open(e, "rb").read() for e in events)
    for tag in (b"images/gt/", b"images/pd/0", b"images/bev/0"):
        assert tag in blob, tag
