"""Driver-level test: `scripts/main.py --train` end to end.

Covers the CLI driver that no other test executes: config loading,
dataset construction, per-frame jobs, the frames_per_batch co-optimized
path (_run_jobs batched), checkpoint cadence, and skip-if-done
idempotency (reference scripts/main.py:130-136)."""

import glob
import json
import os
import subprocess
import sys

import pytest

import test_tools_e2e as e2e


@pytest.fixture(scope="module")
def driver_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("driver"))
    e2e._make_synthetic_kitti360(root)
    # hand-written sampling list: two targets in the same shape bucket so
    # frames_per_batch=2 forms one co-optimized batch
    split = os.path.join(root, "filenames", "R50-N2-M8-B2", e2e.SEQUENCE)
    os.makedirs(split, exist_ok=True)
    image_dir = os.path.join(
        root, "data_2d_raw", e2e.SEQUENCE, "image_00", "data_rect"
    )
    lines = []
    for frame_index in (2, 3):
        target = os.path.join(image_dir, f"{frame_index:010d}.png")
        assert os.path.exists(target)
        lines.append(f"1,2 {target} -1,1")
    with open(os.path.join(split, "sampled_image_filenames.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return root


def _write_config(root, name, frames_per_batch):
    config = {
        "filenames": [
            os.path.join(
                root, "filenames", "R50-N2-M8-B2", e2e.SEQUENCE,
                "sampled_image_filenames.txt",
            )
        ],
        "num_source_frames": 2,
        "optimization": {
            "num_steps": 6,
            "warmup_steps": 3,
            "frames_per_batch": frames_per_batch,
        },
        "volume_rendering": {"num_rays": 32, "num_fine_samples": 8},
        "logging": {
            "ckpt_intervals": 3,
            "scalar_intervals": 2,
            "image_intervals": 10000,
        },
        "random": {"global_seed": 0, "use_unique_seed": False},
    }
    config_dirname = os.path.join(root, "configs", name)
    os.makedirs(config_dirname, exist_ok=True)
    path = os.path.join(config_dirname, "config.json")
    with open(path, "w") as f:
        json.dump(config, f)
    return path


def _run_driver(config_path):
    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "main.py"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    result = subprocess.run(
        [sys.executable, script, "--config", config_path, "--train"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    return result


@pytest.mark.slow
def test_driver_trains_batched_and_skips_when_done(driver_root):
    config_path = _write_config(driver_root, "vsrd_b2", frames_per_batch=2)

    _run_driver(config_path)

    ckpt_root = os.path.join(driver_root, "ckpts", "vsrd_b2")
    finals = sorted(glob.glob(
        os.path.join(ckpt_root, "**", "step_5.npz"), recursive=True
    ))
    assert len(finals) == 2, finals          # one per co-optimized frame
    mids = glob.glob(
        os.path.join(ckpt_root, "**", "step_2.npz"), recursive=True
    )
    assert len(mids) == 2                    # ckpt_intervals=3 cadence

    # per-frame log dirs with the config snapshot
    logs = sorted(glob.glob(os.path.join(
        driver_root, "logs", "vsrd_b2", "**", "config.json"
    ), recursive=True))
    assert len(logs) == 2

    # idempotency: a second run skips both finished frames
    result = _run_driver(config_path)
    err = result.stderr
    assert err.count("already optimized") == 2


@pytest.mark.slow
def test_driver_resumes_preempted_frames(driver_root):
    """A frame with a partial checkpoint (simulated preemption: delete
    its final checkpoints, keep step_2) is resumed from step 3 instead
    of restarting — the mid-frame fault-tolerance extension over the
    reference's whole-frame skip."""
    config_path = _write_config(driver_root, "vsrd_resume", frames_per_batch=2)
    _run_driver(config_path)
    ckpt_root = os.path.join(driver_root, "ckpts", "vsrd_resume")
    finals = sorted(glob.glob(
        os.path.join(ckpt_root, "**", "step_5.npz"), recursive=True
    ))
    assert len(finals) == 2

    # preempt one frame after its first checkpoint chunk
    os.remove(finals[0])
    result = _run_driver(config_path)
    err = result.stderr
    assert "resuming from step_2" in err, err[-2000:]
    assert err.count("already optimized") == 1   # the untouched frame
    assert os.path.exists(finals[0])             # re-completed
