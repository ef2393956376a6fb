"""vsrd_tpu auto-labeling driver.

TPU-native re-design of `/root/reference/scripts/main.py`: per target
frame, a fully-jitted 3000-step Adam optimization of 3D boxes + residual
distance fields against multi-view silhouettes. Frames are sharded
across processes (embarrassingly parallel — no gradient communication,
reference README.md:128); each process drives its chunk through the
chunked `optimize_frame` loop with preemption-safe `.npz` checkpoints
and frame-granular skip-if-done.

Usage:
    python scripts/main.py --config configs/kitti_360/vsrd/<drive>/config.json --train
"""

import argparse
import dataclasses
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vsrd_tpu import parallel  # noqa: E402
from vsrd_tpu.configuration.configurator import Configurator  # noqa: E402
from vsrd_tpu.configuration.registry import instantiate  # noqa: E402
from vsrd_tpu.data.kitti360 import KITTI360Dataset, align_to_target  # noqa: E402
from vsrd_tpu.pipeline import frame as frame_mod  # noqa: E402
from vsrd_tpu.pipeline import optimize as opt  # noqa: E402
from vsrd_tpu.visualization import panels  # noqa: E402
from vsrd_tpu.utils.meters import ProgressMeter, StopWatch  # noqa: E402
from vsrd_tpu.utils.saver import Saver, has_final_checkpoint  # noqa: E402

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


def round_up_instances(n, buckets=(8, 16, 24, 32)):
    """Pad instance counts to a small set of buckets so jit caches a few
    compiled programs instead of one per count."""
    for bucket in buckets:
        if n <= bucket:
            return bucket
    return buckets[-1]


def build_config(args) -> opt.OptimizationConfig:
    config = Configurator.load(args.config)
    optimization = config.get("optimization", {})
    volume = config.get("volume_rendering", {})
    weights = config.get("loss_weights", {})
    return opt.OptimizationConfig(
        num_steps=optimization.get("num_steps", 3000),
        warmup_steps=optimization.get("warmup_steps", 1000),
        num_rays=volume.get("num_rays", 1000),
        num_samples=volume.get("num_fine_samples", 100),
        distance_range=tuple(volume.get("distance_range", (0.0, 100.0))),
        max_sdf_union_temperature=volume.get("max_sdf_union_temperature", 1.0),
        min_sdf_union_temperature=volume.get("min_sdf_union_temperature", 0.1),
        max_sdf_std_deviation=volume.get("max_sdf_std_deviation", 1.0),
        min_sdf_std_deviation=volume.get("min_sdf_std_deviation", 0.1),
        iou_projection_weight=weights.get("iou_projection_loss", 0.1),
        l1_projection_weight=weights.get("l1_projection_loss", 1.0),
        silhouette_weight=weights.get("silhouette_loss", 1.0),
        eikonal_weight=weights.get("eikonal_loss", 0.01),
        photometric_weight=weights.get("photometric_loss", 0.0),
        surface_num_rays=config.get("surface_rendering", {}).get("num_rays", 100),
        surface_num_iterations=config.get("surface_rendering", {}).get(
            "num_iterations", 1000
        ),
        surface_convergence_criteria=config.get("surface_rendering", {}).get(
            "convergence_criteria", 0.01
        ),
        surface_bounding_radius=config.get("surface_rendering", {}).get(
            "bounding_radius", 100.0
        ),
        checkpoint_interval=config.get("logging", {}).get("ckpt_intervals", 500),
        # Kernel knobs (NOTES.md): strict-parity runs set precision
        # 'highest', which also disables the coarse-pass approximations.
        # Defaults come from the OptimizationConfig dataclass so bench.py
        # (which constructs the dataclass directly) and this driver
        # provably run the same kernel path; a config may still override
        # any knob under its "optimization" section.
        **_kernel_knobs(optimization),
    ), config


def _kernel_knobs(optimization):
    """Every `pallas_*` / `use_pallas` / `field_dtype` knob, read from the
    config's `optimization` section with the OptimizationConfig dataclass
    field default as fallback (tests/test_config.py pins the equality)."""
    defaults = opt.OptimizationConfig()
    names = [
        field.name
        for field in dataclasses.fields(opt.OptimizationConfig)
        if field.name.startswith("pallas_")
        or field.name in ("use_pallas", "field_dtype")
    ]
    return {name: optimization.get(name, getattr(defaults, name)) for name in names}


def make_dataset(config):
    datasets_cfg = config.get("datasets", {}).get("train")
    if datasets_cfg is not None and "function" in datasets_cfg:
        return instantiate(datasets_cfg)
    # minimal direct construction
    return KITTI360Dataset(
        filenames=config["filenames"],
        num_source_frames=config.get("num_source_frames", 16),
    )


class _FrameJob:
    """Per-frame host-side state for the (possibly batched) optimizer."""

    def __init__(self, frame, image_filename, ckpt_dirname, log_dirname, key):
        self.frame = frame
        self.image_filename = image_filename
        self.saver = Saver(ckpt_dirname)
        self.writer = SummaryWriter(log_dirname) if SummaryWriter else None
        self.key = key

    def save_and_log(self, step, params, scalars, cfg, config, meters, logger,
                     opt_state=None):
        """``params``/``scalars`` are this frame's slices (no frame axis)."""
        scalar_every = config.get("logging", {}).get("scalar_intervals", 50)
        image_every = config.get("logging", {}).get("image_intervals", 500)
        entries = dict(
            step=np.asarray(step - 1),
            models={"detector": jax.device_get(params["boxes"]),
                    "hyper_distance_field": jax.device_get(params["hyper"])},
            metrics={k: np.asarray(v[-1]) for k, v in scalars.items()},
            valid=np.asarray(self.frame.valid),
        )
        if opt_state is not None and step < cfg.num_steps:
            # Adam state rides along (mu/nu mirror the params, ~3x file
            # size) so a preempted frame can resume mid-run from its
            # last checkpoint (_resume_state) instead of restarting —
            # beyond the reference's whole-frame skip (main.py:130-136).
            # The final checkpoint skips it: _resume_state never reads a
            # finished frame, but make_predictions/select_model load
            # that file for every frame.
            entries["opt_state"] = jax.device_get(opt_state)
        self.saver.save(f"step_{step - 1}", **entries)
        base = step - len(scalars["loss"])
        for offset in range(scalar_every - 1, len(scalars["loss"]), scalar_every):
            for name, values in scalars.items():
                if self.writer is not None:
                    self.writer.add_scalar(
                        f"scalars/{name}", float(values[offset]), base + offset
                    )
        if self.writer is not None and step % image_every == 0:
            # reference-grade diagnostics: GT masks/wireframes/ray
            # dots per view, predicted masks/wireframes, BEV
            # (reference main.py:955-1107)
            pan = panels.diagnostic_panels(params, self.frame, step - 1, cfg)
            panels.write_panels(self.writer, pan, step)
        logger.info(
            f"[{self.image_filename}] step {step}/{cfg.num_steps} "
            f"loss={float(scalars['loss'][-1]):.4f} "
            f"iou_3d={float(scalars['iou_3d'][-1]):.4f} "
            f"progress={meters.progress():.2%}"
        )

    def close(self):
        if self.writer is not None:
            self.writer.close()


def _resume_state(job, cfg, logger):
    """(params, opt_state, start_step) from the frame's latest partial
    checkpoint, or None. Exact continuation: per-step keys are
    fold_in(key, step), so resuming with the same per-frame key
    reproduces the uninterrupted trajectory (optimize.optimize_frame).
    Frames preempted mid-BATCH resume individually: params/Adam state
    carry over exactly, but the stochastic stream differs from the
    uninterrupted batch (which drew [F, ...]-shaped noise from the
    shared key) — still a valid continuation of the optimization."""
    import glob as _glob
    import re as _re

    pattern = os.path.join(job.saver.dirname, "step_*.npz")
    steps = sorted(
        int(m.group(1))
        for p in _glob.glob(pattern)
        if (m := _re.search(r"step_(\d+)\.npz$", p))
    )
    if not steps or steps[-1] >= cfg.num_steps - 1:
        return None
    # Newest first; checkpoint writes are atomic (saver.save_checkpoint
    # tmp+os.replace), but guard against files damaged by other means —
    # an unreadable checkpoint falls back to the previous one (or a
    # fresh start) instead of wedging every subsequent driver run.
    import zipfile as _zipfile

    for latest in reversed(steps):
        try:
            payload = job.saver.load(f"step_{latest}")
        except PermissionError:
            # environmental, not corruption: silently restarting would
            # discard completed work on EVERY frame — surface it
            raise
        except (_zipfile.BadZipFile, ValueError, KeyError, EOFError,
                OSError) as error:
            logger.warning(
                f"[{job.image_filename}] unreadable checkpoint "
                f"step_{latest}: {error}; trying earlier"
            )
            continue
        if "opt_state" not in payload:
            return None  # pre-resume checkpoint format: restart
        params = {
            "boxes": payload["models"]["detector"],
            "hyper": payload["models"]["hyper_distance_field"],
        }
        logger.info(
            f"[{job.image_filename}] resuming from step_{latest} "
            f"({latest + 1}/{cfg.num_steps} steps done)"
        )
        return params, payload["opt_state"], latest + 1
    return None


def _run_single(job, cfg, config, meters, stop_watch, logger, init_state=None):
    start = init_state[2] if init_state is not None else 0
    if start:
        # already-optimized steps count toward progress/ETA (no duration
        # sample: they cost nothing this run)
        meters.update(count=start)
        stop_watch.restart()
    last = {"step": start}

    def callback(step, params, scalars, opt_state):
        covered = step - last["step"]
        last["step"] = step
        meters.update(count=covered, optimize=stop_watch.restart())
        job.save_and_log(
            step, params, scalars, cfg, config, meters, logger,
            opt_state=opt_state,
        )

    opt.optimize_frame(
        job.frame, job.key, cfg, callback=callback, init_state=init_state
    )
    job.close()


def _run_jobs(jobs, cfg, config, meters, stop_watch, logger):
    """Optimize a bucket of equally-shaped frames (co-optimized when >1)."""
    from vsrd_tpu.pipeline import sharded as sharded_mod

    # Preempted frames (partial checkpoints) resume individually via the
    # single-frame path; fresh frames co-optimize as one batch.
    resumes = []
    fresh = []
    for job in jobs:
        state = _resume_state(job, cfg, logger)
        (resumes if state is not None else fresh).append((job, state))
    for job, state in resumes:
        _run_single(job, cfg, config, meters, stop_watch, logger, state)
    jobs = [job for job, _ in fresh]

    if not jobs:
        return
    if len(jobs) == 1:
        _run_single(jobs[0], cfg, config, meters, stop_watch, logger)
        return

    frames = sharded_mod.stack_frames([job.frame for job in jobs])
    last = {"step": 0}

    def callback(step, params, scalars, opt_state):
        covered = (step - last["step"]) * len(jobs)
        last["step"] = step
        meters.update(count=covered, optimize=stop_watch.restart())
        for f, job in enumerate(jobs):
            params_f = jax.tree.map(lambda x: x[f], params)
            scalars_f = {k: v[:, f] for k, v in scalars.items()}
            # mu/nu carry the leading frame axis; "count" is a lockstep
            # scalar shared by the batch
            opt_f = jax.tree.map(
                lambda x: x[f] if getattr(x, "ndim", 0) > 0 else x,
                opt_state,
            )
            job.save_and_log(
                step, params_f, scalars_f, cfg, config, meters, logger,
                opt_state=opt_f,
            )

    # co-optimized frames share one key: stochastic draws are shaped
    # [F, ...], independent per frame (optimize.compute_loss batched)
    opt.optimize_frames_batched(frames, jobs[0].key, cfg, callback=callback)
    for job in jobs:
        job.close()


def train(args):
    cfg, config = build_config(args)
    logger = parallel.get_logger("vsrd_tpu.main", rank_zero_only=False)

    parallel.initialize()
    dataset = make_dataset(config)
    shard = getattr(args, "shard", None)
    num_shards = getattr(args, "num_shards", None)
    indices = parallel.shard_indices(len(dataset), shard, num_shards)
    logger.info(
        f"process "
        f"{parallel.process_index() if shard is None else shard}/"
        f"{parallel.process_count() if num_shards is None else num_shards}: "
        f"{len(indices)} of {len(dataset)} target frames"
    )

    # frames_per_batch > 1 co-optimizes same-shape frames on one chip
    # (one jitted scan, one field kernel with a frame grid axis)
    frames_per_batch = int(
        config.get("optimization", {}).get("frames_per_batch", 1)
    )

    config_dirname = os.path.dirname(args.config)
    meters = ProgressMeter(len(indices) * cfg.num_steps)
    stop_watch = StopWatch()
    stop_watch.start()
    import time as _time
    run_start = _time.time()

    pending = {}  # bucket key -> list of _FrameJob

    for index in indices:
        samples = dataset[int(index)]
        target = samples[0]
        image_filename = target["filename"]
        root_dirname = dataset.get_root_dirname(image_filename)
        image_dirname = os.path.splitext(
            os.path.relpath(image_filename, root_dirname)
        )[0]

        ckpt_dirname = os.path.join(
            config_dirname.replace("configs", "ckpts"), image_dirname
        )
        log_dirname = os.path.join(
            config_dirname.replace("configs", "logs"), image_dirname
        )

        if has_final_checkpoint(ckpt_dirname, cfg.num_steps):
            logger.warning(f"[{image_filename}] already optimized, skipping")
            continue
        num_instances = len(target["instance_ids"])
        if not num_instances:
            logger.warning(f"[{image_filename}] no instances, skipping")
            continue

        os.makedirs(log_dirname, exist_ok=True)
        with open(os.path.join(log_dirname, "config.json"), "w") as file:
            json.dump(config, file, indent=4)

        frame_kwargs = align_to_target(
            samples, max_instances=round_up_instances(num_instances)
        )
        # images ride to the device only when the photometric branch can
        # consume them (reference main.py:689: gated on the loss weight)
        images = (
            [samples[rel]["image"] for rel in sorted(samples.keys())]
            if cfg.photometric_weight > 0.0
            else None
        )
        frame = frame_mod.build_frame_data(images, **frame_kwargs)

        seed = config.get("random", {}).get("global_seed", 0)
        if config.get("random", {}).get("use_unique_seed", True):
            seed = seed + (
                parallel.process_index() if shard is None else shard
            )
        key = jax.random.fold_in(jax.random.PRNGKey(seed), int(index))

        job = _FrameJob(frame, image_filename, ckpt_dirname, log_dirname, key)
        bucket = (
            frame.max_instances,
            frame.num_views,
            frame.image_size,
        )
        pending.setdefault(bucket, []).append(job)
        if len(pending[bucket]) >= frames_per_batch:
            _run_jobs(
                pending.pop(bucket), cfg, config, meters, stop_watch, logger
            )

    for jobs in pending.values():
        _run_jobs(jobs, cfg, config, meters, stop_watch, logger)

    logger.info(f"done in {_time.time() - run_start:.1f}s")


def main():
    parser = argparse.ArgumentParser(
        description="vsrd_tpu: volumetric silhouette rendering auto-labeler"
    )
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--launcher", type=str, default="jax",
                        choices=["jax", "slurm", "torchrun"],
                        help="rendezvous handled by jax.distributed; flag "
                             "kept for CLI compatibility")
    parser.add_argument("--shard", type=int, default=None,
                        help="explicit frame-shard index (defaults to "
                             "jax.process_index()); lets N independent "
                             "processes split the frame list without a "
                             "jax.distributed rendezvous — the labeling "
                             "path has no collectives (reference "
                             "README.md:128)")
    parser.add_argument("--num_shards", type=int, default=None,
                        help="explicit shard count (defaults to "
                             "jax.process_count())")
    args = parser.parse_args()
    if args.train:
        train(args)


if __name__ == "__main__":
    main()
