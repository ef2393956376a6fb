"""Multi-host runtime: initialization, frame sharding, object collectives.

TPU-native re-design of `/root/reference/vsrd/distributed/`:

* `init_process_group`'s MPI/NCCL rendezvous (initialization.py:7-27)
  collapses to `jax.distributed.initialize()` — ICI/DCN wiring is the
  runtime's job;
* `DistributedSampler`'s frame sharding (sampler.py:6-32) becomes a
  static per-process chunk assignment (labeling is embarrassingly
  parallel: no gradient communication, README.md:128);
* pickle-tensor broadcast / ragged all_gather (communication.py:22-76)
  map to `multihost_utils` equivalents with pad-to-max semantics.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Iterable, Sequence

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (no-op for single process).

    Honors standard JAX env vars; explicit arguments override. Safe to
    call unconditionally — mirrors the reference's launcher-agnostic
    init (scripts/main.py:45-49).
    """
    explicit = coordinator_address is not None
    env = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if explicit or env or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def shard_indices(num_items: int, shard: int | None = None,
                  num_shards: int | None = None) -> np.ndarray:
    """This process's frame indices (round-robin, matching the reference
    DistributedSampler's rank::world_size stride, sampler.py:22-29)."""
    shard = process_index() if shard is None else shard
    num_shards = process_count() if num_shards is None else num_shards
    return np.arange(shard, num_items, num_shards)


def shard_list(items: Sequence[Any], shard: int | None = None,
               num_shards: int | None = None) -> list[Any]:
    return [items[i] for i in shard_indices(len(items), shard, num_shards)]


def broadcast_object(obj: Any, is_source: bool | None = None) -> Any:
    """Broadcast a host object (any picklable pytree) from the source
    process (reference communication.py:22-38, which rides torch's
    pickle-based broadcast_object_list).

    Pickle + uint8 transport rather than `broadcast_one_to_all` on the
    leaves: the leaf route silently downcasts float64/int64 under
    JAX's default x64-disabled mode and requires every process to know
    the pytree structure up front; bytes survive verbatim.
    """
    import pickle

    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return obj
    if is_source is None:
        is_source = jax.process_index() == 0
    payload = pickle.dumps(obj) if is_source else b""
    length = multihost_utils.broadcast_one_to_all(
        np.asarray([len(payload)], np.int32), is_source=is_source
    )
    buffer = np.zeros(int(length[0]), np.uint8)
    if is_source:
        buffer[:] = np.frombuffer(payload, np.uint8)
    buffer = multihost_utils.broadcast_one_to_all(
        buffer, is_source=is_source
    )
    return pickle.loads(np.asarray(buffer).tobytes())


def all_gather_ragged(array: np.ndarray, max_leading: int | None = None):
    """Gather per-process arrays with ragged leading dims
    (reference communication.py:41-76): pad to max, gather, return the
    list of unpadded arrays. Trailing dims and dtype must match across
    processes; the payload crosses as raw bytes so any dtype (incl.
    float64 under x64-disabled JAX) round-trips exactly."""
    from jax.experimental import multihost_utils

    array = np.ascontiguousarray(array)
    if jax.process_count() == 1:
        return [array]

    length = np.asarray([array.shape[0]])
    lengths = multihost_utils.process_allgather(length).reshape(-1)
    pad_to = int(max_leading or lengths.max())
    trailing = array.shape[1:]
    if pad_to == 0:
        return [np.zeros((0, *trailing), array.dtype) for _ in lengths]
    padded = np.zeros((pad_to, *trailing), array.dtype)
    padded[: array.shape[0]] = array
    flat = np.frombuffer(padded.tobytes(), np.uint8)
    gathered = multihost_utils.process_allgather(flat)  # [P, nbytes]
    return [
        np.frombuffer(np.asarray(g).tobytes(), array.dtype)
        .reshape(pad_to, *trailing)[:n]
        .copy()
        for g, n in zip(gathered, lengths)
    ]


def barrier(name: str = "barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def get_logger(name: str = "vsrd_tpu", rank_zero_only: bool = True) -> logging.Logger:
    """Rank-aware logger (reference distributed/utils.py:53-56)."""
    logger = logging.getLogger(name)
    if rank_zero_only and not is_primary():
        logger.setLevel(logging.CRITICAL)
    elif not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter(
                f"%(levelname)s: %(asctime)s: [proc {process_index()}] %(message)s"
            )
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger
