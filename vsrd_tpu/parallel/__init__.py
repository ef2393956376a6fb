from . import distributed
from .distributed import (
    all_gather_ragged,
    barrier,
    broadcast_object,
    get_logger,
    initialize,
    is_primary,
    process_count,
    process_index,
    shard_indices,
    shard_list,
)
