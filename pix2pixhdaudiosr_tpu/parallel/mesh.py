"""Device mesh and sharding rules.

The reference's entire distributed story is single-process
torch.nn.DataParallel over NCCL with P2P disabled (reference
models/models.py:17-18, train.py:24). The TPU-native replacement is a
jax.sharding.Mesh with a `data` axis: the batch is sharded over ICI, params
are replicated, and every cross-device reduction (loss means, the batch-global
max/min in to_spectro) is an XLA collective inserted by pjit — no user-level
communication code.

Multi-host: call jax.distributed.initialize() before make_mesh and the same
code spans hosts (DCN across hosts, ICI within); feed per-host shards via
jax.make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> int:
    """Multi-host bring-up: call before make_mesh on every host; the same
    pjit code then spans hosts (ICI within pod, DCN across). Reads standard
    env (JAX_COORDINATOR_ADDRESS etc.) when args are None. Returns the
    process index. Single-host no-op if no coordinator is configured."""
    import os
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return 0
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def host_local_batch(global_batch, mesh: Mesh, axis: str = "data"):
    """Assemble a globally-sharded array from per-host data
    (jax.make_array_from_process_local_data), the multi-host feed path
    (SURVEY.md §5 distributed-communication plan)."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        global_batch)


def make_mesh(mesh_shape: Tuple[int, ...] = (-1,),
              axes: Tuple[str, ...] = ("data",),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    assert total <= n, f"mesh {shape} needs {total} devices, have {n}"
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, axes)


def make_data_mesh(batch_size: int, mesh_shape: Tuple[int, ...] = (-1,),
                   axes: Tuple[str, ...] = ("data",), devices=None) -> Mesh:
    """Data mesh whose `data` axis divides the global batch: uses the largest
    divisor of batch_size that fits the available devices (a batch smaller
    than the device count simply uses fewer devices, like the reference's
    DataParallel over a subset of --gpu_ids)."""
    import math
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape == (-1,) and axes == ("data",):
        d = math.gcd(batch_size, n)
        while d < n and batch_size % d == 0 and d * 2 <= n and batch_size % (d * 2) == 0:
            d *= 2
        d = max(1, math.gcd(batch_size, d))
        return make_mesh((d,), axes, devices=devices[:d])
    return make_mesh(mesh_shape, axes, devices=devices)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put every leaf with its batch dim sharded over `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def device_prefetch(iterator, mesh: Mesh, axis: str = "data", size: int = 2):
    """Double-buffer host->device transfers: the next batch's device_put is
    issued while the current step computes (device_put is async). The
    reference gets the equivalent from pin_memory + DataLoader workers
    (reference data/custom_dataset_data_loader.py:46-59)."""
    from collections import deque
    buf = deque()
    for item in iterator:
        dev = shard_batch({"label": item["label"], "image": item["image"]},
                          mesh, axis)
        buf.append((item, dev))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
