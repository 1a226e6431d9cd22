"""Device mesh and sharding specs for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.10); parallelism here is
introduced natively with ``jax.sharding`` over a 2-D mesh:

* ``data`` axis — the session-parallel *lanes* are embarrassingly parallel
  (each lane walks its own sessions); batch rows, hidden state rows, and the
  schedule's lane dimension shard over it. Gradients of replicated dense
  parameters are ``psum``-reduced over ICI.
* ``model`` axis — the item-dimensioned tables (Wy, By, E, the one-hot Wx0)
  and their optimizer accumulators are row-sharded (vocabulary can be much
  larger than the hidden layer: EP/TP-style table sharding). Row gathers are
  shard-local takes followed by a ``psum``; scatters apply shard-locally
  with out-of-shard rows dropped.

PP/SP are deliberately out of scope: the model has no attention and the
recurrence is carried step-by-step by persistent state, not by an unrolled
sequence (SURVEY.md §2.10, §5 long-context row).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None) -> None:
    """Multi-host initialization hook (SURVEY.md §2.10: the NCCL-equivalent is
    XLA collectives over ICI/DCN, bootstrapped by ``jax.distributed``).

    Call once per host before any other JAX API when training spans multiple
    hosts (e.g. a v5e pod slice). With no arguments, JAX auto-detects the
    cluster environment (TPU pod metadata, SLURM, etc.); arguments are passed
    through for manual setups. No-op if the distributed runtime is already
    initialized.
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return  # repeat calls are no-ops (fit() + evaluate() in one run)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # already-initialized messages vary across jax versions
        # ("already initialized", "should only be called once.")
        msg = str(e).lower()
        if "already" not in msg and "once" not in msg:
            raise


def put_global(x, sharding):
    """``jax.device_put`` that also works when ``sharding`` spans devices of
    OTHER processes (multi-host training, SURVEY.md §2.10): every process
    passes the same full host array and only the locally-addressable shards
    are materialized. Single-process meshes take the plain device_put path
    unchanged."""
    if getattr(x, "sharding", None) == sharding:
        return x  # already laid out (e.g. device-resident schedule slices)
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return jax.device_put(x, sharding)  # global-to-global reshard
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx])


def fetch_to_host(x) -> np.ndarray:
    """Fetch a (possibly non-addressable) global array to host numpy on EVERY
    process. Fully-addressable and fully-replicated arrays convert directly;
    cross-process sharded arrays go through a process allgather (DCN)."""
    if not hasattr(x, "is_fully_addressable"):  # already host numpy
        return np.asarray(x)
    if x.is_fully_addressable or x.is_fully_replicated:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n} devices, have {len(devices)}"
        )
    try:
        # topology-aware placement: the 'model' axis carries a psum on every
        # training step's row gather, so its neighbors should be
        # ICI-adjacent — a naive enumeration-order reshape can land them
        # multi-hop apart on a pod slice
        from jax.experimental import mesh_utils

        dev = mesh_utils.create_device_mesh((n_data, n_model),
                                            devices=devices[:n])
    except Exception:
        # mesh_utils needs a full homogeneous slice; enumeration order is
        # still CORRECT (collectives just may ride longer ICI paths)
        dev = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def factor_mesh(n_devices: int) -> Tuple[int, int]:
    """Pick a (data, model) split for n devices: prefer a 2-D mesh so both
    lane parallelism and table sharding are exercised — the model axis is
    capped at 4 and the data axis kept >= 2 whenever the device count
    allows (a 1 x N mesh has zero lane parallelism)."""
    for n_model in (4, 2, 1):
        if n_devices % n_model == 0 and n_devices // n_model >= 2:
            return n_devices // n_model, n_model
    for n_model in (4, 2, 1):
        if n_devices % n_model == 0:
            return n_devices // n_model, n_model
    return n_devices, 1


def param_pspecs(params: dict, mode: str) -> dict:
    """PartitionSpecs for the parameter dict: item tables row-sharded over
    'model', everything else replicated."""
    specs = {
        "Wx": [P("model", None) if (i == 0 and mode == "onehot") else P(None, None)
               for i in range(len(params["Wx"]))],
        "Wh": [P(None, None)] * len(params["Wh"]),
        "Wrz": [P(None, None)] * len(params["Wrz"]),
        "Bh": [P(None)] * len(params["Bh"]),
        "Wy": P("model", None),
    }
    if "E" in params:
        specs["E"] = P("model", None)
    return specs


def state_pspecs(opt_state: dict) -> dict:
    """PartitionSpecs for optimizer state, mirroring the parameter layout:
    every spec derives from the state tree alone (sparse slots row-shard
    over 'model', dense slots replicate)."""
    dense_specs = jax.tree_util.tree_map(
        lambda leaf: P(*([None] * leaf.ndim)), opt_state["dense"]
    )
    sparse_specs = {}
    for name, st in opt_state["sparse"].items():
        sparse_specs[name] = jax.tree_util.tree_map(
            lambda leaf: P("model", *([None] * (leaf.ndim - 1))), st
        )
    return {"dense": dense_specs, "sparse": sparse_specs}
