"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP machinery (SURVEY.md §2.8).

The reference re-launches itself under ``torch.distributed.run`` and wires
NCCL process groups (trainer.py:179-206, dist.py:49-62). Here there is no
process relaunch and no explicit collective wiring: we build one
``jax.sharding.Mesh`` over every visible chip, shard the batch axis of the
data, replicate parameters, and let XLA insert the gradient ``psum`` over ICI
(DCN across hosts is handled by the JAX runtime after
``jax.distributed.initialize``).

Scaling axes:
  - ``batch`` (data parallel): the only parallelism the reference has; default.
  - The mesh is N-D ready — pass ``axes={'batch': 4, 'model': 2}`` to reserve a
    model axis for future tensor-parallel heads; everything here only requires
    the ``batch`` axis to exist.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed():
    """Multi-host init (no-op single host). Call once at program start."""
    try:
        if jax.process_count() > 1:
            return
    except RuntimeError:
        pass
    # jax.distributed.initialize() is only needed under multi-host launch
    # environments (it reads coordinator env vars); guarded so single-host
    # usage never fails.
    import os

    if "COORDINATOR_ADDRESS" in os.environ or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axes: Optional[Dict[str, int]] = None,
) -> Mesh:
    """Build a mesh over all (or given) devices.

    Default: 1-D ``('batch',)`` data-parallel mesh over every chip — the
    TPU equivalent of the reference's single DDP world.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axes:
        return Mesh(np.array(devices), ("batch",))
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh axes {axes} need {np.prod(sizes)} devices, have {len(devices)}")
    return Mesh(np.array(devices).reshape(sizes), names)


def build_train_mesh(devices: Sequence[jax.Device], batch: int, tp: int = 1) -> Mesh:
    """The trainer's mesh (BaseTrainer.train and the driver dryrun share this):

    - ``tp == 1``: 1-D data-parallel mesh over the largest device count that
      divides ``batch`` (the DDP analog of world_size | batch, auto-adjusted
      not fatal).
    - ``tp > 1``: 2-D ``batch x model`` mesh — conv output channels shard
      over 'model' (param_sharding_rule), the batch over the remaining
      devices.
    """
    devices = list(devices)
    tp = max(1, int(tp or 1))
    if tp == 1:
        n_use = max(d for d in range(1, len(devices) + 1) if batch % d == 0)
        return create_mesh(devices[:n_use])
    if len(devices) % tp:
        raise ValueError(f"tp={tp} does not divide device count {len(devices)}")
    dp_avail = len(devices) // tp
    dp = max(d for d in range(1, dp_avail + 1) if batch % d == 0)
    return create_mesh(devices[: dp * tp], axes={"batch": dp, "model": tp})


def place_train_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: replicate everything, then (on a 2-D
    mesh) tensor-shard params/EMA/optimizer moments over 'model'."""
    state = replicate_tree(mesh, state)
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        state = state._replace(
            params=shard_params_tp(mesh, state.params),
            ema_params=shard_params_tp(mesh, state.ema_params),
            opt_state=shard_params_tp(mesh, state.opt_state),
        )
    return state


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard dim 0 over the 'batch' axis, replicate the rest."""
    return NamedSharding(mesh, P("batch", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of arrays with dim-0 sharded over 'batch'. Arrays that
    already live on device (cache='device' image pool gathers) are resharded
    in place — np.asarray on them would silently read the batch back to
    host first."""
    def put(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        return jax.device_put(
            x, NamedSharding(mesh, P("batch", *([None] * (x.ndim - 1))))
        )

    return jax.tree_util.tree_map(put, tree)


def shard_microbatches(mesh: Mesh, tree):
    """Place stacked (accumulate, B, ...) micro-batches with the per-micro
    batch axis (dim 1) sharded over 'batch'; the scan axis stays replicated
    so ``lax.scan`` over dim 0 never scans across devices."""

    def put(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        return jax.device_put(
            x, NamedSharding(mesh, P(None, "batch", *([None] * (x.ndim - 2))))
        )

    return jax.tree_util.tree_map(put, tree)


def replicate_tree(mesh: Mesh, tree):
    sharding = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def param_sharding_rule(mesh: Mesh, x, axis: str = "model") -> NamedSharding:
    """Tensor-parallel placement for one param leaf: shard the OUTPUT-channel
    (last) dim over ``axis`` when divisible, else replicate.

    Conv kernels are HWIO and Dense kernels (in, out) — sharding O splits
    each layer's filters across the model axis; XLA/GSPMD then inserts the
    minimal collectives where a following op needs the full channel axis
    (the "weight-stationary" tensor parallelism of the scaling playbook,
    obsoleting the reference's single-axis DDP world view)."""
    if axis not in mesh.axis_names:
        return replicate(mesh)
    tp = mesh.shape[axis]
    if x.ndim >= 1 and x.shape[-1] % tp == 0 and x.shape[-1] >= 2 * tp:
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), axis))
    return replicate(mesh)


def shard_params_tp(mesh: Mesh, tree, axis: str = "model"):
    """Place a params/EMA/optimizer pytree with tensor-parallel sharding
    (``param_sharding_rule`` per leaf). Scalars and small leaves replicate."""
    def put(x):
        import numpy as _np

        x = _np.asarray(x) if not hasattr(x, "sharding") else x
        return jax.device_put(x, param_sharding_rule(mesh, x, axis))

    return jax.tree_util.tree_map(put, tree)


def spatial_sharding(mesh: Mesh, ndim: int = 4, axis: str = "spatial") -> NamedSharding:
    """Shard the image HEIGHT dim (dim 1 of NHWC) over ``axis``.

    Spatial partitioning is the latency lever batching can't pull: one
    megapixel image, batch 1, split row-wise across chips. XLA GSPMD
    partitions every conv spatially and inserts the halo exchanges for
    kernel overlap on its own — no manual ghost-row plumbing (this is the
    workload spatial partitioning in XLA was originally built for). Params
    stay replicated. Keep H/stride_max >= mesh.shape[axis] so the deepest
    feature map still has at least one row per chip (stride 32: 8-way needs
    imgsz >= 256).

    No reference counterpart: the reference's only multi-GPU axis is DDP
    data parallelism (reference engine/trainer.py DDP setup)."""
    return NamedSharding(mesh, P(None, axis, *([None] * (ndim - 2))))


def shard_spatial(mesh: Mesh, tree, axis: str = "spatial"):
    """Place a pytree of NHWC image arrays with H sharded over ``axis``."""
    def put(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        return jax.device_put(x, spatial_sharding(mesh, x.ndim, axis))

    return jax.tree_util.tree_map(put, tree)
