"""AutoBatch — pick the training batch size from device memory.

TPU-native analog of the reference ``utils/autobatch.py:15`` (binary-fit to
60% CUDA memory): estimates per-sample activation memory by tracing the train
forward at two small batch sizes with ``jax.eval_shape``-style cost analysis,
then fits the largest power-of-two batch under `fraction` of HBM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import LOGGER

DEFAULT_HBM_BYTES = 16 * 1024**3  # v5e


def device_memory_bytes() -> int:
    d = jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return DEFAULT_HBM_BYTES


def estimate_activation_bytes(model, imgsz: int, batch: int) -> int:
    """Compiled-memory estimate of the eval forward at the given batch."""
    try:
        fn = jax.jit(lambda v, x: model.predict(v, x))
        lowered = fn.lower(
            jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), model.variables
            ),
            jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32),
        )
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        if mem is not None:
            return int(
                getattr(mem, "temp_size_in_bytes", 0)
                + getattr(mem, "output_size_in_bytes", 0)
            )
    except Exception as e:  # pragma: no cover
        LOGGER.warning(f"autobatch memory analysis failed: {e}")
    # fallback: activations ~ 60 floats/pixel for yolov8n-scale nets
    return batch * imgsz * imgsz * 60 * 4


def check_train_batch_size(model, imgsz: int = 640, fraction: float = 0.6) -> int:
    """Largest power-of-two batch whose estimated memory fits
    `fraction` * HBM (reference autobatch.py autobatch())."""
    if model.variables is None:
        model.init(imgsz=imgsz)
    budget = device_memory_bytes() * fraction
    b2 = estimate_activation_bytes(model, imgsz, 2)
    b4 = estimate_activation_bytes(model, imgsz, 4)
    per_sample = max((b4 - b2) / 2, 1.0)
    fixed = max(b2 - 2 * per_sample, 0.0)
    # training needs ~4x eval activations (grads + optimizer + remat slack)
    per_sample_train = per_sample * 4
    batch = int((budget - fixed) / per_sample_train)
    batch = max(1, 2 ** max(int(batch).bit_length() - 1, 0))
    LOGGER.info(
        f"AutoBatch: ~{per_sample_train / 1e6:.0f} MB/img (train est.), "
        f"budget {budget / 1e9:.1f} GB -> batch {batch}"
    )
    return batch
