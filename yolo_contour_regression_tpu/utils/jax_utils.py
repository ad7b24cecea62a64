"""JAX runtime utilities — the torch_utils equivalents.

Re-implements the reference ``utils/torch_utils.py`` surface for JAX:
``model_info`` / FLOPs (:172-254, thop -> XLA cost analysis), ``profile()``
op benchmark (:425), ``init_seeds`` (:323), ``smart_inference_mode``,
``de_parallel`` (meaningless under GSPMD — identity), ``one_cycle`` (:318).
EMA and fuse live in utils/optim.py and nn/fuse.py.
"""
from __future__ import annotations

import math
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import LOGGER


def init_seeds(seed: int = 0) -> jax.Array:
    """Deterministic seeding (reference torch_utils.py:323): numpy + python
    RNGs and a returned JAX key (JAX itself is always deterministic)."""
    import random

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100) -> Callable:
    """Cosine ramp y1->y2 (reference torch_utils.py:318)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def de_parallel(model):
    """Identity: GSPMD has no DDP wrapper to strip (torch_utils.py:313)."""
    return model


def model_flops(fn: Callable, *example_args) -> Optional[float]:
    """Analytical FLOPs via XLA cost analysis (replaces thop)."""
    try:
        lowered = jax.jit(fn).lower(*example_args)
        cost = lowered.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) if cost else None
    except Exception as e:  # pragma: no cover
        LOGGER.warning(f"cost analysis failed: {e}")
        return None


def model_info(model, imgsz: int = 640, verbose: bool = True) -> Dict:
    """Params + FLOPs + layer count (reference torch_utils.py:172 model_info)."""
    if model.variables is None:
        model.init(imgsz=imgsz)
    n_params = model.num_params
    flops = model_flops(
        lambda v, x: model.raw_forward(v, x),
        jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), model.variables
        ),
        jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.float32),
    )
    info = {
        "layers": len(model.specs),
        "parameters": n_params,
        "GFLOPs": round(flops / 1e9, 2) if flops else None,
    }
    if verbose:
        LOGGER.info(
            f"{type(model).__name__}: {info['layers']} layers, "
            f"{n_params:,} parameters, {info['GFLOPs']} GFLOPs @ {imgsz}px"
        )
    return info


def profile(fns: Dict[str, Callable], *args, n: int = 10) -> Dict[str, float]:
    """Micro-benchmark named ops (reference torch_utils.py:425 profile()).

    Forces a host readback per run — the only reliable sync on tunneled TPUs
    (see bench.py). Returns ms per call."""
    out = {}
    for name, fn in fns.items():
        jfn = jax.jit(fn)
        r = jfn(*args)
        _ = jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)  # warm
        t0 = time.perf_counter()
        for _ in range(n):
            r = jfn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], r)
        out[name] = (time.perf_counter() - t0) / n * 1e3
        LOGGER.info(f"profile {name}: {out[name]:.3f} ms")
    return out


class trace:
    """jax.profiler trace context (SURVEY.md §5.1 TPU equivalent of the
    reference's thop/Profile instrumentation): dumps a TensorBoard-viewable
    trace of device execution.

        with jax_utils.trace("runs/profile"):
            step_fn(...)
    """

    def __init__(self, log_dir: str = "runs/profile"):
        self.log_dir = str(log_dir)

    def __enter__(self):
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        LOGGER.info(f"profiler trace written to {self.log_dir}")


def smart_inference_mode(fn: Callable) -> Callable:
    """Decorator parity shim (torch_utils.py:45): JAX fns are pure; nothing to
    disable. Kept so user code written against the reference API ports over."""
    return fn
