"""A/B the VMEM-resident TV kernel vs the jnp while_loop on the chip.

Usage: python benchmarks/tv_ab.py [--mode kernel|jnp]
One mode per process (trace-time dispatch). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mies_tpu.utils import enable_compilation_cache, time_fn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["kernel", "jnp"], default="kernel")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((32, 512, 512), dtype=np.float32))

    if args.mode == "kernel":
        from mies_tpu.kernels.tv import denoise_tv_tpu

        fn = jax.jit(lambda b: denoise_tv_tpu(b, 0.1, 2e-4, 200))
    else:
        from mies_tpu.ops.restoration import denoise_tv

        fn = jax.jit(jax.vmap(
            lambda s: denoise_tv(s, weight=0.1, eps=2e-4,
                                 max_num_iter=200)))

    out = fn(x)  # compile
    out.block_until_ready()
    r = time_fn(fn, x, iters=args.iters)
    ms = r["ms_per_call"]
    print(json.dumps({
        "mode": args.mode, "ms_per_batch32": round(ms, 3),
        "slices_per_sec": round(32 / (ms / 1e3), 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
