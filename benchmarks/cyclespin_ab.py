"""cycle_spin closure A/B (VERDICT r4 weak #6 — 110.9 ms/b32 at S=16).

The op is already ONE vmapped program over the 16-shift stack; the
open question is whether the 110.9 ms census number hides shareable
work. The SWT identity canNOT apply: skimage's contract averages the
PARTIAL 4x4 shift grid, and only the full 2^J-shift average equals
SWT thresholding, so the formulation must keep the same math. What
remains is accounting:

  * prod     — cycle_spin(max_shifts=3) on b32 512² (the census form)
  * stack    — denoise_wavelet on a [32*16, 512, 512] batch: the
               S-fold denoise cost with NO rolls/mean (the true floor
               of any same-math formulation)
  * single   — denoise_wavelet on b32 (the 1/16 reference)
  * rollonly — the 16 rolls + un-rolls + mean alone (overhead leg)

prod ≈ stack + rollonly ⇒ the op is CLOSED (the cost IS 16 denoises);
a large gap ⇒ the vmap layout wastes something worth chasing.

Run: python benchmarks/cyclespin_ab.py [--modes prod,stack,...]
Child: python benchmarks/cyclespin_ab.py --child MODE
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

BATCH, H, W = 32, 512, 512


def child(mode: str) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mies_tpu.utils.profiling import (device_sync,
                                          enable_compilation_cache,
                                          time_fn)

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, H, W), dtype=np.float32))
    if mode == "prod":
        from mies_tpu.ops.wavelet import cycle_spin

        fn = jax.jit(jax.vmap(lambda v: cycle_spin(v)))
    elif mode == "single":
        from mies_tpu.ops.wavelet import denoise_wavelet

        fn = jax.jit(jax.vmap(lambda v: denoise_wavelet(v)))
    elif mode == "stack":
        from mies_tpu.ops.wavelet import denoise_wavelet

        big = jnp.asarray(
            rng.random((BATCH * 16, H, W), dtype=np.float32))

        fn0 = jax.jit(jax.vmap(lambda v: denoise_wavelet(v)))
        device_sync(fn0(big))
        res = time_fn(fn0, big, iters=4, repeats=3)
        print(json.dumps({
            "mode": mode,
            "ms_per_batch": res["ms_per_call"],
            "slices_per_sec": BATCH / res["ms_per_call"] * 1000.0,
            "note": "b32 equivalents (16x stack per call)",
            "backend": jax.default_backend(),
        }), flush=True)
        return 0
    elif mode == "rollonly":
        shifts = [(dy, dx) for dy in range(4) for dx in range(4)]

        def roll_mean(img):
            rolled = jnp.stack(
                [jnp.roll(img, s, axis=(0, 1)) for s in shifts])
            unrolled = jnp.stack([
                jnp.roll(rolled[i] * 1.0001, (-dy, -dx), axis=(0, 1))
                for i, (dy, dx) in enumerate(shifts)
            ])
            return jnp.mean(unrolled, axis=0)

        fn = jax.jit(jax.vmap(roll_mean))
    else:
        raise SystemExit(f"unknown mode {mode}")
    device_sync(fn(x))
    res = time_fn(fn, x, iters=4, repeats=3)
    print(json.dumps({
        "mode": mode,
        "ms_per_batch": res["ms_per_call"],
        "slices_per_sec": BATCH / res["ms_per_call"] * 1000.0,
        "backend": jax.default_backend(),
    }), flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child")
    ap.add_argument("--modes", default="prod,stack,single,rollonly")
    args = ap.parse_args()
    if args.child:
        return child(args.child)
    for mode in args.modes.split(","):
        r = subprocess.run(
            [sys.executable, __file__, "--child", mode],
            cwd=ROOT, timeout=3600,
        )
        if r.returncode:
            print(f"mode {mode} failed rc={r.returncode}",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
