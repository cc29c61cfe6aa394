"""NL-means A/B harness (VERDICT r3 item 2 — the 7x roofline gap).

Times the production denoise_nl_means variants on the chip, each in its
OWN subprocess (the MIES_TPU_NLM knob is read at trace time, so
in-process flips would silently reuse the first variant's jit cache):

  * fori    — production lax.fori_loop over the symmetric-pair table
              (dynamic_slice shifts; the round-6 recorded 178/40 ms)
  * unroll  — the same math statically unrolled (static slices; XLA can
              fuse several pairs per HBM pass)
  * kernel  — the Pallas multi-pair group kernel (kernels/nlmeans.py),
              present only when that module ships

Run: python benchmarks/nlm_ab.py [--modes fori,unroll] [--d 11,5]
Child: python benchmarks/nlm_ab.py --child MODE --d D
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

BATCH, H, W = 32, 512, 512


def child(mode: str, d: int) -> int:
    os.environ["MIES_TPU_NLM"] = mode if mode not in ("kernel", "floor") else "fori"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mies_tpu.utils.profiling import device_sync, enable_compilation_cache, time_fn

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, H, W), dtype=np.float32))
    if mode == "floor":
        # Measured FLOOR skeleton (the tile33-apply closure pattern):
        # the pair loop's irreducible dataflow — per pair, ONE shifted
        # dynamic-slice read of the padded field and the two carry
        # accumulations — with the patch box-sum, exp, and value/weight
        # window arithmetic all deleted. Any implementation that keeps
        # the pair loop must at least stream these reads and carries,
        # so production / floor bounds the remaining headroom.
        from jax import lax

        from mies_tpu.ops.restoration import _half_shift_table

        s = 7 if d > 6 else 5
        offset = s // 2
        table = jnp.asarray(_half_shift_table(d, 2))

        def one(u):
            up = jnp.pad(u, d + offset, mode="reflect")
            ext = tuple(n + 2 * d + 2 * offset for n in u.shape)

            def body(i, c):
                num, den = c
                dec = table[i]
                shifted = lax.dynamic_slice(up, (dec[0], dec[1]), ext)
                w = shifted[offset:-offset or None, offset:-offset or None][
                    : u.shape[0], : u.shape[1]
                ]
                return num + w, den + w * 2.0

            n_half = ((2 * d + 1) ** 2 - 1) // 2
            z = jnp.zeros(u.shape, jnp.float32)
            num, den = lax.fori_loop(0, n_half, body, (z, z))
            return num / (den + 2.0)

        fn = jax.jit(jax.vmap(one))
    elif mode == "kernel":
        from mies_tpu.kernels.nlmeans import nl_means_batched

        fn = jax.jit(
            lambda v: nl_means_batched(
                v, patch_size=(7 if d > 6 else 5), patch_distance=d,
                h=0.06, sigma=0.04
            )
        )
    else:
        from mies_tpu.ops.restoration import denoise_nl_means

        fn = jax.jit(
            jax.vmap(
                lambda v: denoise_nl_means(
                    v, patch_size=(7 if d > 6 else 5), patch_distance=d,
                h=0.06, sigma=0.04
                )
            )
        )
    device_sync(fn(x))  # compile
    res = time_fn(fn, x, iters=4, repeats=3)
    out = {
        "mode": mode,
        "d": d,
        "ms_per_batch": res["ms_per_call"],
        "slices_per_sec": BATCH / res["ms_per_call"] * 1000.0,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", help="(internal) run one mode in-process")
    ap.add_argument("--modes", default="fori,unroll")
    ap.add_argument("--d", default="11,5")
    args = ap.parse_args()
    if args.child:
        return child(args.child, int(args.d))
    for d in args.d.split(","):
        for mode in args.modes.split(","):
            r = subprocess.run(
                [sys.executable, __file__, "--child", mode, "--d", d],
                cwd=ROOT, timeout=3600,
            )
            if r.returncode:
                print(f"mode {mode} d={d} failed rc={r.returncode}",
                      file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
