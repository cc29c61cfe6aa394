"""Warp-family A/B (VERDICT r4 item 5 — rotate at 12.4 ms/b32).

The production ``_bilinear_sample`` issues FOUR independent 2-D point
gathers (one per corner).  Candidate formulations, all REQUIRED to be
bit-exact vs production (same fetched values, same float combine):

  * prod   — the shipped 4-gather sampler (ops/geometry.py)
  * patch  — ONE ``lax.gather`` of 2x2 patches at (clip(y0, h-2),
             clip(x0, w-2)) + per-corner selects: 4x less gather
             traffic, 4 selects more arithmetic
  * pair   — TWO gathers of (1, 2) row-pairs (top and bottom rows
             separately): 2x less gather traffic, smaller patches

A note on the THREE-SHEAR decomposition the verdict suggested: each
shear is a per-row 1-D translation, so on TPU it still needs a gather
(per-row offsets are data-varying lane indices), and composing three
linear interpolations is NOT scipy's order-1 rotation (one bilinear
sample) — it cannot bit-match the golden by construction.  The gather
formulation is therefore the semantic contract; this A/B attacks its
constant factor instead.

DECIDED (r5): pair won 12.09 -> 7.58 ms/b32 and SHIPPED as the
production sampler; patch recorded as a 44x dead end (534.8 ms). The
"prod" mode now measures the shipped pair form — the harness stays
for regression A/B.

Run: python benchmarks/warp_ab.py [--modes prod,patch,pair]
Child: python benchmarks/warp_ab.py --child MODE
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

BATCH, H, W = 32, 512, 512
ANGLE = 15.0


def _patch_sample(img, iy, ix, mode, cval):
    """One 2x2-patch gather + corner selects; bit-exact vs prod."""
    import jax.numpy as jnp
    from jax import lax

    h, w = img.shape
    img = img.astype(jnp.float32)
    if mode == "nearest":
        iy = jnp.clip(iy, 0.0, h - 1.0)
        ix = jnp.clip(ix, 0.0, w - 1.0)
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    fy = iy - y0
    fx = ix - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    yb = jnp.clip(y0i, 0, h - 2)
    xb = jnp.clip(x0i, 0, w - 2)
    starts = jnp.stack(
        [yb.reshape(-1), xb.reshape(-1)], axis=-1)  # [N, 2]
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patch = lax.gather(
        img, starts, dn, slice_sizes=(2, 2),
        mode=lax.GatherScatterMode.CLIP,
    ).reshape(iy.shape + (2, 2))
    # corner row/col picks: clamp(y) >= yb+1 selects patch row 1
    sy0 = jnp.clip(y0i, 0, h - 1) >= yb + 1
    sy1 = jnp.clip(y0i + 1, 0, h - 1) >= yb + 1
    sx0 = (jnp.clip(x0i, 0, w - 1) >= xb + 1)[..., None]
    sx1 = (jnp.clip(x0i + 1, 0, w - 1) >= xb + 1)[..., None]
    r0 = jnp.where(sy0[..., None], patch[..., 1, :], patch[..., 0, :])
    r1 = jnp.where(sy1[..., None], patch[..., 1, :], patch[..., 0, :])
    tl = jnp.where(sx0, r0[..., 1:2], r0[..., 0:1])[..., 0]
    tr = jnp.where(sx1, r0[..., 1:2], r0[..., 0:1])[..., 0]
    bl = jnp.where(sx0, r1[..., 1:2], r1[..., 0:1])[..., 0]
    br = jnp.where(sx1, r1[..., 1:2], r1[..., 0:1])[..., 0]
    top = tl * (1.0 - fx) + tr * fx
    bot = bl * (1.0 - fx) + br * fx
    out = top * (1.0 - fy) + bot * fy
    if mode == "constant":
        inside = (iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1)
        out = jnp.where(inside, out, jnp.float32(cval))
    return out


def _pair_sample(img, iy, ix, mode, cval):
    """Two (1, 2)-pair gathers (top / bottom corner rows)."""
    import jax.numpy as jnp
    from jax import lax

    h, w = img.shape
    img = img.astype(jnp.float32)
    if mode == "nearest":
        iy = jnp.clip(iy, 0.0, h - 1.0)
        ix = jnp.clip(ix, 0.0, w - 1.0)
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    fy = iy - y0
    fx = ix - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    xb = jnp.clip(x0i, 0, w - 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def row(yi):
        yc = jnp.clip(yi, 0, h - 1)
        starts = jnp.stack([yc.reshape(-1), xb.reshape(-1)], axis=-1)
        return lax.gather(
            img, starts, dn, slice_sizes=(1, 2),
            mode=lax.GatherScatterMode.CLIP,
        ).reshape(iy.shape + (2,))

    sx0 = (jnp.clip(x0i, 0, w - 1) >= xb + 1)[..., None]
    sx1 = (jnp.clip(x0i + 1, 0, w - 1) >= xb + 1)[..., None]
    r0 = row(y0i)
    r1 = row(y0i + 1)
    tl = jnp.where(sx0, r0[..., 1:2], r0[..., 0:1])[..., 0]
    tr = jnp.where(sx1, r0[..., 1:2], r0[..., 0:1])[..., 0]
    bl = jnp.where(sx0, r1[..., 1:2], r1[..., 0:1])[..., 0]
    br = jnp.where(sx1, r1[..., 1:2], r1[..., 0:1])[..., 0]
    top = tl * (1.0 - fx) + tr * fx
    bot = bl * (1.0 - fx) + br * fx
    out = top * (1.0 - fy) + bot * fy
    if mode == "constant":
        inside = (iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1)
        out = jnp.where(inside, out, jnp.float32(cval))
    return out


SAMPLERS = {"patch": _patch_sample, "pair": _pair_sample}


def _rotate_with(sampler, img, angle, mode="constant", cval=0.0):
    import numpy as np

    h, w = img.shape
    a = np.deg2rad(float(angle))
    c, s = np.cos(a), np.sin(a)
    import jax.numpy as jnp

    m = np.array([[c, s], [-s, c]], dtype=np.float64)
    center = np.array([(h - 1) / 2.0, (w - 1) / 2.0])
    off = center - m @ center
    oy = np.arange(h, dtype=np.float64)
    ox = np.arange(w, dtype=np.float64)
    ay = jnp.asarray((m[0, 0] * oy + off[0]).astype(np.float32))[:, None]
    by = jnp.asarray((m[0, 1] * ox).astype(np.float32))[None, :]
    ax = jnp.asarray((m[1, 0] * oy + off[1]).astype(np.float32))[:, None]
    bx = jnp.asarray((m[1, 1] * ox).astype(np.float32))[None, :]
    return sampler(img, ay + by, ax + bx, mode, cval)


def verify() -> int:
    """CPU bit-equality of every candidate vs production."""
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mies_tpu.ops.geometry import rotate

    rng = np.random.default_rng(0)
    bad = 0
    for mode in ("constant", "nearest"):
        for angle in (15.0, -37.5, 101.0):
            x = rng.random((64, 96), dtype=np.float32)
            want = np.asarray(rotate(jnp.asarray(x), angle, mode=mode,
                                     cval=0.25))
            for name, fn in SAMPLERS.items():
                got = np.asarray(_rotate_with(
                    functools.partial(fn), jnp.asarray(x), angle,
                    mode=mode, cval=0.25))
                if not np.array_equal(got, want):
                    d = np.abs(got - want)
                    print(f"MISMATCH {name} {mode} {angle}: "
                          f"{(d > 0).sum()} px, max {d.max()}")
                    bad += 1
    print("verify:", "FAIL" if bad else "OK (all bit-exact)")
    return bad


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
        from mies_tpu.ops.geometry import rotate

        fn = jax.jit(jax.vmap(lambda v: rotate(v, ANGLE)))
    else:
        sampler = SAMPLERS[mode]
        fn = jax.jit(jax.vmap(
            lambda v: _rotate_with(sampler, v, ANGLE)))
    device_sync(fn(x))
    res = time_fn(fn, x, iters=8, repeats=3)
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
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--modes", default="prod,patch,pair")
    args = ap.parse_args()
    if args.child:
        return child(args.child)
    if args.verify:
        return verify()
    for mode in args.modes.split(","):
        r = subprocess.run(
            [sys.executable, __file__, "--child", mode],
            cwd=ROOT, timeout=1800,
            env={**os.environ},
        )
        if r.returncode:
            print(f"mode {mode} failed rc={r.returncode}",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
