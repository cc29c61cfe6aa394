"""Dense-kernel 2-D conv A/B (round-8 census finding: `gabor` 598 ms,
`gabor_bank` 542 ms, `motion_blur` 34 ms per b32 512² — all ride
``lax.conv_general_dilated`` with ONE input channel, the documented
20x-slow lowering; the census made the cost visible for the first
time).

Forms timed, per op, each in-process (no trace-time knobs involved):

  conv     — production lax.conv_general_dilated (HIGHEST)
  shifted  — kh*kw static shifted multiply-adds (the _conv1d_shifted
             recipe in 2-D; exact taps, fused VPU)
  fft      — rfft2(xp) * conj(rfft2(kernel)) -> irfft2, VALID window
             (kernel FFT precomputed host-side in f64; one forward
             transform shared by every channel — the bank's winner if
             XLA:TPU's FFT is healthy)

Run: python benchmarks/gabor_ab.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

BATCH, H, W = 32, 512, 512


def main() -> int:
    import jax
    import jax.numpy as jnp

    from mies_tpu.ops.filters import _pad2d, gabor_kernel
    from mies_tpu.utils.profiling import (
        device_sync, enable_compilation_cache, time_fn,
    )

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, H, W), dtype=np.float32))

    g = gabor_kernel(0.1, 0.0, 1.0, None, None, 3, 0.0)
    kre = np.ascontiguousarray(g.real[::-1, ::-1], dtype=np.float32)
    kim = np.ascontiguousarray(g.imag[::-1, ::-1], dtype=np.float32)
    ry, rx = g.shape[0] // 2, g.shape[1] // 2
    print(f"kernel {g.shape}", file=sys.stderr)

    def pad(img):
        return _pad2d(img.astype(jnp.float32), ry, rx, "reflect")

    def form_conv(img):
        from jax import lax

        xp = pad(img)
        taps = jnp.asarray(np.stack([kre, kim])[:, None])
        out = lax.conv_general_dilated(
            xp[None, None], taps, (1, 1), "VALID",
            precision=lax.Precision.HIGHEST,
        )[0]
        return jnp.sqrt(out[0] ** 2 + out[1] ** 2)

    def form_shifted(img):
        xp = pad(img)
        kh, kw = kre.shape
        accs = [None, None]
        for ky in range(kh):
            row = xp[ky:ky + H, :]
            for ci, k2 in enumerate((kre, kim)):
                racc = np.float32(k2[ky, 0]) * row[:, 0:W]
                for t in range(1, kw):
                    racc = racc + np.float32(k2[ky, t]) * row[:, t:t + W]
                accs[ci] = racc if accs[ci] is None else accs[ci] + racc
        return jnp.sqrt(accs[0] ** 2 + accs[1] ** 2)

    def form_fft(img):
        xp = pad(img)
        hp, wp = xp.shape
        f = jnp.fft.rfft2(xp)
        outs = []
        for k2 in (kre, kim):
            # circular CONVOLUTION with the (already-flipped) taps at
            # the origin == the correlation the other forms compute;
            # the linear 'valid' window sits at [kh-1:, kw-1:] and the
            # circular wrap only contaminates rows/cols before it
            kf = np.zeros((hp, wp), np.float64)
            kf[: k2.shape[0], : k2.shape[1]] = k2
            kf_c = jnp.asarray(np.fft.rfft2(kf).astype(np.complex64))
            outs.append(jnp.fft.irfft2(f * kf_c, s=(hp, wp)))
        kh, kw = kre.shape
        re = outs[0][kh - 1:kh - 1 + H, kw - 1:kw - 1 + W]
        im = outs[1][kh - 1:kh - 1 + H, kw - 1:kw - 1 + W]
        return jnp.sqrt(re ** 2 + im ** 2)

    forms = {"conv": form_conv, "shifted": form_shifted, "fft": form_fft}
    ref = None
    for name, f in forms.items():
        fn = jax.jit(jax.vmap(f))
        try:
            out = np.asarray(fn(x))
        except Exception as e:
            print(json.dumps({"form": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        if ref is None:
            ref = out
        res = time_fn(fn, x, iters=4, repeats=3)
        print(json.dumps({
            "form": name, "ms_per_batch": res["ms_per_call"],
            "slices_per_sec": BATCH / res["ms_per_call"] * 1000.0,
            "max_vs_conv": float(np.abs(out - ref).max()),
            "backend": jax.default_backend(),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
