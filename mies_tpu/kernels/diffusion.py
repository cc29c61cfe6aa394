"""VMEM-resident Perona-Malik diffusion kernel.

The jnp form (ops/restoration.py::_pm_run) pays one full HBM round
trip PER ITERATION — XLA materializes the edge-padded array and the
per-axis diffs, measured 0.69 ms/iteration for batch-32 512^2 on v5e
(~8x the 0.08 ms/iteration HBM roofline of read-1MB + write-1MB per
slice). This kernel holds the WHOLE slice in VMEM and runs every
iteration in-register: one read + one write per slice TOTAL, so cost
is ~flat in ``niter`` instead of linear.

Formulation: wrap-around shifts (``pltpu.roll``) with iota boundary
masks replace the twin's edge-replicate pads — at the boundaries the
Perona-Malik fluxes are identically zero, so masking the wrapped lanes
to 0 reproduces the pad semantics EXACTLY. The per-axis terms are
bit-equal to the twin's eager values (verified); the full kernel is
NOT bit-exact vs the jitted twin because XLA FMA-contracts the twin's
mul+add chains (the documented CLAUDE.md class) — drift is ~1 ULP per
iteration. Tests pin atol 1e-6 at 9 iterations (interpret mode,
tests/test_kernels.py) and the chip contract
(tpu_consistency_driver.py::anisotropic_diffusion_vs_cpu) covers the
dispatched path at 2e-5.

Admission: f32 tiling (h % 8 == 0, w % 128 == 0) and the slice + ~6
live temporaries within the house VMEM budget. Everything else takes
the jnp fallback — identical numerics either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# slice + in/out pipeline buffers + loop temporaries; 2 MB slices
# (<= 724^2) keep the peak well under the ~16 MB/core VMEM
_VMEM_SLICE_LIMIT = 2 * 1024 * 1024


def pm_supported(shape: tuple[int, int]) -> bool:
    h, w = shape
    return (
        h % 8 == 0 and w % 128 == 0 and h >= 8 and w >= 128
        and h * w * 4 <= _VMEM_SLICE_LIMIT
    )


def _pm_kernel(x_ref, out_ref, *, niter, kappa, gamma, option, h, w):
    x = x_ref[0]
    inv_k2 = np.float32(1.0 / (float(kappa) * float(kappa)))
    g32 = np.float32(gamma)
    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    first_row, last_row = rows == 0, rows == h - 1
    first_col, last_col = cols == 0, cols == w - 1
    zero = np.float32(0.0)

    def cond(d):
        if option == 1:
            return jnp.exp(-(d * d) * inv_k2)
        return 1.0 / (1.0 + (d * d) * inv_k2)

    def step(_, v):
        # axis 0: forward diff (0 past the last row == replicate pad),
        # conduction, flux, backward-difference divergence (0 flux
        # crossing the first row) — the twin's exact operand order
        d0 = jnp.where(last_row, zero, pltpu.roll(v, h - 1, 0) - v)
        f0 = (g32 * cond(d0)) * d0
        div0 = f0 - jnp.where(first_row, zero, pltpu.roll(f0, 1, 0))
        # axis 1 (lane shifts)
        d1 = jnp.where(last_col, zero, pltpu.roll(v, w - 1, 1) - v)
        f1 = (g32 * cond(d1)) * d1
        div1 = f1 - jnp.where(first_col, zero, pltpu.roll(f1, 1, 1))
        return v + (div0 + div1)

    out_ref[0] = lax.fori_loop(0, niter, step, x)


def anisotropic_diffusion_tpu(
    batch: Array,
    niter: int = 10,
    kappa: float = 50.0,
    gamma: float = 0.1,
    option: int = 1,
    interpret: bool = False,
) -> Array:
    """[B, H, W] Perona-Malik, whole-slice-resident (one program per
    slice; all iterations in VMEM)."""
    b, h, w = batch.shape
    kern = functools.partial(
        _pm_kernel, niter=int(niter), kappa=float(kappa),
        gamma=float(gamma), option=int(option), h=h, w=w,
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(batch.astype(jnp.float32))


def anisotropic_diffusion_batched(
    batch: Array,
    niter: int = 10,
    kappa: float = 50.0,
    gamma: float = 0.1,
    option: int = 1,
) -> Array:
    """Backend-dispatching batched diffusion: Pallas on TPU, vmapped
    jnp elsewhere (FMA-contraction ULPs apart — tests pin atol)."""
    from mies_tpu.ops.restoration import anisotropic_diffusion

    if niter < 1:
        raise ValueError("niter must be >= 1")
    if option not in (1, 2):
        raise ValueError("option must be 1 (exponential) or 2 (inverse)")
    if jax.default_backend() == "tpu" and pm_supported(batch.shape[-2:]):
        return anisotropic_diffusion_tpu(batch, niter, kappa, gamma, option)
    fn = functools.partial(
        anisotropic_diffusion, niter=niter, kappa=kappa, gamma=gamma,
        option=option,
    )
    return jax.vmap(fn)(batch)


def srad_supported(shape: tuple[int, int]) -> bool:
    """SRAD keeps ~2x the PM kernel's live slice-sized temporaries
    (v, four diffs, c, the two virtual-ring conduction maps, the
    shifted c's), so its admission is half PM's slice budget — 1 MB
    (512x512 f32, the measured shape); larger slices risk a Mosaic
    VMEM-exhaustion COMPILE error with no fallback (review finding)."""
    h, w = shape
    return (
        h % 8 == 0 and w % 128 == 0 and h >= 8 and w >= 128
        and h * w * 4 <= _VMEM_SLICE_LIMIT // 2
    )


def _srad_kernel(x_ref, out_ref, *, niter, dt, q0, rho, eps, h, w):
    """VMEM-resident SRAD (ops/restoration.py::_srad_step semantics).

    The divergence reads the diffusivity ``c`` one position south/east
    — including a VIRTUAL ring computed from the edge-replicated image.
    On the replicated ring the vertical (resp. horizontal) diffs vanish
    and the lateral diffs equal the edge row's own, so the ring is
    C(0, 0, dW, dE) masked in at the last row (resp. C(dN, dS, 0, 0)
    at the last column) — three conduction evaluations per iteration
    instead of a padded array, all in-register."""
    x = x_ref[0]
    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    first_row, last_row = rows == 0, rows == h - 1
    first_col, last_col = cols == 0, cols == w - 1
    zero = np.float32(0.0)
    e32 = np.float32(eps)
    dt4 = np.float32(dt / 4.0)
    tiny = np.float32(1e-12)

    def cond(d_n, d_s, d_w, d_e, v, q02):
        ii = v + e32
        g2 = (d_n * d_n + d_s * d_s + d_w * d_w + d_e * d_e) / (ii * ii)
        el = (d_n + d_s + d_w + d_e) / ii
        q2 = (np.float32(0.5) * g2
              - np.float32(1.0 / 16.0) * (el * el)) / (
            (1.0 + np.float32(0.25) * el) ** 2 + tiny
        )
        c = 1.0 / (1.0 + (q2 - q02) / (q02 * (1.0 + q02) + tiny))
        return jnp.clip(c, 0.0, 1.0)

    def step(t, v):
        q0t = np.float32(q0) * jnp.exp(
            -np.float32(rho) * t.astype(jnp.float32)
        )
        q02 = q0t * q0t
        d_n = jnp.where(first_row, zero, pltpu.roll(v, 1, 0) - v)
        d_s = jnp.where(last_row, zero, pltpu.roll(v, h - 1, 0) - v)
        d_w = jnp.where(first_col, zero, pltpu.roll(v, 1, 1) - v)
        d_e = jnp.where(last_col, zero, pltpu.roll(v, w - 1, 1) - v)
        c = cond(d_n, d_s, d_w, d_e, v, q02)
        c_vs = cond(zero, zero, d_w, d_e, v, q02)  # virtual south row
        c_ve = cond(d_n, d_s, zero, zero, v, q02)  # virtual east col
        c_s = jnp.where(last_row, c_vs, pltpu.roll(c, h - 1, 0))
        c_e = jnp.where(last_col, c_ve, pltpu.roll(c, w - 1, 1))
        div = c_s * d_s + c * d_n + c_e * d_e + c * d_w
        return v + dt4 * div

    out_ref[0] = lax.fori_loop(0, niter, step, x)


def srad_tpu(
    batch: Array,
    niter: int = 15,
    dt: float = 0.15,
    q0: float = 1.0,
    rho: float = 0.2,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Array:
    b, h, w = batch.shape
    kern = functools.partial(
        _srad_kernel, niter=int(niter), dt=float(dt), q0=float(q0),
        rho=float(rho), eps=float(eps), h=h, w=w,
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(batch.astype(jnp.float32))


def srad_batched(
    batch: Array,
    niter: int = 15,
    dt: float = 0.15,
    q0: float = 1.0,
    rho: float = 0.2,
    eps: float = 1e-6,
) -> Array:
    """Backend-dispatching batched SRAD: VMEM-resident Pallas on TPU,
    vmapped jnp elsewhere (FMA-contraction ULPs apart)."""
    from mies_tpu.ops.restoration import srad

    if niter < 1:
        raise ValueError("niter must be >= 1")
    if not 0.0 < dt <= 0.25:
        raise ValueError(f"dt must be in (0, 0.25], got {dt}")
    if q0 <= 0 or rho < 0:
        raise ValueError("q0 must be > 0 and rho >= 0")
    if jax.default_backend() == "tpu" and srad_supported(batch.shape[-2:]):
        return srad_tpu(batch, niter, dt, q0, rho, eps)
    fn = functools.partial(
        srad, niter=niter, dt=dt, q0=q0, rho=rho, eps=eps,
    )
    return jax.vmap(fn)(batch)
