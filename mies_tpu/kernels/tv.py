"""VMEM-resident Chambolle total-variation denoising kernel.

The jnp form (ops/restoration.py::_tv_chambolle_core) runs one
``lax.while_loop`` whose body touches p (2 planes), out, the gradient
pair and the energy reductions — measured 29.5 ms per batch-32 512^2 on
v5e at the census defaults (weight 0.1, eps 2e-4), which early-stops
after ~23 iterations on noise: ~1.28 ms/iteration-batch, ~6x the HBM
roofline of the ~5 plane round trips an ideally-fused iteration needs.
The dual field is PERFECT residency material: p never leaves the
iteration, so holding img + p1 + p2 + out in VMEM pays two HBM round
trips per slice TOTAL (read img, write out).

Formulation notes (mirrors the twin statement for statement):

* divergence/gradient pads become ``pltpu.roll`` + iota edge masks —
  the same identity the diffusion kernels use (rolled-in lanes are
  exactly the padded zeros);
* the energy test needs GLOBAL sums: ``jnp.sum`` reduces to an SMEM
  scalar in-kernel. Reduction order differs from XLA's tree on the
  jnp path, so E drifts by float ULPs — on a knife-edge input the
  early-stop could fire one iteration apart from the twin. Tests pin
  atol on fixed inputs (the bilateral precedent: dispatched-path
  tolerance, not bit equality); the per-slice while_loop otherwise
  matches vmap-of-while semantics exactly (vmap masks converged lanes
  with select, reproducing per-slice iteration counts).

Admission: f32 tiling (h % 8 == 0, w % 128 == 0) and slice <= 1 MB
(512^2) — the while carry holds 3 slice-sized planes next to ~5 live
temporaries (the SRAD budget class). Everything else takes the jnp
fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_SLICE_LIMIT = 1024 * 1024  # 512^2 f32; carry keeps 3 live planes


def tv_supported(shape: tuple[int, int]) -> bool:
    h, w = shape
    return (
        h % 8 == 0 and w % 128 == 0 and h >= 8 and w >= 128
        and h * w * 4 <= _VMEM_SLICE_LIMIT
    )


def _tv_kernel(x_ref, out_ref, *, weight, eps, max_num_iter, h, w):
    img = x_ref[0]
    size = np.float32(float(h * w))
    tau = np.float32(0.25)  # 1 / (2 * ndim), ndim == 2
    wgt = np.float32(weight)
    eps32 = np.float32(eps)
    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    first_row, last_row = rows == 0, rows == h - 1
    first_col, last_col = cols == 0, cols == w - 1
    zero = np.float32(0.0)

    def body(carry):
        i, p1, p2, _, e_prev, e_init, _ = carry
        # divergence of p: d = -(p1 + p2) + shift-down(p1) + shift-right(p2)
        # (the twin's jnp.pad((1,0)) head == rolled plane with the
        # wrapped first row/col masked to the pad's zeros)
        d = -(p1 + p2)
        d = d + jnp.where(first_row, zero, pltpu.roll(p1, 1, 0))
        d = d + jnp.where(first_col, zero, pltpu.roll(p2, 1, 1))
        out = img + d
        e = jnp.sum(d * d)
        # forward-difference gradient of out, 0 on the far edge
        # (== the twin's jnp.pad((0,1)) tail)
        g1 = jnp.where(last_row, zero, pltpu.roll(out, h - 1, 0) - out)
        g2 = jnp.where(last_col, zero, pltpu.roll(out, w - 1, 1) - out)
        norm = jnp.sqrt(g1 * g1 + g2 * g2)
        e = (e + wgt * jnp.sum(norm)) / size
        factor = 1.0 + (tau / wgt) * norm
        p1 = (p1 - tau * g1) / factor
        p2 = (p2 - tau * g2) / factor
        e_init = jnp.where(i == 0, e, e_init)
        stop = (i > 0) & (jnp.abs(e_prev - e) < eps32 * e_init)
        return i + 1, p1, p2, out, e, e_init, stop

    def cond(carry):
        i, _, _, _, _, _, stop = carry
        return (i < max_num_iter) & (~stop)

    init = (
        jnp.int32(0),
        jnp.zeros((h, w), jnp.float32),
        jnp.zeros((h, w), jnp.float32),
        img,
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.bool_(False),
    )
    _, _, _, out, _, _, _ = lax.while_loop(cond, body, init)
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=("weight", "eps", "max_num_iter", "interpret"),
)
def denoise_tv_tpu(
    batch: Array,
    weight: float,
    eps: float,
    max_num_iter: int,
    interpret: bool = False,
) -> Array:
    n, h, w = batch.shape
    kern = functools.partial(
        _tv_kernel, weight=float(weight), eps=float(eps),
        max_num_iter=int(max_num_iter), h=h, w=w,
    )
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(batch.astype(jnp.float32))


def denoise_tv_batched(
    batch: Array,
    weight: float = 0.1,
    eps: float = 2e-4,
    max_num_iter: int = 200,
) -> Array:
    """Backend-dispatching batched TV denoise: Pallas on TPU, vmapped
    jnp elsewhere (energy-sum reduction-order ULPs apart — tests pin
    atol on the dispatched path, the bilateral precedent)."""
    from mies_tpu.ops.restoration import denoise_tv

    if max_num_iter < 1:
        raise ValueError("max_num_iter must be >= 1")
    if jax.default_backend() == "tpu" and tv_supported(batch.shape[-2:]):
        return denoise_tv_tpu(batch, weight, eps, max_num_iter)
    fn = functools.partial(
        denoise_tv, weight=weight, eps=eps, max_num_iter=max_num_iter
    )
    return jax.vmap(fn)(batch)
