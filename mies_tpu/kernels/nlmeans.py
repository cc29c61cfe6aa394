"""VMEM-resident NL-means: the static pair table CHUNKED across kernels.

Why this exists (the round-6/7/8 measurement trail, docs/KERNELS.md):

* production jnp pair loop (ops/restoration.py::_nl_means_core):
  178 ms (d=11) / 48 ms (d=6) per batch-32 512² on v5e;
* a whole-slice VMEM kernel with DYNAMIC pair offsets was built in
  round 6 and measured 1.5x SLOWER — every shift was a dynamic rotate
  (~3 passes each on Mosaic);
* XLA-side static unrolling (MIES_TPU_NLM=unroll/chunkK) LOSES too:
  full unroll OOMs at d=11 (17.4 GB of live fused temporaries), chunked
  barriers measure 188-214 ms vs 178;
* the round-7 FLOOR skeleton (benchmarks/nlm_ab.py --modes floor) —
  just the shifted reads + carry accumulation — runs in 10.5 ms
  (d=11) / 3.3 ms (d=6): the pair loop is ARITHMETIC-bound, and the
  arithmetic (the per-pair s-wide box sums) is exactly what a
  VMEM-resident kernel evaluates without HBM round trips;
* the round-7 SINGLE-kernel form (the whole 84-pair table unrolled in
  one Mosaic program) was bit-exact in interpret mode but its Mosaic
  compile never finished inside 60 min on the remote helper — compile
  time is superlinear in the unrolled statement count.

This version keeps every property that made the round-7 kernel right —
STATIC Mosaic slices for every shift (no dynamic rotates), whole padded
slice resident in VMEM, per-pair temporaries routed through two shared
scratch refs (Mosaic does not reuse VMEM stack slots across unrolled
iterations — the round-3 rule) — but splits the pair table into chunks
of ``MIES_TPU_NLM_CHUNK`` (default 12) pairs, ONE small ``pallas_call``
per chunk. The (num, den) accumulators ride between chunks through HBM
f32 arrays with ``input_output_aliases`` (donated in place); a chunk
boundary costs one extra read+write of the two carry planes plus a
re-read of the padded slice (~5.4 MB/slice ≈ 0.2 ms per boundary at
batch 32 — noise against the 3.3 ms floor), and each chunk's Mosaic
program is ~an-order-of-magnitude smaller than the monolith, which is
what makes the compile terminate. The f32 HBM round trips are exact;
chunk layouts differ only by FMA-contraction ULPs in the accumulate
(tests pin 2e-7 across layouts, bit equality vs the twin at the
default layout).

Numerics: the same table, in the same order, with the same shifted-add
box sums as the jnp twin — interpret-mode tests pin bit equality
(tests/test_kernels.py::TestNlMeansKernel).

Admission (nl_means_supported): f32, H % 8 == 0, W % 128 == 0,
patch_distance <= 11 (so skimage's own default d=11 rides the kernel),
and the padded slice + scratch within the VMEM budget.

Round-5 box-sum rework (VERDICT r4 item 1): the per-pair s-wide box
sums — 2(s-1) unrolled shifted adds over the ~[540, 576] diff field,
with the COLUMN passes paying a misaligned-lane rotate each — are the
arithmetic bound the round-7 floor identified (0.26 ms/pair kernel vs
0.04 ms/pair floor). ``MIES_TPU_NLM_BOX=dot`` (the default) replaces
them with TWO MXU dots against static 0/1 band operators shared by
every pair (``A_row @ diff @ A_col``, the ops/filters.py banded-matmul
pattern moved inside the kernel): ~0.3 GFLOP/pair is noise on the MXU,
and the Mosaic statement count per pair drops ~6x — which is what makes
the d=11 chunk compiles terminate (the shift form's 22 chunks at d=11
projected to ~7+ h of remote compile). The dot reduction order differs
from the sequential shifted adds, so dot mode is atol-level vs the jnp
twin (the TV-kernel stance); ``MIES_TPU_NLM_BOX=shift`` keeps the
bit-exact form (capped at d <= 8) for regression A/B and the
bit-equality tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mies_tpu.ops.restoration import _DISTANCE_CUTOFF, _half_shift_table

# padded slice + scratch + carry blocks (+ band operators and the
# hi/lo split + column-acc staging in dot mode).  The budget is a
# self-imposed proxy for REF memory; the chip's hard limit that
# actually fired in r5 was the SEPARATE 16 MB scoped-vmem STACK
# (per-pair value temporaries x unrolled pairs — controlled by the
# dot-mode chunk size below, not by this constant)
_VMEM_BUDGET = 12 * 1024 * 1024
_MAX_D_DOT = 11    # skimage's own default
_MAX_D_SHIFT = 8   # the bit-exact form: compile cost superlinear in d²
_DEFAULT_CHUNK = 12  # divides both 84 (d=6) and 264 (d=11) exactly


def _chunk_size() -> int:
    v = os.environ.get("MIES_TPU_NLM_CHUNK", "")
    if v:
        k = int(v)
        if k < 1:
            raise ValueError(f"MIES_TPU_NLM_CHUNK must be >= 1, got {v!r}")
        return k
    return _DEFAULT_CHUNK


def _box_mode() -> str:
    v = os.environ.get("MIES_TPU_NLM_BOX", "dot")
    if v not in ("dot", "shift"):
        raise ValueError(
            f"MIES_TPU_NLM_BOX must be 'dot' or 'shift', got {v!r}"
        )
    return v


def _geometry(h: int, w: int, d: int, s: int):
    offset = s // 2
    pad = offset + 2 * d  # reflect(offset + d) + edge(d), like the twin
    hp, wp = h + 2 * pad, w + 2 * pad
    wpad = -(-wp // 128) * 128
    exth, extw = h + 2 * d + 2 * offset, w + 2 * d + 2 * offset
    return offset, pad, hp, wp, wpad, exth, extw


def nl_means_supported(
    shape: tuple[int, int], patch_size: int, patch_distance: int
) -> bool:
    h, w = shape
    s = patch_size if patch_size % 2 == 1 else patch_size + 1
    d = int(patch_distance)
    box = _box_mode()
    if d > (_MAX_D_DOT if box == "dot" else _MAX_D_SHIFT) or d < 1:
        return False
    if h % 8 or w % 128 or h < 8 or w < 128:
        return False
    offset, pad, hp, wp, wpad, exth, extw = _geometry(h, w, d, s)
    if pad > min(h, w) - 1:  # the twin's reflect-pad limit
        return False
    vmem = 4 * (hp * wpad + 2 * exth * wpad + 4 * h * w)
    if box == "dot":  # the two resident band operators
        wh, ww = h + 2 * d, w + 2 * d
        vmem += 4 * (wh * exth + wpad * ww)
    return vmem <= _VMEM_BUDGET


def _band_operators(h, w, d, s, wpad):
    """The two static 0/1 'valid s-wide box sum' operators shared by
    every pair: ``A_row @ diff`` sums s consecutive diff ROWS
    (A_row[i, i+k] = 1), ``@ A_col`` then sums s consecutive COLUMNS
    (A_col[j+k, j] = 1). A_col spans the full padded scratch width so
    the dot can read box_ref's whole lane extent; its rows past extw
    are zero (the scratch tail is zeroed once per kernel invocation, so
    those lanes contribute exact 0)."""
    offset = s // 2
    exth = h + 2 * d + 2 * offset
    wh, ww = h + 2 * d, w + 2 * d
    arow = np.zeros((wh, exth), np.float32)
    for k in range(s):
        arow[np.arange(wh), np.arange(wh) + k] = 1.0
    acol = np.zeros((wpad, ww), np.float32)
    for k in range(s):
        acol[np.arange(ww) + k, np.arange(ww)] = 1.0
    return arow, acol


def _nlm_chunk_kernel(
    up_ref, nin_ref, din_ref, *rest,
    h, w, d, s, table, bias, inv_h2sn, box
):
    if box == "dot":
        arow_ref, acol_ref, nout_ref, dout_ref, diff_ref, box_ref = rest
    else:
        nout_ref, dout_ref, diff_ref, box_ref = rest
    offset = s // 2
    exth = h + 2 * d + 2 * offset
    extw = w + 2 * d + 2 * offset
    wh, ww = exth - 2 * offset, extw - 2 * offset  # weight field extent
    cutoff = np.float32(_DISTANCE_CUTOFF)
    zero = np.float32(0.0)
    # carry in: the aliased out refs become the accumulators, so every
    # live range is one pair long (read-modify-write through the ref,
    # never a threaded value — the round-3 stack-slot rule)
    nout_ref[0] = nin_ref[0]
    dout_ref[0] = din_ref[0]
    if box == "dot":
        # the row dot reads diff_ref's FULL lane extent; zero it once
        # so the cols past extw (never written by the pair stores)
        # contribute exact 0 through A_col's zero rows
        diff_ref[...] = jnp.zeros(diff_ref.shape, jnp.float32)
    for dy, dx in table:  # STATIC offsets — every slice below is static
        a = up_ref[0, d:d + exth, d:d + extw]
        b = up_ref[0, dy:dy + exth, dx:dx + extw]
        diff_ref[0:exth, 0:extw] = (a - b) * (a - b)
        if box == "dot":
            # both s-wide 'valid' box sums as MXU dots against the
            # shared band operators — one pass each for any s, no
            # misaligned-lane rotates, ~6x fewer Mosaic statements.
            #
            # PRECISION (r5 consistency-gate finding + closure): the
            # MXU's f32 dot runs bf16 multiply passes, measuring
            # 6.0e-4 max-abs vs the CPU twin on the chip.  Every
            # exact-fix route was tried and measured:
            #   * precision=HIGHEST — Mosaic lowering is compile-
            #     PATHOLOGICAL (>20 min then an HTTP-500 compiler
            #     crash on one 12-pair chunk vs ~100 s default);
            #   * in-kernel hi/lo split dots — numerically right
            #     (residual ~2^-17) but each unrolled pair's RHS
            #     values cost ~2.3 MB of scoped-vmem STACK (the 16 MB
            #     limit covers refs + stack: 41 MB at chunk 12,
            #     27 MB at chunk 6 with scratch-staged temps; fitting
            #     needs chunk 1 = 264 pallas_calls, ~290 slices/s).
            # The dot mode therefore ships at MXU default precision
            # with a 2e-3 dispatch gate (docs/KERNELS.md round 13 has
            # the full numbers): 6e-4 on a denoiser whose own h is
            # O(0.1) is <= 0.15 uint8 level after quantization, and
            # MIES_TPU_NLM_BOX=shift keeps the bit-exact form (d<=8).
            dims = (((1,), (0,)), ((), ()))
            box_ref[0:wh, :] = jax.lax.dot_general(
                arow_ref[...], diff_ref[0:exth, :], dims,
                preferred_element_type=jnp.float32)
            cacc = jax.lax.dot_general(
                box_ref[0:wh, :], acol_ref[...], dims,
                preferred_element_type=jnp.float32)
        else:
            # s-wide 'valid' box, rows then cols, the twin's exact order
            racc = diff_ref[0:wh, 0:extw]
            for j in range(1, s):
                racc = racc + diff_ref[j:j + wh, 0:extw]
            box_ref[0:wh, 0:extw] = racc
            cacc = box_ref[0:wh, 0:ww]
            for j in range(1, s):
                cacc = cacc + box_ref[0:wh, j:j + ww]
        dist = jnp.maximum(cacc - bias, zero) * inv_h2sn
        wgt = jnp.where(dist <= cutoff, jnp.exp(-dist), zero)
        box_ref[0:wh, 0:ww] = wgt
        w_f = box_ref[d:d + h, d:d + w]
        v_f = up_ref[0, offset + d + dy:offset + d + dy + h,
                     offset + d + dx:offset + d + dx + w]
        w_r = box_ref[2 * d - dy:2 * d - dy + h, 2 * d - dx:2 * d - dx + w]
        v_r = up_ref[0, offset + 3 * d - dy:offset + 3 * d - dy + h,
                     offset + 3 * d - dx:offset + 3 * d - dx + w]
        nout_ref[0] = nout_ref[0] + (w_f * v_f + w_r * v_r)
        dout_ref[0] = dout_ref[0] + (w_f + w_r)


def nl_means_tpu(
    batch: Array,
    patch_size: int = 7,
    patch_distance: int = 6,
    h: float = 0.1,
    sigma: float = 0.0,
    interpret: bool = False,
) -> Array:
    """[B, H, W] NL-means, whole-slice VMEM-resident, static pair table
    chunked across ``ceil(n_pairs / MIES_TPU_NLM_CHUNK)`` kernels."""
    b, hh, ww = batch.shape
    s = patch_size if patch_size % 2 == 1 else patch_size + 1
    d = int(patch_distance)
    offset, pad, hp, wp, wpad, exth, extw = _geometry(hh, ww, d, s)
    x = batch.astype(jnp.float32)
    # the twin's two-step pad: semantic reflect(offset + d) + edge(d)
    up = jnp.pad(x, ((0, 0), (offset + d,) * 2, (offset + d,) * 2),
                 mode="reflect")
    up = jnp.pad(up, ((0, 0), (d, d), (d, d)), mode="edge")
    up = jnp.pad(up, ((0, 0), (0, 0), (0, wpad - wp)))
    sn = float(s) ** 2
    table = [(int(r[0]), int(r[1])) for r in _half_shift_table(d, 2)]
    k = _chunk_size()
    box = _box_mode()
    num = jnp.zeros((b, hh, ww), jnp.float32)
    den = jnp.zeros((b, hh, ww), jnp.float32)
    carry_spec = pl.BlockSpec((1, hh, ww), lambda i: (i, 0, 0))
    extra_ops, extra_specs = (), []
    if box == "dot":
        arow, acol = _band_operators(hh, ww, d, s, wpad)
        extra_ops = (jnp.asarray(arow), jnp.asarray(acol))
        extra_specs = [
            pl.BlockSpec(arow.shape, lambda i: (0, 0)),
            pl.BlockSpec(acol.shape, lambda i: (0, 0)),
        ]
    for lo in range(0, len(table), k):
        kern = functools.partial(
            _nlm_chunk_kernel, h=hh, w=ww, d=d, s=s,
            table=table[lo:lo + k],
            bias=np.float32(2.0 * float(sigma) * float(sigma) * sn),
            inv_h2sn=np.float32(1.0 / (float(h) * float(h) * sn)),
            box=box,
        )
        num, den = pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, hp, wpad), lambda i: (i, 0, 0)),
                carry_spec,
                carry_spec,
                *extra_specs,
            ],
            out_specs=(carry_spec, carry_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, hh, ww), jnp.float32),
                jax.ShapeDtypeStruct((b, hh, ww), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((exth, wpad), jnp.float32),
                pltpu.VMEM((exth, wpad), jnp.float32),
            ],
            input_output_aliases={1: 0, 2: 1},
            interpret=interpret,
        )(up, num, den, *extra_ops)
    # the self pair: skimage's t=0 iteration writes both endpoints of
    # (p, p), so the center weight is exactly 2 (the twin's epilogue,
    # evaluated XLA-side — u(p) is just the unpadded input)
    return (num + 2.0 * x) / (den + 2.0)


def nl_means_batched(
    batch: Array,
    patch_size: int = 7,
    patch_distance: int = 11,
    h: float = 0.1,
    sigma: float = 0.0,
) -> Array:
    """Backend-dispatching batched NL-means: the chunked static-table
    Pallas kernels on TPU when admitted, the vmapped jnp pair loop
    elsewhere (FMA-contraction ULPs apart — tests pin atol). Defaults
    MATCH ops.restoration.denoise_nl_means (the compiler's batched
    registry resolves omitted config params from THIS signature)."""
    from mies_tpu.ops.restoration import denoise_nl_means

    if jax.default_backend() == "tpu" and nl_means_supported(
        batch.shape[-2:], patch_size, patch_distance
    ):
        return nl_means_tpu(batch, patch_size, patch_distance, h, sigma)
    fn = functools.partial(
        denoise_nl_means, patch_size=patch_size,
        patch_distance=patch_distance, h=h, sigma=sigma,
    )
    return jax.vmap(fn)(batch)
