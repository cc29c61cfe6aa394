"""Independent NumPy/scipy implementations of the metric formulas.

Written against the published formulas (Wang & Bovik UQI/SSIM/MS-SSIM,
Sheikh & Bovik VIF, Yim & Bovik PSNR-B) using scipy.ndimage/signal —
deliberately a DIFFERENT code path from mies_tpu.eval.metrics (which
uses XLA convs) so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import convolve2d


def _f64(x):
    return np.asarray(x, dtype=np.float64)


def _usum(img, ws):
    return convolve2d(img, np.ones((ws, ws)), mode="valid")


def mse(gt, p):
    return float(np.mean((_f64(gt) - _f64(p)) ** 2))


def rmse(gt, p):
    return float(np.sqrt(mse(gt, p)))


def psnr(gt, p, max_val=255.0):
    m = mse(gt, p)
    return float("inf") if m == 0 else float(10 * np.log10(max_val**2 / m))


def uqi(gt, p, ws=8):
    gt, p = _f64(gt), _f64(p)
    N = ws * ws
    s_g, s_p = _usum(gt, ws), _usum(p, ws)
    s_gg, s_pp, s_gp = _usum(gt * gt, ws), _usum(p * p, ws), _usum(gt * p, ws)
    gp = s_g * s_p
    gg_pp = s_g**2 + s_p**2
    num = 4 * (N * s_gp - gp) * gp
    den1 = N * (s_gg + s_pp) - gg_pp
    den = den1 * gg_pp
    q = np.ones(den.shape)
    idx = (den1 == 0) & (gg_pp != 0)
    q[idx] = 2 * gp[idx] / gg_pp[idx]
    idx = den != 0
    q[idx] = num[idx] / den[idx]
    return float(np.mean(q))


def _ssim_maps(gt, p, ws, K1, K2, max_val):
    C1, C2 = (K1 * max_val) ** 2, (K2 * max_val) ** 2
    N = ws * ws
    mu_g, mu_p = _usum(gt, ws) / N, _usum(p, ws) / N
    var_g = _usum(gt * gt, ws) / N - mu_g**2
    var_p = _usum(p * p, ws) / N - mu_p**2
    cov = _usum(gt * p, ws) / N - mu_g * mu_p
    lum = (2 * mu_g * mu_p + C1) / (mu_g**2 + mu_p**2 + C1)
    cs = (2 * cov + C2) / (var_g + var_p + C2)
    return lum * cs, cs


def ssim(gt, p, ws=11, K1=0.01, K2=0.03, max_val=255.0):
    s, _ = _ssim_maps(_f64(gt), _f64(p), ws, K1, K2, max_val)
    return float(np.mean(s))


def _avg_pool2(x):
    h, w = x.shape
    x = x[: h - h % 2, : w - w % 2]
    return (x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]) / 4.0


_W = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]


def msssim(gt, p, ws=11, K1=0.01, K2=0.03, max_val=255.0):
    gt, p = _f64(gt), _f64(p)
    vals = []
    for s in range(5):
        sm, cs = _ssim_maps(gt, p, ws, K1, K2, max_val)
        vals.append(np.mean(sm) if s == 4 else np.mean(cs))
        if s < 4:
            gt, p = _avg_pool2(gt), _avg_pool2(p)
    out = 1.0
    for v, w in zip(vals, _W):
        out *= max(v, 0.0) ** w
    return float(out)


def _bands(x):
    return x[None] if x.ndim == 2 else x


def ergas(gt, p, r=4.0):
    gt, p = _f64(_bands(gt)), _f64(_bands(p))
    mse_k = np.mean((gt - p) ** 2, axis=(1, 2))
    mu_k = np.mean(gt, axis=(1, 2))
    return float(100.0 / r * np.sqrt(np.mean(mse_k / mu_k**2)))


def rase(gt, p):
    gt, p = _f64(_bands(gt)), _f64(_bands(p))
    mse_k = np.mean((gt - p) ** 2, axis=(1, 2))
    return float(100.0 / np.mean(gt) * np.sqrt(np.mean(mse_k)))


def sam(gt, p):
    gt, p = _f64(gt), _f64(p)
    if gt.ndim == 2:
        num = np.sum(gt * p)
        den = np.linalg.norm(gt) * np.linalg.norm(p)
        return float(np.arccos(np.clip(num / den, -1, 1)))
    num = np.sum(gt * p, axis=0)
    den = np.linalg.norm(gt, axis=0) * np.linalg.norm(p, axis=0)
    return float(np.mean(np.arccos(np.clip(num / den, -1, 1))))


def scc(gt, p, ws=8):
    """sewar 0.4.6 full_ref.scc — the WINDOWED local-correlation form:

    * high-pass via ``scipy.ndimage.generic_laplace`` whose derivative2
      applies the full 3x3 ring correlate once PER AXIS and sums —
      i.e. 2 x correlate(x, k, mode='reflect') for 2-D input (the
      factor 2 cancels in the correlation ratio but is kept verbatim);
    * ws=8 uniform local means/variances/covariance via
      ``convolve2d(..., mode='same')`` (ZERO fill at borders);
    * negative variances clamped to 0, per-pixel r = cov / (sd*sd)
      with 0 where the denominator is 0; mean over all pixels.
    """
    from scipy import ndimage

    k = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], np.float64)
    a = 2.0 * ndimage.correlate(_f64(gt), k, mode="reflect")
    b = 2.0 * ndimage.correlate(_f64(p), k, mode="reflect")
    win = np.ones((ws, ws), np.float64) / ws**2

    def f2(x):
        return convolve2d(x, win, mode="same")

    mu_a, mu_b = f2(a), f2(b)
    va = np.maximum(f2(a * a) - mu_a * mu_a, 0.0)
    vb = np.maximum(f2(b * b) - mu_b * mu_b, 0.0)
    vab = f2(a * b) - mu_a * mu_b
    den = np.sqrt(va) * np.sqrt(vb)
    zero = den == 0
    cc = vab / np.where(zero, 1.0, den)
    cc[zero] = 0.0
    return float(np.mean(cc))


def scc_global(gt, p):
    k = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], np.float64)
    # convolve2d flips the kernel; symmetric here so valid correlate == conv
    a = convolve2d(_f64(gt), k, mode="valid")
    b = convolve2d(_f64(p), k, mode="valid")
    a -= a.mean()
    b -= b.mean()
    return float(np.sum(a * b) / np.sqrt(np.sum(a * a) * np.sum(b * b)))


def _gauss_valid(img, sd, radius):
    x = np.arange(-radius, radius + 1)
    g = np.exp(-0.5 * (x / sd) ** 2)
    g2 = np.outer(g, g)
    g2 /= g2.sum()
    return convolve2d(img, g2, mode="valid")


def vifp(gt, p, sigma_nsq=2.0):
    gt, p = _f64(gt), _f64(p)
    num = den = 0.0
    for scale in range(1, 5):
        N = 2 ** (4 - scale + 1) + 1
        sd = N / 5.0
        if scale > 1:
            gt = _gauss_valid(gt, sd, N // 2)[::2, ::2]
            p = _gauss_valid(p, sd, N // 2)[::2, ::2]
        mu1, mu2 = _gauss_valid(gt, sd, N // 2), _gauss_valid(p, sd, N // 2)
        s1 = np.maximum(_gauss_valid(gt * gt, sd, N // 2) - mu1**2, 0)
        s2 = np.maximum(_gauss_valid(p * p, sd, N // 2) - mu2**2, 0)
        s12 = _gauss_valid(gt * p, sd, N // 2) - mu1 * mu2
        g = s12 / (s1 + 1e-10)
        sv = s2 - g * s12
        g[s1 < 1e-10] = 0
        sv[s1 < 1e-10] = s2[s1 < 1e-10]
        s1[s1 < 1e-10] = 0
        sv[g < 0] = s2[g < 0]
        g[g < 0] = 0
        sv[sv <= 1e-10] = 1e-10
        num += np.sum(np.log10(1 + g * g * s1 / (sv + sigma_nsq)))
        den += np.sum(np.log10(1 + s1 / sigma_nsq))
    return float(num / den)


def psnrb(gt, p, max_val=255.0, block=8):
    gt, p = _f64(gt), _f64(p)
    m = mse(gt, p)
    bef = _bef(p, block)
    mse_b = m + bef
    return float("inf") if mse_b == 0 else float(10 * np.log10(max_val**2 / mse_b))


def _bef(img, block=8):
    h, w = img.shape
    dh = img[:, :-1] - img[:, 1:]
    mh = (np.arange(w - 1) % block) == block - 1
    d_b = (dh[:, mh] ** 2).sum()
    d_bc = (dh[:, ~mh] ** 2).sum()
    n_b, n_bc = h * mh.sum(), h * (~mh).sum()
    dv = img[:-1, :] - img[1:, :]
    mv = (np.arange(h - 1) % block) == block - 1
    d_b += (dv[mv, :] ** 2).sum()
    d_bc += (dv[~mv, :] ** 2).sum()
    n_b += w * mv.sum()
    n_bc += w * (~mv).sum()
    d_b /= max(n_b, 1)
    d_bc /= max(n_bc, 1)
    t = np.log2(block) / np.log2(min(h, w))
    return t * (d_b - d_bc) if d_b > d_bc else 0.0
