"""Test env: 8 virtual CPU devices so multi-chip sharding runs in CI.

Must set env BEFORE jax imports (SURVEY.md section 4 item 4 — the TPU
answer to 'fake backends'). All correctness tests run on CPU; the
real-chip path is exercised by bench.py and __graft_entry__.py.
"""

import hashlib
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin force-sets jax_platforms="axon,cpu" at import,
# overriding the env var — pin it back to cpu before any backend use.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    """Per-test rng seeded from the test's node id: every test sees the
    SAME draws no matter which subset of the suite runs (the old
    session-scoped rng made golden tolerances depend on test order —
    test_clahe_skimage_explicit_kernel_size flaked under subset runs)."""
    seed = int.from_bytes(
        hashlib.sha256(request.node.nodeid.encode()).digest()[:4], "little"
    )
    return np.random.default_rng(seed)


@pytest.fixture(scope="session")
def xray():
    """Synthetic 512x512 'chest X-ray': smooth anatomy + texture + vignette.

    Own fixed-seed rng: the shared session `rng` fixture's state depends
    on which tests ran first, which made golden tolerances order-
    dependent (caught in round 2 — full-suite runs produced different
    fixture data than single-file runs)."""
    rng = np.random.default_rng(1042)
    h = w = 512
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = h / 2, w / 2
    r = np.sqrt((y - cy) ** 2 + (x - cx) ** 2) / (h / 2)
    base = 0.55 * np.exp(-((r / 0.9) ** 2))  # lung field glow
    ribs = 0.12 * np.maximum(np.sin(y / 17.0), 0.0) ** 3
    noise = 0.03 * rng.standard_normal((h, w)).astype(np.float32)
    img = np.clip(base + ribs + noise + 0.08, 0.0, 1.0)
    return img.astype(np.float32)


@pytest.fixture(scope="session")
def ct_slice_hu():
    """Synthetic int16 CT slice in Hounsfield units [-1024, 2000]."""
    rng = np.random.default_rng(2042)
    h = w = 256
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    r = np.sqrt((y - h / 2) ** 2 + (x - w / 2) ** 2)
    body = np.where(r < 100, 40.0, -1000.0)  # soft tissue in air
    bone = np.where(np.abs(r - 95) < 4, 700.0, 0.0)
    noise = 15.0 * rng.standard_normal((h, w)).astype(np.float32)
    return (body + bone + noise).astype(np.int16)


@pytest.fixture(scope="session")
def impulse_image():
    """Gradient with salt & pepper noise — median/bilateral workloads."""
    rng = np.random.default_rng(3042)
    h = w = 128
    img = np.linspace(0, 1, w, dtype=np.float32)[None, :].repeat(h, axis=0)
    mask = rng.random((h, w))
    img = np.where(mask < 0.03, 0.0, img)
    img = np.where(mask > 0.97, 1.0, img)
    return img.astype(np.float32)
