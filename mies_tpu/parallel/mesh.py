"""Device mesh construction (jax.sharding.Mesh over ICI/DCN).

Single-host v5e is the primary target (SURVEY.md section 5.8), so the
default mesh is 1-D 'data' over all local devices; a 2-D ('data',
'space') mesh supports combining batch sharding with spatial sharding
of oversized slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host initialization (SURVEY.md section 5.8).

    Single-host v5e is the primary target, so this is a thin optional
    layer: on a multi-host slice call it once per process before any
    device use; jax then exposes the global device set and the meshes
    below span hosts (collectives ride ICI within a slice, DCN across
    slices). No-op if jax.distributed is already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # only the benign double-init is swallowed; a genuinely failed
        # multi-host bring-up must NOT proceed silently single-host.
        # jax 0.9 phrases it "distributed.initialize should only be
        # called once"; older versions said "already initialized".
        msg = str(e).lower()
        if "already initialized" in msg or "only be called once" in msg:
            return
        raise


def mesh_devices(n: int | None = None) -> list:
    devs = jax.devices()
    if n is not None:
        if n > len(devs):
            raise ValueError(f"requested {n} devices, have {len(devs)}")
        devs = devs[:n]
    return devs


def make_mesh(
    data: int | None = None,
    space: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ('data', 'space') mesh.

    data=None uses all available devices / space. space > 1 lays the
    spatial axis innermost so halo ppermutes ride nearest-neighbor ICI
    links.
    """
    devs = devices if devices is not None else jax.devices()
    if data is None:
        if len(devs) % space:
            raise ValueError(f"{len(devs)} devices not divisible by space={space}")
        data = len(devs) // space
    need = data * space
    if need > len(devs):
        raise ValueError(f"mesh {data}x{space} needs {need} devices, have {len(devs)}")
    arr = np.array(devs[:need]).reshape(data, space)
    return Mesh(arr, axis_names=("data", "space"))
