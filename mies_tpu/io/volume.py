"""Volumetric I/O: NetCDF (gated), raw .npy/.npz, and DICOM series.

Covers the reference's netcdf4 role (reference pyproject.toml:10;
SURVEY.md section 2b D9):
volumetric CT/MRI ingest as [Z, H, W] int16 arrays. netCDF4 is not
installed in this environment, so that path is import-gated; .npz is
the always-available container and DICOM series come from
``mies_tpu.io.dicom``.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class VolumeMeta:
    shape: tuple[int, int, int]
    dtype: str
    source: str
    var_name: str | None = None


def load_volume(
    path: str | Path, var_name: str | None = None
) -> tuple[np.ndarray, VolumeMeta]:
    """Load a [Z, H, W] volume from .nc / .npz / .npy / DICOM directory.

    Returns (volume, meta). int16 data stays int16 (HU); the pipeline's
    window_hu stage does the cast on-device.
    """
    path = Path(path)
    if path.is_dir():
        # native C++ parallel decoder when buildable; Python twin otherwise
        from mies_tpu import native

        if native.available():
            vol = native.read_dicom_series_native(path)
            src = f"dicom-series-native:{path}"
        else:
            from mies_tpu.io.dicom import read_dicom_series

            vol = read_dicom_series(path)
            src = f"dicom-series:{path}"
        return vol, VolumeMeta(vol.shape, str(vol.dtype), src)
    suffix = path.suffix.lower()
    if suffix == ".nc":
        try:
            import netCDF4
        except ImportError as e:
            raise ImportError(
                "netCDF4 is not installed; convert the volume to .npz or "
                "a DICOM series, or install netCDF4"
            ) from e
        ds = netCDF4.Dataset(path, "r")
        try:
            if var_name is None:
                # first 3-D variable wins
                var_name = next(
                    (n for n, v in ds.variables.items() if v.ndim == 3), None
                )
                if var_name is None:
                    raise ValueError(f"no 3-D variable found in {path}")
            vol = np.asarray(ds.variables[var_name][:])
        finally:
            ds.close()
        return vol, VolumeMeta(vol.shape, str(vol.dtype), f"netcdf:{path}", var_name)
    if suffix == ".npz":
        with np.load(path) as z:
            if var_name is None:
                var_name = z.files[0]
            vol = z[var_name]
        return vol, VolumeMeta(vol.shape, str(vol.dtype), f"npz:{path}", var_name)
    if suffix == ".npy":
        vol = np.load(path)
        return vol, VolumeMeta(vol.shape, str(vol.dtype), f"npy:{path}")
    raise ValueError(f"unsupported volume format: {path}")


def save_volume(path: str | Path, vol: np.ndarray, var_name: str = "enhanced") -> None:
    """Save a volume as .npz (compressed), .npy, or a DICOM series.

    A path with no (known) suffix is treated as a directory and written
    as numbered DICOM slices (uint8 enhanced output stays uint8; int16
    stays int16) — round-trippable through load_volume.
    """
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".npz":
        np.savez_compressed(path, **{var_name: vol})
    elif suffix == ".npy":
        np.save(path, vol)
    elif suffix in ("", ".dcmdir"):
        from mies_tpu.io.dicom import write_dicom

        path.mkdir(parents=True, exist_ok=True)
        for i, sl in enumerate(vol):
            write_dicom(
                path / f"slice{i:05d}.dcm",
                np.ascontiguousarray(sl),
                instance_number=i + 1,
                slice_location=float(i),
            )
    else:
        raise ValueError(f"unsupported output volume format: {path}")
