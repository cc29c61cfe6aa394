"""Host-side I/O: image/volume ingest and uint8 output save.

I/O is host work (SURVEY.md section 1b) — Pillow for PNG/JPEG/TIFF,
a self-contained DICOM reader (pydicom is not available in this
environment), gated netCDF4, and raw .npy/.npz volumes. Device code
never touches files; these functions produce/consume NumPy arrays at
the process<->device boundary.
"""

from mies_tpu.io.image import load_image, save_image, to_float, from_float
from mies_tpu.io.volume import load_volume, save_volume, VolumeMeta
from mies_tpu.io.dicom import read_dicom, read_dicom_series

__all__ = [
    "load_image",
    "save_image",
    "to_float",
    "from_float",
    "load_volume",
    "save_volume",
    "VolumeMeta",
    "read_dicom",
    "read_dicom_series",
]
