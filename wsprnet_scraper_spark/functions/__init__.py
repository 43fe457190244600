"""Scalar/dimension function library — all pure Catalyst expressions."""

from .bands import band_dim, band_from_mhz, freq_key, join_band
from .formats import epoch_cycle, fmt3, rint_int, wd_time_from_epoch
from .geo import add_vertex_cols, azimuth_rx, azimuth_tx, degrees, radians, vertex
from .locator import grid_lat, grid_lon

__all__ = [
    "add_vertex_cols",
    "azimuth_rx",
    "azimuth_tx",
    "band_dim",
    "band_from_mhz",
    "degrees",
    "epoch_cycle",
    "fmt3",
    "freq_key",
    "grid_lat",
    "grid_lon",
    "join_band",
    "radians",
    "rint_int",
    "vertex",
    "wd_time_from_epoch",
]
