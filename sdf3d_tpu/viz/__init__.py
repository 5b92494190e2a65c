"""Visualization helpers: colormaps for scalar-field debug views."""

from sdf3d_tpu.viz.colormap import turbo, turbo_lut, apply_colormap

__all__ = ["turbo", "turbo_lut", "apply_colormap"]
