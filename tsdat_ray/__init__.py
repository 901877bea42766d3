"""tsdat_ray: a Ray-Data-native time-series rollup + downsample + retention
engine with the data-processing capabilities of tsdat (see README.md)."""

__version__ = "0.1.0"
