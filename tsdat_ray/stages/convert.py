"""Data converters: units and string→datetime.

Reference parity:

* ``convert_units`` — tsdat's UnitsConverter uses pint
  (/root/reference/tsdat/io/converters/units_converter.py:17-114): no-op for
  units "1"/same-units/non-numeric, else multiply/affine.  pint isn't in
  this container, so conversions come from a built-in affine table
  (factor+offset to an SI anchor per dimension) covering the unit families
  time-series ingest actually sees; unknown conversions raise (matching the
  reference's pint UndefinedUnitError behavior).
* ``string_to_datetime`` — tsdat's StringToDatetime
  (/root/reference/tsdat/io/converters/string_to_datetime.py:16-88):
  ``pc.strptime`` with an explicit format, optional source timezone, always
  lands on naive UTC ``timestamp[us]`` (Arrow's tz-aware → naive cast keeps
  the UTC instant, unlike pandas).

Both are plain column kernels usable as ``DeclaredVar.converter`` callables
or inside any ``map_batches``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# unit → (dimension, factor, offset): value_si = value * factor + offset
_UNITS: dict[str, tuple[str, float, float]] = {
    # time
    "s": ("time", 1.0, 0.0), "sec": ("time", 1.0, 0.0), "seconds": ("time", 1.0, 0.0),
    "ms": ("time", 1e-3, 0.0), "us": ("time", 1e-6, 0.0), "ns": ("time", 1e-9, 0.0),
    "min": ("time", 60.0, 0.0), "minutes": ("time", 60.0, 0.0),
    "h": ("time", 3600.0, 0.0), "hr": ("time", 3600.0, 0.0), "hours": ("time", 3600.0, 0.0),
    "d": ("time", 86400.0, 0.0), "day": ("time", 86400.0, 0.0), "days": ("time", 86400.0, 0.0),
    # length
    "m": ("length", 1.0, 0.0), "meters": ("length", 1.0, 0.0),
    "mm": ("length", 1e-3, 0.0), "cm": ("length", 1e-2, 0.0), "km": ("length", 1e3, 0.0),
    "ft": ("length", 0.3048, 0.0), "mi": ("length", 1609.344, 0.0),
    # speed
    "m/s": ("speed", 1.0, 0.0), "km/h": ("speed", 1 / 3.6, 0.0),
    "mph": ("speed", 0.44704, 0.0), "knots": ("speed", 0.514444, 0.0),
    # temperature (affine)
    "K": ("temperature", 1.0, 0.0), "kelvin": ("temperature", 1.0, 0.0),
    "degC": ("temperature", 1.0, 273.15), "C": ("temperature", 1.0, 273.15),
    "degF": ("temperature", 5.0 / 9.0, 459.67 * 5.0 / 9.0), "F": ("temperature", 5.0 / 9.0, 459.67 * 5.0 / 9.0),
    # pressure
    "Pa": ("pressure", 1.0, 0.0), "hPa": ("pressure", 100.0, 0.0),
    "kPa": ("pressure", 1000.0, 0.0), "bar": ("pressure", 1e5, 0.0), "mbar": ("pressure", 100.0, 0.0),
    # ratio
    "1": ("ratio", 1.0, 0.0), "": ("ratio", 1.0, 0.0), "percent": ("ratio", 0.01, 0.0), "%": ("ratio", 0.01, 0.0),
}


class UnitsError(ValueError):
    pass


def unit_factors(input_units: str, output_units: str) -> tuple[float, float]:
    """(scale, offset) such that out = in * scale + offset."""
    if input_units == output_units:
        return 1.0, 0.0
    try:
        dim_in, f_in, o_in = _UNITS[input_units]
        dim_out, f_out, o_out = _UNITS[output_units]
    except KeyError as e:
        raise UnitsError(f"unknown unit {e.args[0]!r}") from None
    if dim_in != dim_out:
        raise UnitsError(f"incompatible units: {input_units!r} → {output_units!r}")
    # in → SI → out
    return f_in / f_out, (o_in - o_out) / f_out


def convert_units(col, input_units: str, output_units: str):
    """Vectorized unit conversion of a numeric Arrow column; no-op when units
    match, are '1', or the column is non-numeric (units_converter.py:34-44)."""
    if not output_units or output_units == "1" or input_units == output_units or not input_units:
        return col
    typ = col.type if hasattr(col, "type") else None
    if typ is not None and not (pa.types.is_integer(typ) or pa.types.is_floating(typ)):
        return col
    scale, offset = unit_factors(input_units, output_units)
    out = pc.multiply(pc.cast(col, pa.float64()), pa.scalar(scale))
    if offset:
        out = pc.add(out, pa.scalar(offset))
    return out


def string_to_datetime(col, format: str = "%Y-%m-%d %H:%M:%S", timezone: str | None = None,
                       unit: str = "us"):
    """Parse datetime strings to naive-UTC timestamp (StringToDatetime parity:
    tz-localize the parsed wall time, convert to UTC, drop the tz)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):  # reader already parsed it (e.g.
        ts = pc.cast(col, pa.timestamp(unit))  # Arrow CSV auto-detects ISO)
    else:
        ts = pc.strptime(col, format=format, unit=unit)
    if timezone:
        ts = pc.assume_timezone(ts, timezone)
        ts = pc.cast(ts, pa.timestamp(unit))  # tz-aware → naive keeps the UTC instant
    return ts
