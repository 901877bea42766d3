"""Data converters: units and string→datetime.

Reference parity:

* ``convert_units`` — tsdat's UnitsConverter uses pint
  (/root/reference/tsdat/io/converters/units_converter.py:17-114): no-op for
  units "1"/same-units/non-numeric, else multiply/affine.  pint isn't in
  this container, so ``parse_units`` implements UDUNITS/pint-grade unit
  arithmetic directly: compound expressions ("m s-2", "km s-1", "W/m^2",
  "mg/L"), SI prefixes, exponents and dimensional-compatibility checking
  over the 7 SI base dimensions; unknown/incompatible conversions raise
  (matching the reference's pint UndefinedUnitError behavior and the
  compound-unit cases in /root/reference/test/io/test_converters.py:53-93).
* ``string_to_datetime`` — tsdat's StringToDatetime
  (/root/reference/tsdat/io/converters/string_to_datetime.py:16-88):
  ``pc.strptime`` with an explicit format, optional source timezone, always
  lands on naive UTC ``timestamp[us]`` (Arrow's tz-aware → naive cast keeps
  the UTC instant, unlike pandas).

Both are plain column kernels usable as ``DeclaredVar.converter`` callables
or inside any ``map_batches``.
"""

from __future__ import annotations

import re as _re

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# UDUNITS/pint-grade unit arithmetic (no pint in this container).
#
# Each unit parses to (factor_to_SI, offset_to_SI, dims) where dims is a
# 7-vector of exponents over (m, kg, s, K, A, mol, cd).  Compound strings —
# "m s-2", "km s-1", "W/m^2", "mg/L", "kg m2 s-3" — combine factors and dim
# vectors; conversion between two units requires equal dims.  Affine offsets
# (degC/degF) apply only when the whole expression is ONE temperature unit
# with exponent 1, matching pint's .to() semantics for absolute temperatures.
# ---------------------------------------------------------------------------

_DIMS = ("m", "kg", "s", "K", "A", "mol", "cd")


def _d(**kw) -> tuple:
    return tuple(kw.get(k, 0) for k in _DIMS)


# symbol → (factor_to_SI, dims, offset_to_SI)
_SYMBOLS: dict[str, tuple[float, tuple, float]] = {
    # SI base
    "m": (1.0, _d(m=1), 0.0), "g": (1e-3, _d(kg=1), 0.0), "s": (1.0, _d(s=1), 0.0),
    "K": (1.0, _d(K=1), 0.0), "A": (1.0, _d(A=1), 0.0), "mol": (1.0, _d(mol=1), 0.0),
    "cd": (1.0, _d(cd=1), 0.0),
    # derived SI
    "Hz": (1.0, _d(s=-1), 0.0), "N": (1.0, _d(kg=1, m=1, s=-2), 0.0),
    "Pa": (1.0, _d(kg=1, m=-1, s=-2), 0.0), "J": (1.0, _d(kg=1, m=2, s=-2), 0.0),
    "W": (1.0, _d(kg=1, m=2, s=-3), 0.0), "V": (1.0, _d(kg=1, m=2, s=-3, A=-1), 0.0),
    "C": (1.0, _d(A=1, s=1), 0.0),  # coulomb; use degC for Celsius
    "L": (1e-3, _d(m=3), 0.0),
    # time
    "min": (60.0, _d(s=1), 0.0), "h": (3600.0, _d(s=1), 0.0), "d": (86400.0, _d(s=1), 0.0),
    # non-SI length / speed / pressure
    "ft": (0.3048, _d(m=1), 0.0), "in": (0.0254, _d(m=1), 0.0),
    "mi": (1609.344, _d(m=1), 0.0), "nmi": (1852.0, _d(m=1), 0.0),
    "mph": (0.44704, _d(m=1, s=-1), 0.0), "knots": (1852.0 / 3600.0, _d(m=1, s=-1), 0.0),
    "bar": (1e5, _d(kg=1, m=-1, s=-2), 0.0), "atm": (101325.0, _d(kg=1, m=-1, s=-2), 0.0),
    "mmHg": (133.322387415, _d(kg=1, m=-1, s=-2), 0.0),
    # temperature (affine handled at expression level)
    "degC": (1.0, _d(K=1), 273.15),
    "degF": (5.0 / 9.0, _d(K=1), 459.67 * 5.0 / 9.0),
    # dimensionless
    "1": (1.0, _d(), 0.0), "%": (0.01, _d(), 0.0),
    "rad": (1.0, _d(), 0.0), "sr": (1.0, _d(), 0.0),
    "deg": (3.141592653589793 / 180.0, _d(), 0.0),
}

_ALIASES = {
    "meter": "m", "meters": "m", "metre": "m", "metres": "m",
    "gram": "g", "grams": "g", "sec": "s", "secs": "s", "second": "s", "seconds": "s",
    "minute": "min", "minutes": "min", "hr": "h", "hrs": "h", "hour": "h", "hours": "h",
    "day": "d", "days": "d",
    "kelvin": "K", "degK": "K", "deg_K": "K",
    "celsius": "degC", "deg_C": "degC", "degreeC": "degC", "degrees_C": "degC",
    "fahrenheit": "degF", "deg_F": "degF", "degreeF": "degF", "degrees_F": "degF",
    "percent": "%", "pct": "%",
    "litre": "L", "liter": "L", "litres": "L", "liters": "L", "l": "L",
    "knot": "knots", "kt": "knots", "kts": "knots",
    "newton": "N", "joule": "J", "watt": "W", "watts": "W", "pascal": "Pa",
    "hertz": "Hz", "volt": "V", "amp": "A", "ampere": "A", "amps": "A",
    "degree": "deg", "degrees": "deg", "radian": "rad", "radians": "rad",
    "inch": "in", "inches": "in", "foot": "ft", "feet": "ft", "mile": "mi", "miles": "mi",
}

_PREFIXES = {
    "Y": 1e24, "Z": 1e21, "E": 1e18, "P": 1e15, "T": 1e12, "G": 1e9, "M": 1e6,
    "k": 1e3, "h": 1e2, "da": 1e1, "d": 1e-1, "c": 1e-2, "m": 1e-3,
    "u": 1e-6, "µ": 1e-6, "n": 1e-9, "p": 1e-12, "f": 1e-15, "a": 1e-18,
    "z": 1e-21, "y": 1e-24,
}

# one multiplicative token: symbol + optional exponent ("s-2", "m^2", "m**2")
_TOKEN_RE = _re.compile(r"([A-Za-zµ%°_]+|1)(?:\s*(?:\^|\*\*)?\s*([+-]?\d+))?$")


class UnitsError(ValueError):
    pass


def _resolve_symbol(sym: str) -> tuple[float, tuple, float]:
    sym = _ALIASES.get(sym, sym)
    if sym in _SYMBOLS:
        return _SYMBOLS[sym]
    # SI prefix + known symbol (longest prefix first so "da" wins over "d")
    for p in sorted(_PREFIXES, key=len, reverse=True):
        if sym.startswith(p) and len(sym) > len(p):
            rest = _ALIASES.get(sym[len(p):], sym[len(p):])
            if rest in _SYMBOLS:
                f, dims, off = _SYMBOLS[rest]
                if off:  # no prefixed affine units (UDUNITS agrees)
                    break
                return f * _PREFIXES[p], dims, 0.0
    raise UnitsError(f"unknown unit {sym!r}")


def parse_units(expr: str) -> tuple[float, float, tuple]:
    """Parse a UDUNITS/pint-style unit expression → (factor, offset, dims)
    with value_si = value * factor + offset.  offset ≠ 0 only when the whole
    expression is a single affine (temperature) unit with exponent 1."""
    s = (expr or "").strip().replace("·", " ").replace("°", "deg")
    if not s or s == "1":
        return 1.0, 0.0, _d()
    # split into /-separated chunks; each '/' divides the NEXT token group
    factor = 1.0
    dims = [0] * len(_DIMS)
    n_tokens = 0
    last_off = 0.0
    sign = 1
    for raw in _re.split(r"(/)", s):
        raw = raw.strip()
        if raw == "/":
            sign = -1
            continue
        if not raw:
            continue
        for tok in _re.split(r"[\s*.]+", raw):
            if not tok:
                continue
            m = _TOKEN_RE.match(tok)
            if not m:
                raise UnitsError(f"cannot parse unit token {tok!r} in {expr!r}")
            sym, exp = m.group(1), int(m.group(2) or 1)
            exp *= sign
            f, d, off = _resolve_symbol(sym)
            factor *= f ** exp
            dims = [a + b * exp for a, b in zip(dims, d)]
            n_tokens += 1
            last_off = off if exp == 1 else 0.0
        sign = 1  # '/' binds one token group
    offset = last_off if n_tokens == 1 else 0.0
    return factor, offset, tuple(dims)


def unit_factors(input_units: str, output_units: str) -> tuple[float, float]:
    """(scale, offset) such that out = in * scale + offset."""
    if input_units == output_units:
        return 1.0, 0.0
    f_in, o_in, d_in = parse_units(input_units)
    f_out, o_out, d_out = parse_units(output_units)
    if d_in != d_out:
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
