"""Path templates: substitute + extract, the engine's version of the
reference's tstring engine (/root/reference/tsdat/tstring/template.py:12-200).

Grammar: ``{name}`` placeholders, ``[...]`` optional segments (dropped whole
when any placeholder inside is missing).  ``extract`` reverses a substitution
via a generated regex — used to map datastream file/partition paths back to
their fields (filename↔date mapping, file_system.py:44-59).

    t = Template("{datastream}.{date}[.{time}].parquet")
    t.substitute({"datastream": "sgp.met.b1", "date": "20240101"})
        → "sgp.met.b1.20240101.parquet"
    t.extract("sgp.met.b1.20240101.120000.parquet")
        → {"datastream": "sgp.met.b1", "date": "20240101", "time": "120000"}
"""

from __future__ import annotations

import re

_PLACEHOLDER = re.compile(r"\{(\w+)\}")


class TemplateError(ValueError):
    pass


class Template:
    def __init__(self, template: str, regex: dict | None = None):
        """``regex`` maps variable → extraction pattern (default ``.+?``);
        needed when separators are ambiguous (a datastream contains dots)."""
        self.template = template
        self._regex = regex or {}
        self._segments = self._parse(template)
        self.variables = [v for _, seg in self._segments for v in _PLACEHOLDER.findall(seg)]

    @staticmethod
    def _parse(template: str) -> list[tuple[bool, str]]:
        """Split into (optional?, text) segments; [] may not nest."""
        segs: list[tuple[bool, str]] = []
        buf, depth = "", 0
        for ch in template:
            if ch == "[":
                if depth:
                    raise TemplateError("nested [ ] not supported")
                if buf:
                    segs.append((False, buf))
                buf, depth = "", 1
            elif ch == "]":
                if not depth:
                    raise TemplateError("unbalanced ]")
                segs.append((True, buf))
                buf, depth = "", 0
            else:
                buf += ch
        if depth:
            raise TemplateError("unbalanced [")
        if buf:
            segs.append((False, buf))
        return segs

    def substitute(self, mapping: dict, allow_missing: bool = False) -> str:
        out = []
        for optional, seg in self._segments:
            names = _PLACEHOLDER.findall(seg)
            missing = [n for n in names if mapping.get(n) is None]
            if missing:
                if optional:
                    continue  # drop the whole optional segment
                if allow_missing:
                    out.append(seg)
                    continue
                raise TemplateError(f"missing template variables: {missing}")
            out.append(_PLACEHOLDER.sub(lambda m: str(mapping[m.group(1)]), seg))
        return "".join(out)

    def regex(self) -> re.Pattern:
        parts = []
        for optional, seg in self._segments:
            chunk = ""
            pos = 0
            for m in _PLACEHOLDER.finditer(seg):
                chunk += re.escape(seg[pos : m.start()])
                pat = self._regex.get(m.group(1), ".+?")
                chunk += f"(?P<{m.group(1)}>{pat})"
                pos = m.end()
            chunk += re.escape(seg[pos:])
            parts.append(f"(?:{chunk})?" if optional else chunk)
        return re.compile("^" + "".join(parts) + "$")

    def extract(self, s: str) -> dict:
        m = self.regex().match(s)
        if not m:
            raise TemplateError(f"{s!r} does not match template {self.template!r}")
        return {k: v for k, v in m.groupdict().items() if v is not None}
