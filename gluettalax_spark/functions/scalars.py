"""Driver-side scalar helpers mirroring the reference's utility layer.

* ``glob_to_rlike`` — fnmatch glob → Java regex (reference filters with
  ``fnmatch.fnmatch`` client-side: gluettalax.py:654,678,742,799).
* ``format_time`` — humanized duration, same semantics as the reference's
  ``format_time`` (gluettalax.py:91-119): ``'1d 2h 3m 4s'``, ``0 → '0s'``,
  negative components carry the sign per unit.

These run on the driver (presentation layer) — they are NOT row-level
UDFs; the row-level equivalents are built-in Spark functions.
"""

from __future__ import annotations

import fnmatch

_UNITS = (("d", 86400), ("h", 3600), ("m", 60), ("s", 1))


def glob_to_rlike(pattern: str) -> str:
    """fnmatch glob → anchored Java-compatible regex."""
    translated = fnmatch.translate(pattern)
    if translated.startswith("(?s:") and translated.endswith(r")\Z"):
        translated = translated[len("(?s:") : -len(r")\Z")]
    return f"^{translated}$"


def format_time(seconds: float) -> str:
    """Humanize a duration in seconds: ``93784 → '1d 2h 3m 4s'``.

    Matches the reference's observable behavior (gluettalax.py:91-119):
    zero → ``'0s'``; negative durations render each nonzero component
    with its own sign (``-61 → '-1m -1s'``).
    """
    seconds = int(seconds)
    if seconds == 0:
        return "0s"
    sign = -1 if seconds < 0 else 1
    rem = abs(seconds)
    parts: list[str] = []
    for suffix, size in _UNITS:
        qty, rem = divmod(rem, size)
        if qty:
            parts.append(f"{sign * qty}{suffix}")
    return " ".join(parts)
