"""ASCII-whitespace tokenization shared by the Python text kernels.

python's ``str.split()`` / ``str.strip()`` are UNICODE-aware (they split
on U+00A0, U+2009, ...), but every SQL oracle tokenizes with regex
``\\s`` — which both Java regex and RE2 define as the six ASCII chars
``[ \\t\\n\\x0B\\f\\r]``. A document containing a non-breaking space
would silently tokenize differently in the Python lane than in the SQL
replica, so all kernels split through these helpers instead.
"""

from __future__ import annotations

import re

_WS = re.compile(r"[ \t\n\r\f\x0b]+")
_STRIP = " \t\n\r\f\x0b"


def ws_split(s: str) -> list[str]:
    """Non-empty tokens split on ASCII whitespace only (= regex \\s in
    Java and RE2)."""
    return [t for t in _WS.split(s) if t]


def ws_strip(s: str) -> str:
    """Strip ASCII whitespace only (matches the oracles' explicit trim
    charsets)."""
    return s.strip(_STRIP)
