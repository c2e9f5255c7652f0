"""Geometry kernel: in-memory model, WKT/WKB codecs, numpy algorithms."""

from . import algorithms, geom, wkb, wkt  # noqa: F401
from .geom import Geometry  # noqa: F401
from .wkb import from_wkb, to_wkb  # noqa: F401
from .wkt import from_wkt, to_wkt  # noqa: F401
