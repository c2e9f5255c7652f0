"""Sources & sinks (ST_Read / COPY TO analogs)."""

from .geojson import (  # noqa: F401
    read_geojson,
    read_wkt_csv,
    st_drivers,
    st_generatepoints,
    st_read_meta,
    write_geojson,
)
from .flatgeobuf import read_flatgeobuf  # noqa: F401
from .gpkg import gpkg_layers, read_gpkg, write_gpkg  # noqa: F401
from .osm import read_osm  # noqa: F401
from .shapefile import read_shapefile, write_shapefile  # noqa: F401
