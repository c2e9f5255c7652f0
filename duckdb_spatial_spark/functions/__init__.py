"""Function registry: makes every ST_* function callable from Spark SQL.

The reference registers its functions into the DuckDB catalog at extension
load (``spatial/src/spatial/core/module.cpp:17-34``); our analog is
``register_all(spark)`` which calls ``spark.udf.register`` for each function
so both the DataFrame API and ``spark.sql("SELECT ST_Area(...)")`` work
(SURVEY.md §2.7).

Spark SQL UDFs cannot overload on arity, so secondary arities get suffixed
SQL names (e.g. ``ST_Buffer`` = (geom, radius); ``ST_Buffer_NSeg`` adds the
segment count). The Python-level API in this module dispatches naturally.
"""

from __future__ import annotations

from . import native, udfs  # noqa: F401
from .crs import (  # noqa: F401
    geom_crs,
    list_proj_crs_df,
    make_st_transform,
    st_transform_tagged,
    transform_xy,
)
from .udfs import *  # noqa: F401,F403

# SQL name -> UDF. Names are case-insensitive in Spark SQL.
_REGISTRY = {
    # constructors
    "st_point": udfs.st_point,
    "st_point2d": udfs.st_point,
    "st_point3d": udfs.st_point3d,
    "st_point4d": udfs.st_point4d,
    "st_makeenvelope": udfs.st_makeenvelope,
    "st_makeline": udfs.st_makeline,
    "st_makeline2": udfs.st_makeline2,
    "st_makepolygon_holes": udfs.st_makepolygon_holes,
    "st_makepolygon": udfs.st_makepolygon,
    "st_collect": udfs.st_collect,
    "st_multi": udfs.st_multi,
    # io
    "st_astext": udfs.st_astext,
    "st_geomfromtext": udfs.st_geomfromtext,
    "st_geomfromtext_ignore": udfs.st_geomfromtext_ignore,
    "st_aswkb": udfs.st_aswkb,
    "st_geomfromwkb": udfs.st_geomfromwkb,
    "st_geomfromhexwkb": udfs.st_geomfromhexwkb,
    "st_geomfromhexewkb": udfs.st_geomfromhexwkb,
    "st_ashexwkb": udfs.st_ashexwkb,
    "st_asgeojson": udfs.st_asgeojson,
    "st_geomfromgeojson": udfs.st_geomfromgeojson,
    "st_assvg": udfs.st_assvg,
    # measures
    "st_area": udfs.st_area,
    "st_length": udfs.st_length,
    "st_perimeter": udfs.st_perimeter,
    "st_centroid": udfs.st_centroid,
    "st_distance": udfs.st_distance,
    "st_dwithin": udfs.st_dwithin,
    "st_shortestline": udfs.st_shortestline,
    # accessors
    "st_x": udfs.st_x,
    "st_y": udfs.st_y,
    "st_z": udfs.st_z,
    "st_m": udfs.st_m,
    "st_xmin": udfs.st_xmin,
    "st_xmax": udfs.st_xmax,
    "st_ymin": udfs.st_ymin,
    "st_ymax": udfs.st_ymax,
    "st_zmin": udfs.st_zmin,
    "st_zmax": udfs.st_zmax,
    "st_mmin": udfs.st_mmin,
    "st_mmax": udfs.st_mmax,
    "st_extent": udfs.st_extent,
    "st_extent_approx": udfs.st_extent,
    "st_geometrytype": udfs.st_geometrytype,
    "st_isempty": udfs.st_isempty,
    "st_isclosed": udfs.st_isclosed,
    "st_isring": udfs.st_isring,
    "st_issimple": udfs.st_issimple,
    "st_isvalid": udfs.st_isvalid,
    "st_dimension": udfs.st_dimension,
    "st_npoints": udfs.st_npoints,
    "st_numpoints": udfs.st_npoints,
    "st_hasz": udfs.st_hasz,
    "st_hasm": udfs.st_hasm,
    "st_zmflag": udfs.st_zmflag,
    "st_ngeometries": udfs.st_ngeometries,
    "st_numgeometries": udfs.st_ngeometries,
    "st_ninteriorrings": udfs.st_ninteriorrings,
    "st_numinteriorrings": udfs.st_ninteriorrings,
    "st_exteriorring": udfs.st_exteriorring,
    "st_startpoint": udfs.st_startpoint,
    "st_endpoint": udfs.st_endpoint,
    "st_pointn": udfs.st_pointn,
    "st_points": udfs.st_points,
    "st_dump": udfs.st_dump,
    "st_collectionextract": udfs.st_collectionextract,
    "st_collectionextract1": udfs.st_collectionextract1,
    "st_extent_text": udfs.st_extent_text,
    # transforms
    "st_flipcoordinates": udfs.st_flipcoordinates,
    "st_reverse": udfs.st_reverse,
    "st_force2d": udfs.st_force2d,
    "st_force3dz": udfs.st_force3dz,
    "st_force3dm": udfs.st_force3dm,
    "st_force4d": udfs.st_force4d,
    "st_removerepeatedpoints": udfs.st_removerepeatedpoints,
    "st_removerepeatedpoints_tol": udfs.st_removerepeatedpoints_tol,
    "st_simplify": udfs.st_simplify,
    "st_simplifypreservetopology": udfs.st_simplifypreservetopology,
    "st_reduceprecision": udfs.st_reduceprecision,
    "st_normalize": udfs.st_normalize,
    "st_makevalid": udfs.st_makevalid,
    "st_boundary": udfs.st_boundary,
    "st_envelope": udfs.st_envelope,
    "st_convexhull": udfs.st_convexhull,
    "st_pointonsurface": udfs.st_pointonsurface,
    "st_linemerge": udfs.st_linemerge,
    "st_linemerge_directed": udfs.st_linemerge_directed,
    "st_buffer": udfs.st_buffer,
    "st_buffer_nseg": udfs.st_buffer_nseg,
    "st_buffer_style": udfs.st_buffer_style,
    # predicates
    "st_intersects": udfs.st_intersects,
    "st_intersects_extent": udfs.st_intersects_extent,
    "st_disjoint": udfs.st_disjoint,
    "st_contains": udfs.st_contains,
    "st_containsproperly": udfs.st_containsproperly,
    "st_within": udfs.st_within,
    "st_covers": udfs.st_covers,
    "st_coveredby": udfs.st_coveredby,
    "st_crosses": udfs.st_crosses,
    "st_overlaps": udfs.st_overlaps,
    "st_touches": udfs.st_touches,
    "st_equals": udfs.st_equals,
    # overlay
    "st_intersection": udfs.st_intersection,
    "st_union": udfs.st_union,
    "st_difference": udfs.st_difference,
    # sphere / spheroid
    "st_distance_sphere": udfs.st_distance_sphere,
    "st_haversine": udfs.st_distance_sphere,
    "st_distance_spheroid": udfs.st_distance_spheroid,
    "st_dwithin_spheroid": udfs.st_dwithin_spheroid,
    "st_area_spheroid": udfs.st_area_spheroid,
    "st_length_spheroid": udfs.st_length_spheroid,
    "st_perimeter_spheroid": udfs.st_perimeter_spheroid,
    # tiling / curves
    "st_hilbert": udfs.st_hilbert,
    "st_hilbert_geom": udfs.st_hilbert_geom,
    "st_quadkey": udfs.st_quadkey,
    "st_quadkey_geom": udfs.st_quadkey_geom,
}


def register_all(spark):
    """Register every ST_* function on the session; returns the name list."""
    from . import native as _native

    st_transform = make_st_transform()
    registry = dict(_REGISTRY)
    registry["st_transform"] = st_transform
    registry.update(_native._native_cast_udfs())
    for name, udf in registry.items():
        spark.udf.register(name, udf)
    return sorted(registry)
