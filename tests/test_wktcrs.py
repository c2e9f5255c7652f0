"""WKT1/WKT2 CRS definitions through ST_Transform (functions/wktcrs.py) —
the reference hands WKT CRS text to PROJ's proj_create_crs_to_crs
(proj/functions.cpp:103); here it lowers onto the proj4 engine and must be
value-identical to the same CRS's EPSG-code route."""

import numpy as np
import pytest

from duckdb_spatial_spark.functions.crs import transform_xy
from duckdb_spatial_spark.functions.wktcrs import is_wkt_crs, wkt_to_proj4

OSGB_WKT1 = (
    'PROJCS["OSGB36 / British National Grid",GEOGCS["OSGB36",'
    'DATUM["Ordnance_Survey_of_Great_Britain_1936",'
    'SPHEROID["Airy 1830",6377563.396,299.3249646],'
    "TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],"
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-2],'
    'PARAMETER["scale_factor",0.9996012717],'
    'PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],'
    'UNIT["metre",1],AUTHORITY["EPSG","27700"]]'
)

OSGB_WKT2 = """PROJCRS["OSGB36 / British National Grid",
  BASEGEOGCRS["OSGB36",
    DATUM["Ordnance Survey of Great Britain 1936",
      ELLIPSOID["Airy 1830",6377563.396,299.3249646,LENGTHUNIT["metre",1]]],
    PRIMEM["Greenwich",0]],
  CONVERSION["British National Grid",
    METHOD["Transverse Mercator",ID["EPSG",9807]],
    PARAMETER["Latitude of natural origin",49],
    PARAMETER["Longitude of natural origin",-2],
    PARAMETER["Scale factor at natural origin",0.9996012717],
    PARAMETER["False easting",400000],
    PARAMETER["False northing",-100000]],
  CS[Cartesian,2], AXIS["(E)",east], AXIS["(N)",north],
  LENGTHUNIT["metre",1], ID["EPSG",27700]]"""

CA_ZONE5_WKT1 = (
    'PROJCS["NAD83 / California zone 5 (ftUS)",GEOGCS["NAD83",'
    'DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Lambert_Conformal_Conic_2SP"],'
    'PARAMETER["standard_parallel_1",35.46666666666667],'
    'PARAMETER["standard_parallel_2",34.03333333333333],'
    'PARAMETER["latitude_of_origin",33.5],PARAMETER["central_meridian",-118],'
    'PARAMETER["false_easting",6561666.667],PARAMETER["false_northing",1640416.667],'
    'UNIT["US survey foot",0.3048006096012192],AUTHORITY["EPSG","2229"]]'
)

ESRI_WEBMERC = (
    'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",GEOGCS["GCS_WGS_1984",'
    'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Mercator_Auxiliary_Sphere"],'
    'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
    'PARAMETER["Central_Meridian",0.0],PARAMETER["Standard_Parallel_1",0.0],'
    'PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]'
)

GEOG_WKT1 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
)

# OS worked example: 1d43m4.5177sE 52d39m27.2531sN -> 651409.903, 313177.270
# (through the OSGB36 datum shift the repo reproduces to the mm)
_LON = np.array([1 + 43 / 60 + 4.5177 / 3600])
_LAT = np.array([52 + 39 / 60 + 27.2531 / 3600])


def test_is_wkt_crs():
    assert is_wkt_crs(OSGB_WKT1)
    assert is_wkt_crs(OSGB_WKT2)
    assert is_wkt_crs(GEOG_WKT1)
    assert not is_wkt_crs("EPSG:4326")
    assert not is_wkt_crs("+proj=longlat +ellps=WGS84")


@pytest.mark.parametrize("wkt", [OSGB_WKT1, OSGB_WKT2], ids=["wkt1", "wkt2"])
def test_osgb_wkt_matches_code_route(wkt):
    x1, y1 = transform_xy(_LON.copy(), _LAT.copy(), "EPSG:4326", "EPSG:27700", always_xy=True)
    x2, y2 = transform_xy(_LON.copy(), _LAT.copy(), "EPSG:4326", wkt, always_xy=True)
    if "TOWGS84" in wkt:
        assert abs(float(x1[0] - x2[0])) < 1e-6
        assert abs(float(y1[0] - y2[0])) < 1e-6
    else:
        # WKT2 form carries no datum shift; projection-only parity instead
        assert abs(float(x2[0] - 651538.64)) < 200  # no-shift offset is ~100m
    p = wkt_to_proj4(wkt)
    assert p.startswith("+proj=tmerc") and "+k_0=0.9996012717" in p


def test_ca_zone5_ftus_units():
    x1, y1 = transform_xy(np.array([-118.25]), np.array([34.05]),
                          "EPSG:4326", "EPSG:2229", always_xy=True)
    x2, y2 = transform_xy(np.array([-118.25]), np.array([34.05]),
                          "EPSG:4326", CA_ZONE5_WKT1, always_xy=True)
    # registry false origins differ from the WKT's rounded ftUS values by
    # <0.4mm (2000000.0001016m vs 6561666.667ft); compare at the mm level
    assert abs(float(x1[0] - x2[0])) < 5e-3
    assert abs(float(y1[0] - y2[0])) < 5e-3
    assert "+to_meter=0.3048006096012192" in wkt_to_proj4(CA_ZONE5_WKT1)


def test_esri_webmerc_matches_3857():
    x1, y1 = transform_xy(np.array([12.4924]), np.array([41.8902]),
                          "EPSG:4326", "EPSG:3857", always_xy=True)
    x2, y2 = transform_xy(np.array([12.4924]), np.array([41.8902]),
                          "EPSG:4326", ESRI_WEBMERC, always_xy=True)
    assert abs(float(x1[0] - x2[0])) < 1e-6
    assert abs(float(y1[0] - y2[0])) < 1e-6


def test_geogcs_is_longlat_identity():
    x, y = transform_xy(np.array([5.5]), np.array([50.25]),
                        GEOG_WKT1, "EPSG:4326", always_xy=True)
    assert abs(float(x[0]) - 5.5) < 1e-12
    assert abs(float(y[0]) - 50.25) < 1e-12


def test_extension_proj4_wins():
    wkt = ('PROJCS["x",GEOGCS["y",DATUM["d",SPHEROID["s",6378137,298.257223563]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],'
           'UNIT["metre",1],EXTENSION["PROJ4","+proj=webmerc +ellps=WGS84"]]')
    assert wkt_to_proj4(wkt) == "+proj=webmerc +ellps=WGS84"


def test_unsupported_constructs_raise():
    paris = ('PROJCS["NTF Paris",GEOGCS["NTF (Paris)",DATUM["d",'
             'SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936269]],'
             'PRIMEM["Paris",2.33722917],UNIT["grad",0.01570796326794897]],'
             'PROJECTION["Lambert_Conformal_Conic_1SP"],'
             'PARAMETER["latitude_of_origin",46.8],UNIT["metre",1]]')
    with pytest.raises(ValueError, match="prime meridian|angular unit"):
        wkt_to_proj4(paris)
    # compound now lowers to its horizontal member; one WITHOUT a
    # horizontal component still raises
    with pytest.raises(ValueError, match="compound"):
        wkt_to_proj4('COMPD_CS["c",VERT_CS["v"]]')
    with pytest.raises(ValueError, match="unsupported projection method"):
        wkt_to_proj4(OSGB_WKT1.replace("Transverse_Mercator", "Krovak"))
    with pytest.raises(ValueError, match="unsupported parameter"):
        wkt_to_proj4(OSGB_WKT1.replace('"central_meridian"', '"pseudo_standard_parallel_1"'))


def test_udf_accepts_wkt(spark):
    row = spark.sql(
        "SELECT ST_AsText(ST_Transform(ST_Point(-2.0D, 49.0D), 'EPSG:4326', '"
        + GEOG_WKT1.replace("'", "''")
        + "', true)) AS w"
    ).collect()[0]
    assert row.w == "POINT (-2 49)"


def test_mercator_2sp_maps_standard_parallel_to_lat_ts():
    wkt = ('PROJCS["World Mercator 2SP",GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]],PROJECTION["Mercator_2SP"],'
           'PARAMETER["standard_parallel_1",41.0],'
           'PARAMETER["central_meridian",0],PARAMETER["false_easting",0],'
           'PARAMETER["false_northing",0],UNIT["metre",1]]')
    p = wkt_to_proj4(wkt)
    assert "+lat_ts=41" in p and "+lat_1" not in p
    # scale must actually shrink vs the equatorial form
    x1, _ = transform_xy(np.array([10.0]), np.array([0.0]),
                         "EPSG:4326", wkt, always_xy=True)
    x2, _ = transform_xy(np.array([10.0]), np.array([0.0]),
                         "EPSG:4326", "+proj=merc +lat_ts=41 +ellps=WGS84",
                         always_xy=True)
    assert abs(float(x1[0] - x2[0])) < 1e-9


def test_oblique_mercator_non_swiss_azimuth_raises():
    wkt = ('PROJCS["HOM",GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
           'UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],'
           'PARAMETER["latitude_of_center",4],PARAMETER["longitude_of_center",115],'
           'PARAMETER["azimuth",53.31582047908],'
           'PARAMETER["scale_factor",0.99984],UNIT["metre",1]]')
    with pytest.raises(ValueError, match="azimuth"):
        wkt_to_proj4(wkt)


def test_parser_rejects_malformed_input():
    with pytest.raises(ValueError, match="parse error|empty"):
        wkt_to_proj4('PROJCS["x"] garbage after')
    with pytest.raises(ValueError):
        wkt_to_proj4("PROJCS")  # no bracket -> no node


def test_compound_crs_uses_horizontal_component():
    compd = (
        'COMPD_CS["OSGB + ODN",' + OSGB_WKT1 + ',VERT_CS["Newlyn",'
        'VERT_DATUM["Ordnance Datum Newlyn",2005],UNIT["metre",1],'
        'AXIS["Up",UP]]]'
    )
    assert wkt_to_proj4(compd) == wkt_to_proj4(OSGB_WKT1)
    w2 = (
        'COMPOUNDCRS["WGS 84 + EGM96",GEOGCRS["WGS 84",'
        'DATUM["World Geodetic System 1984",'
        'ELLIPSOID["WGS 84",6378137,298.257223563]],CS[ellipsoidal,2],'
        'AXIS["latitude",north],AXIS["longitude",east],'
        'ANGLEUNIT["degree",0.0174532925199433]],'
        'VERTCRS["EGM96 height",VDATUM["EGM96 geoid"],CS[vertical,1],'
        'AXIS["up",up],LENGTHUNIT["metre",1]]]'
    )
    assert wkt_to_proj4(w2) == "+proj=longlat +ellps=WGS84"
