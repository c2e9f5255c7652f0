"""Planning helpers: bbox pruning rewrite + clustered storage (R-tree analog)."""

from .pruning import filter_bbox, hilbert_cluster, read_geo_parquet, write_geo_parquet  # noqa: F401
