"""scala_timeseries_lib_ray — a Ray-Data-native time-series rollup / downsample /
retention engine.

From-scratch reimplementation of the query and data-processing capabilities of
Sqooba/scala-timeseries-lib (the ``TSEntry(timestamp, value, validity)`` step-function
model, see /root/reference/src/main/scala/io/sqooba/oss/timeseries/immutable/TSEntry.scala:17)
as distributed operators over ``ray.data.Dataset`` pipelines.

Layout:
  functions/   pure pyarrow/numpy batch kernels (Table -> Table), no Ray dependency
  sources/     readers + deterministic synthetic token-table generation
  stages/      Ray Data stages (map_batches / groupby wiring, actor pools, manifests)
  pipelines/   end-to-end pipelines (tier cascade, training-data prep ops)
  state/       broadcast/lookup helpers (ray.put-based small-side state)
"""

__version__ = "0.1.0"

TS = "ts"
VALUE = "value"
VALIDITY = "validity"
SERIES = "source"
