"""Pure-Python extraction kernels. No Spark imports here — everything in
this package runs inside Arrow batches (mapInPandas) on executors and is
unit-tested without a SparkSession."""
