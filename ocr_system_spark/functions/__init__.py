"""Scalar/batch kernels: the regex field layer, HTML main-content
extraction, PDF layout, and text-analysis functions.

Everything here is driver-side config or a batch kernel operating on pandas
Series/DataFrames (called from Arrow-batched UDFs in
:mod:`ocr_system_spark.operators`). No SparkSession is imported here — the
kernels are unit-testable without a JVM.
"""
