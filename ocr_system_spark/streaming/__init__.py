"""Structured Streaming tier.

The reference is strictly batch (its nearest streaming analog is the
per-document incremental CSV re-export, /root/reference/main_tk -
AI.py:271-312, and the per-page progress callback). For a web-scale crawl
feed, the same fused extraction pipeline runs unchanged as a micro-batch
stream: see :mod:`ocr_system_spark.streaming.ingest`.
"""
