"""Job plans: the end-to-end extraction pipeline, checkpoint-manifest
resume, and per-partition metrics."""
