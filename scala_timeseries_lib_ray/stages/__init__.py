"""Ray Data stages: Dataset -> Dataset wiring of the batch kernels.

Stages never call ``ray.init()`` — the session is owned by the caller (driver,
bench.py, or the pytest fixture).
"""
