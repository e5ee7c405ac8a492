"""Reference-equivalent NumPy baselines.

``numpy_ref`` is an independent NumPy statement of the reference
algorithm's exact semantics (quirks included). It serves three roles:
the golden model for parity tests, the CPU fallback path, and the
baseline the benchmark harness measures speedups against.
"""
