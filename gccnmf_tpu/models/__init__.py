"""Workload pipelines: offline separation/enhancement, online, low-latency,
streaming RT-GCC-NMF."""
