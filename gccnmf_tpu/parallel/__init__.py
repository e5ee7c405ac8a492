"""Multi-chip scaling: device meshes, sharded KL-NMF, data-parallel pipelines."""
