"""Sequence-parallel separation of long recordings.

Shards the STFT time axis across every device of the mesh
(`gccnmf_tpu.parallel.long_audio`): per-shard STFT/GCC/mask/ISTFT,
psum-synchronized KL-NMF, and a ppermute halo exchange that stitches the
overlap-add seams on device. On a CPU host, set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
to emulate an 8-chip mesh.

No reference analogue: the reference holds the whole utterance in one
NumPy array (gccNMF/runGCCNMF.py:30-54); this is the scale-out path for
recordings that exceed one chip's HBM.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from gccnmf_tpu import defs
from gccnmf_tpu.models.offline import OfflineConfig
from gccnmf_tpu.parallel import mesh as mesh_lib
from gccnmf_tpu.parallel.long_audio import LongAudioSeparator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mixture", nargs="?", default=defs.DEFAULT_SEPARATION_FILE)
    ap.add_argument("--num-sources", type=int, default=3)
    ap.add_argument("--shards", type=int, default=None,
                    help="time shards (default: all devices)")
    ap.add_argument("--num-iterations", type=int, default=100)
    ap.add_argument("--dictionary-size", type=int, default=128)
    ap.add_argument("-o", "--output-prefix", default=None)
    ap.add_argument("--streamed", action="store_true",
                    help="disk-streamed I/O: mmap the input per shard and "
                         "write outputs incrementally — O(chunk) host RAM "
                         "for hour-scale files")
    args = ap.parse_args()

    import jax

    shards = args.shards or jax.device_count()
    mesh = mesh_lib.make_mesh(data=shards, model=1,
                              devices=jax.devices()[:shards])
    cfg = OfflineConfig(
        num_sources=args.num_sources,
        num_iterations=args.num_iterations,
        dictionary_size=args.dictionary_size,
    )
    sep = LongAudioSeparator(cfg, mesh)
    if args.streamed:
        result = sep.separate_streamed(args.mixture, args.output_prefix)
    else:
        result = sep.separate_file(args.mixture, args.output_prefix)
    print(f"{shards} time shards, {result['frames_processed']} frames")
    print("localized target TDOA indexes:", result["target_tdoa_indexes"])
    for path in result["paths"]:
        print("wrote", path)


if __name__ == "__main__":
    main()
